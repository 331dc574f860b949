"""DemoWriter roundtrip, checkpoint tools, mp4 script, converters, multihost."""
import os

import numpy as np

from nvblox_mindmap_tpu.data.writer import DemoWriter


def test_demo_writer_roundtrip(tmp_path):
    from nvblox_mindmap_tpu.runtime import decode_png

    demo = str(tmp_path / "demo_00000")
    writer = DemoWriter(demo)
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    depth = rng.uniform(0.2, 2.0, (16, 16)).astype(np.float32)
    pose = np.asarray([0, 0, 1, 1, 0, 0, 0], np.float32)
    K = np.eye(3, dtype=np.float32)
    state = rng.normal(size=9).astype(np.float32)

    writer.write_camera_frame(0, "wrist", rgb, depth, pose, K)
    writer.write_robot_state(0, state)
    writer.write_outcome(1)

    np.testing.assert_array_equal(decode_png(os.path.join(demo, "0.wrist_rgb.png")),
                                  rgb)
    d = decode_png(os.path.join(demo, "0.wrist_depth.png")).astype(np.float32) / 1000
    np.testing.assert_allclose(d, depth, atol=1e-3)
    np.testing.assert_array_equal(
        np.load(os.path.join(demo, "0.robot_state.npy")), state
    )
    assert int(np.load(os.path.join(demo, "demo_successful.npy"))) == 1


def test_checkpoint_tools(tmp_path):
    import pickle

    from flax import serialization

    from nvblox_mindmap_tpu.scripts.checkpoint_tools import (
        extract_subtree,
        load_subtree,
        print_checkpoint_info,
    )

    params = {"encoder": {"fpn": {"kernel": np.ones((2, 2))}},
              "head": {"bias": np.zeros(3)}}
    ckpt = str(tmp_path / "last.ckpt")
    with open(ckpt, "wb") as f:
        pickle.dump(
            {"params": serialization.msgpack_serialize(params),
             "opt_state": b"", "iter": 42, "best_loss": 0.1},
            f,
        )
    it, loss = print_checkpoint_info(ckpt)
    assert it == 42 and loss == 0.1

    out = str(tmp_path / "fpn.msgpack")
    extract_subtree(ckpt, "encoder/fpn", out)
    sub = load_subtree(out)
    np.testing.assert_array_equal(sub["kernel"], np.ones((2, 2)))


def test_mp4_script(tmp_path):
    from nvblox_mindmap_tpu.scripts.make_mp4_from_dataset import (
        depth_to_colormap,
        render_demo_video,
    )
    from tests.test_data_pipeline import write_arm_demo

    demo = str(tmp_path / "demo_00000")
    write_arm_demo(demo, seed=0)
    out = str(tmp_path / "out.mp4")
    n = render_demo_video(demo, "wrist", out, "rgb", fps=10)
    assert n == 120
    cm = depth_to_colormap(np.asarray([[0.0, 1.0, 3.0]]))
    assert cm.shape == (1, 3, 3)
    np.testing.assert_allclose(cm[0, 0], 0.0)  # invalid depth is black


def test_converters():
    from nvblox_mindmap_tpu.models.converter import (
        convert_diffusion_scheduler,
        convert_to_flash_attention,
    )

    ddim = convert_diffusion_scheduler(10)
    assert ddim["scheduler_kind"] == "ddim"
    assert ddim["num_inference_steps"] == 10
    assert not ddim["stochastic"]
    assert convert_to_flash_attention()["attention_impl"] == "flash"


def test_multihost_single_process():
    from nvblox_mindmap_tpu.parallel.multihost import (
        all_gather_metrics,
        barrier,
        get_rank,
        get_world_size,
        mean_metrics_across_processes,
    )

    assert get_world_size() == 1 and get_rank() == 0
    gathered = all_gather_metrics({"a": 1.0})
    assert gathered == [{"a": 1.0}]
    means = mean_metrics_across_processes({"a": 2.0})
    assert means["a"] == 2.0
    barrier()  # no-op single process
