"""E2E smoke: training app on a synthetic dataset -> checkpoint -> open loop.

Mirrors the reference e2e chain (reference: tests/test_e2e.py) minus the
Isaac Lab sim stages: dataset -> 6-iter training -> checkpoint reload ->
open-loop inference with metrics.
"""
import glob
import os

import numpy as np
import pytest

from tests.test_data_pipeline import write_arm_demo


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_dataset")
    write_arm_demo(str(root / "demo_00000"), seed=0)
    write_arm_demo(str(root / "demo_00001"), seed=1)
    return str(root)


def small_train_argv(dataset_dir, log_dir):
    return [
        "--dataset", dataset_dir,
        "--task", "cube_stacking",
        "--data_type", "mesh",
        "--feature_type", "rgb",
        "--demos_train", "0-1",
        "--embedding_dim", "24",
        "--diffusion_timesteps", "5",
        "--fps_subsampling_factor", "4",
        "--num_vertices_to_sample", "64",
        "--batch_size", "4",
        "--batch_size_val", "4",
        "--train_iters", "6",
        "--val_freq", "3",
        "--num_batches_per_test_eval", "1",
        "--skip_train_val", "1",
        "--base_log_dir", log_dir,
        "--seed", "0",
    ]


@pytest.mark.slow
def test_training_app_e2e(dataset_dir, tmp_path):
    from nvblox_mindmap_tpu.apps.run_training import main as train_main

    log_dir = str(tmp_path / "logs")
    train_main(small_train_argv(dataset_dir, log_dir))

    # The stable 'latest' symlink plus the timestamped dir both match the
    # glob; dedupe by real path (exactly one actual checkpoint).
    ckpts = sorted(
        {os.path.realpath(p) for p in glob.glob(
            os.path.join(log_dir, "checkpoints", "*", "last.ckpt"))}
    )
    assert len(ckpts) == 1
    ckpt_dir = os.path.dirname(ckpts[0])
    assert os.path.isfile(os.path.join(ckpt_dir, "best.ckpt"))
    assert os.path.isfile(os.path.join(ckpt_dir, "training_args.json"))

    # Open loop with the produced checkpoint (model args come from the frozen
    # json, so CLI model params can be wrong/absent).
    from nvblox_mindmap_tpu.apps.run_open_loop_policy import main as open_loop_main

    means = open_loop_main(
        [
            "--dataset", dataset_dir,
            "--task", "cube_stacking",
            "--demos_open_loop", "0",
            "--checkpoint", ckpts[0],
            "--only_sample_keyposes", "1",
        ]
    )
    assert "distance_m" in means
    assert np.isfinite(means["distance_m"])


def test_open_loop_ply_export(dataset_dir, tmp_path):
    """Open loop writes feature/attention/prediction PLY clouds."""
    from nvblox_mindmap_tpu.apps.run_open_loop_policy import main as open_loop_main

    ply_dir = str(tmp_path / "ply")
    open_loop_main(
        [
            "--dataset", dataset_dir,
            "--task", "cube_stacking",
            "--data_type", "mesh",
            "--feature_type", "rgb",
            "--demos_open_loop", "0",
            "--only_sample_keyposes", "1",
            "--embedding_dim", "24",
            "--diffusion_timesteps", "4",
            "--fps_subsampling_factor", "4",
            "--num_vertices_to_sample", "64",
            "--ply_output_dir", ply_dir,
        ]
    )
    assert os.path.exists(os.path.join(ply_dir, "sample_0000_features.ply"))
    assert os.path.exists(os.path.join(ply_dir, "sample_0000_attention.ply"))
    assert os.path.exists(os.path.join(ply_dir, "sample_0000_prediction.ply"))


@pytest.mark.slow
def test_radio_backbone_datagen_training_open_loop(tmp_path):
    """Flagship configuration end-to-end with pretrained-shaped weights:
    converted radio_v25_b npz -> datagen fuses 768-d feature meshes ->
    training on them -> open-loop inference (VERDICT round-1 item #1)."""
    from tests.test_pretrained_wiring import write_radio_npz
    from nvblox_mindmap_tpu.apps.run_datagen import (
        make_mapping_feature_fn,
        process_demo,
    )
    from nvblox_mindmap_tpu.data.dataset import unpickle_zst
    from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment
    from nvblox_mindmap_tpu.mapping.constants import MappingConfig

    root = tmp_path / "raw"
    demo = root / "demo_00000"
    write_arm_demo(str(demo), seed=0)
    for p in glob.glob(str(demo / "*.nvblox_vertex_features.zst")):
        os.remove(p)

    weights = str(tmp_path / "radio.npz")
    write_radio_npz(weights, grid=4)

    # Small upscale resolution to keep the 768-d feature image CPU-friendly;
    # everything else is the real flagship path (real module sizes).
    cfg = MappingConfig.for_task(
        __import__("nvblox_mindmap_tpu.embodiments.registry",
                   fromlist=["Tasks"]).Tasks.CUBE_STACKING,
        feature_dim=768,
        voxel_size_m=0.04,
        max_feature_pages=256,
    )
    cfg = MappingConfig(**{**cfg.__dict__, "upscaled_feature_image_size": (64, 64)})
    feature_fn = make_mapping_feature_fn(
        "radio_v25_b", cfg.upscaled_feature_image_size,
        backbone_weights=weights, feature_image_size=(4, 4),
    )
    process_demo(str(demo), ArmEmbodiment(), cfg, feature_fn)

    meshes = sorted(glob.glob(str(demo / "*.nvblox_vertex_features.zst")))
    assert len(meshes) == 120
    mesh = unpickle_zst(meshes[-1])
    assert mesh["channel_length"] == 768
    # Zero-feature vertices were filtered at export.
    feats = np.asarray(mesh["features"], np.float32)
    if feats.shape[0]:
        assert not np.any(np.all(feats == 0, axis=1))

    # Train on the fused 768-d meshes, then run open loop.
    from nvblox_mindmap_tpu.apps.run_training import main as train_main

    log_dir = str(tmp_path / "logs")
    train_main(
        [
            "--dataset", str(root),
            "--task", "cube_stacking",
            "--data_type", "mesh",
            "--feature_type", "radio_v25_b",
            "--demos_train", "0",
            "--embedding_dim", "24",
            "--diffusion_timesteps", "4",
            "--fps_subsampling_factor", "4",
            "--num_vertices_to_sample", "64",
            "--batch_size", "2",
            "--batch_size_val", "2",
            "--train_iters", "2",
            "--val_freq", "2",
            "--num_batches_per_test_eval", "1",
            "--skip_train_val", "1",
            "--base_log_dir", log_dir,
        ]
    )
    # The stable 'latest' symlink plus the timestamped dir both match the
    # glob; dedupe by real path (exactly one actual checkpoint).
    ckpts = sorted(
        {os.path.realpath(p) for p in glob.glob(
            os.path.join(log_dir, "checkpoints", "*", "last.ckpt"))}
    )
    assert len(ckpts) == 1

    from nvblox_mindmap_tpu.apps.run_open_loop_policy import main as open_loop_main

    means = open_loop_main(
        [
            "--dataset", str(root),
            "--task", "cube_stacking",
            "--demos_open_loop", "0",
            "--checkpoint", ckpts[0],
            "--only_sample_keyposes", "1",
        ]
    )
    assert np.isfinite(means["distance_m"])

@pytest.mark.slow
def test_humanoid_training_app_e2e(tmp_path):
    """Full training app + open loop on a humanoid task (2 grippers,
    head yaw; drill_in_box -> GR1T2 embodiment + head-turn keyposes)."""
    from tests.test_humanoid import write_humanoid_demo

    dataset = tmp_path / "humanoid_ds"
    write_humanoid_demo(str(dataset / "demo_00000"), seed=0)
    write_humanoid_demo(str(dataset / "demo_00001"), seed=1)

    from nvblox_mindmap_tpu.apps.run_training import main as train_main

    log_dir = str(tmp_path / "logs")
    train_main(
        [
            "--dataset", str(dataset),
            "--task", "drill_in_box",
            "--data_type", "mesh",
            "--feature_type", "rgb",
            "--demos_train", "0-1",
            "--embedding_dim", "24",
            "--diffusion_timesteps", "5",
            "--fps_subsampling_factor", "4",
            "--num_vertices_to_sample", "64",
            "--batch_size", "4",
            "--batch_size_val", "4",
            "--train_iters", "4",
            "--val_freq", "2",
            "--num_batches_per_test_eval", "1",
            "--skip_train_val", "1",
            "--base_log_dir", log_dir,
            "--seed", "0",
        ]
    )
    # The stable 'latest' symlink plus the timestamped dir both match the
    # glob; dedupe by real path (exactly one actual checkpoint).
    ckpts = sorted(
        {os.path.realpath(p) for p in glob.glob(
            os.path.join(log_dir, "checkpoints", "*", "last.ckpt"))}
    )
    assert len(ckpts) == 1

    from nvblox_mindmap_tpu.apps.run_open_loop_policy import main as open_loop_main

    means = open_loop_main(
        [
            "--dataset", str(dataset),
            "--task", "drill_in_box",
            "--demos_open_loop", "0",
            "--checkpoint", ckpts[0],
            "--only_sample_keyposes", "1",
        ]
    )
    assert np.isfinite(means["distance_m"])
    # Head-yaw metric flows through the humanoid pipeline.
    assert any("yaw" in k for k in means), sorted(means)
