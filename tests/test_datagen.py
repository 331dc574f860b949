"""Datagen app: raw recorded frames -> fused per-frame feature meshes."""
import glob
import os

import numpy as np

from nvblox_mindmap_tpu.data.dataset import unpickle_zst
from tests.test_data_pipeline import write_arm_demo


def test_datagen_produces_feature_meshes(tmp_path):
    # Raw demo (with rgb/depth/pose/intrinsics/robot_state but we overwrite
    # the vertex features the fixture wrote, to prove datagen regenerates).
    root = tmp_path / "raw"
    demo = root / "demo_00000"
    write_arm_demo(str(demo), seed=0)
    for p in glob.glob(str(demo / "*.nvblox_vertex_features.zst")):
        os.remove(p)

    from nvblox_mindmap_tpu.apps.run_datagen import main as datagen_main

    datagen_main(
        [
            "--task", "cube_stacking",
            "--output_dir", str(root),
            "--demos_datagen", "0",
            "--feature_type", "rgb",
            "--voxel_size_m", "0.04",
            "--max_num_steps", "6",
        ]
    )
    meshes = sorted(glob.glob(str(demo / "*.nvblox_vertex_features.zst")))
    assert len(meshes) == 6
    mesh = unpickle_zst(meshes[-1])
    assert mesh["channel_length"] == 3  # RGB features
    assert mesh["vertices"].dtype == np.float16
    assert mesh["features"].shape[1] == 3


def test_datagen_deterministic_regression(tmp_path):
    """Two datagen runs over the same raw frames produce matching datasets."""
    from nvblox_mindmap_tpu.apps.run_datagen import main as datagen_main
    from nvblox_mindmap_tpu.data.comparisons import datasets_are_close

    dirs = []
    for name in ("a", "b"):
        root = tmp_path / name
        demo = root / "demo_00000"
        write_arm_demo(str(demo), seed=0)
        for p in glob.glob(str(demo / "*.nvblox_vertex_features.zst")):
            os.remove(p)
        datagen_main(
            [
                "--task", "cube_stacking",
                "--output_dir", str(root),
                "--demos_datagen", "0",
                "--feature_type", "rgb",
                "--voxel_size_m", "0.04",
                "--max_num_steps", "3",
            ]
        )
        dirs.append(str(demo))
    close, mismatches = datasets_are_close(dirs[0], dirs[1])
    assert close, mismatches


def test_datasets_are_close_detects_drift(tmp_path):
    from nvblox_mindmap_tpu.data.comparisons import datasets_are_close

    a = tmp_path / "a" / "demo_00000"
    b = tmp_path / "b" / "demo_00000"
    write_arm_demo(str(a), n_frames=120, seed=0)
    write_arm_demo(str(b), n_frames=120, seed=0)
    close, _ = datasets_are_close(str(a), str(b))
    assert close
    # Perturb one robot state.
    path = str(b / "5.robot_state.npy")
    state = np.load(path)
    state[0] += 0.5
    np.save(path, state)
    close, mismatches = datasets_are_close(str(a), str(b))
    assert not close and "5.robot_state.npy" in mismatches


def test_datagen_include_dynamic_end_to_end(tmp_path):
    """Datagen with a recorded segmentation channel: the replay boundary
    surfaces CameraFrame.segmentation, the dynamic mask routes robot pixels
    to the DYNAMIC mapper, and the combined export succeeds."""
    root = tmp_path / "raw"
    demo = root / "demo_00000"
    write_arm_demo(str(demo), seed=0, with_segmentation=True)
    for p in glob.glob(str(demo / "*.nvblox_vertex_features.zst")):
        os.remove(p)

    # The replay env exposes segmentation + the label map.
    from nvblox_mindmap_tpu.closed_loop.environment import ReplayEnvironment
    from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment

    env = ReplayEnvironment(str(demo), ArmEmbodiment(), ["wrist"])
    frame = env.get_cameras()["wrist"]
    assert frame.segmentation is not None and frame.segmentation.shape == (32, 32)
    assert env.semantic_id_to_class == {0: "background", 2: "robot_arm"}

    from nvblox_mindmap_tpu.apps.run_datagen import main as datagen_main

    datagen_main(
        [
            "--task", "cube_stacking",  # dynamic_class_labels=("robot_arm",)
            "--output_dir", str(root),
            "--demos_datagen", "0",
            "--feature_type", "rgb",
            "--voxel_size_m", "0.04",
            "--max_num_steps", "4",
            "--include_dynamic", "1",
        ]
    )
    meshes = sorted(glob.glob(str(demo / "*.nvblox_vertex_features.zst")))
    assert len(meshes) == 4


def test_datagen_serialized_map_feeds_usd_converter(tmp_path):
    """--save_serialized_nvblox_map_to_disk writes reference-named maps that
    scripts/convert_maps_usd.py picks up with its default pattern."""
    root = tmp_path / "raw"
    demo = root / "demo_00000"
    write_arm_demo(str(demo), seed=0)
    for p in glob.glob(str(demo / "*.nvblox_vertex_features.zst")):
        os.remove(p)

    from nvblox_mindmap_tpu.apps.run_datagen import main as datagen_main

    datagen_main(
        [
            "--task", "cube_stacking",
            "--output_dir", str(root),
            "--demos_datagen", "0",
            "--feature_type", "rgb",
            "--voxel_size_m", "0.04",
            "--max_num_steps", "4",
            "--save_serialized_nvblox_map_to_disk", "1",
        ]
    )
    map_path = demo / "nvblox_map_static.nvblx"
    assert map_path.exists()

    from nvblox_mindmap_tpu.scripts.convert_maps_usd import main as usd_main

    usd_main(["--input_dir", str(demo)])
    usda = demo / "nvblox_map_static.usda"
    assert usda.read_text().startswith("#usda 1.0")
