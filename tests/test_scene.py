"""Scene renderer + scripted expert: the hermetic sim boundary.

Validates the analytic box renderer against the backprojection convention,
the settle-on-release kinematics, the scripted stacking expert (judged by the
real CubeStackingEvaluator), and that datagen fusion of a recorded scene demo
actually reconstructs the cubes (vertices + colors at the right places).
"""
import glob
import os

import numpy as np
import pytest

from nvblox_mindmap_tpu.closed_loop.scene import (
    Box,
    SceneKinematicEnvironment,
    look_at_pose7,
    render_boxes,
)
from nvblox_mindmap_tpu.closed_loop.scripted import (
    generate_cube_stacking_demos,
    make_cube_stacking_env,
    scripted_stack_goals,
    record_scripted_demo,
)
from nvblox_mindmap_tpu.geometry.np_rotations import matrix_to_quat, quat_to_matrix


def test_matrix_to_quat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        m = quat_to_matrix(q)
        q2 = matrix_to_quat(m)
        # Same rotation up to sign.
        assert min(np.linalg.norm(q - q2), np.linalg.norm(q + q2)) < 1e-6


def test_look_at_convention():
    pose = look_at_pose7(eye=(0.0, -1.0, 1.0), target=(0.0, 0.0, 0.0))
    rot = quat_to_matrix(pose[3:7])
    fwd = rot[:, 2]
    expected = np.asarray([0.0, 1.0, -1.0]) / np.sqrt(2)
    np.testing.assert_allclose(fwd, expected, atol=1e-6)
    # +y_cam points "down" in the world (negative z component).
    assert rot[2, 1] < 0
    # Right-handed orthonormal.
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.cross(rot[:, 0], rot[:, 1]), rot[:, 2],
                               atol=1e-6)


def test_render_depth_matches_analytic():
    """Camera straight down over a unit slab: center depth = height above top."""
    # Corner rays at f=40 reach +-0.41 m laterally at 1 m depth; a 0.3 m
    # half-extent slab is hit by the center ray but missed at the corners.
    box = Box("slab", center=(0.0, 0.0, -0.05), half_extents=(0.3, 0.3, 0.05),
              color=(1.0, 0.0, 0.0), semantic_id=3)
    # Straight-down look_at (degenerate up handled inside).
    pose = look_at_pose7(eye=(0.0, 0.0, 1.0), target=(0.0, 0.0, 0.0))
    H = W = 33
    f = 40.0
    K = np.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    rgb, depth, seg = render_boxes([box], pose, K, H, W)
    assert depth.shape == (H, W) and rgb.shape == (H, W, 3)
    # Center ray hits the slab top (z=0) 1 m below.
    assert abs(depth[H // 2, W // 2] - 1.0) < 1e-6
    assert seg[H // 2, W // 2] == 3
    assert rgb[H // 2, W // 2, 0] > 0.5 and rgb[H // 2, W // 2, 1] < 1e-6
    # Corner rays miss the 1x1 slab -> invalid depth 0, background seg.
    assert depth[0, 0] == 0.0 and seg[0, 0] == 0


def test_render_backprojection_roundtrip():
    """Rendered depth backprojects onto the box surfaces (convention lock)."""
    import jax.numpy as jnp

    from nvblox_mindmap_tpu.ops.backprojection import get_camera_pointcloud

    boxes = [
        Box("table", (0.5, 0.0, -0.025), (0.45, 0.5, 0.025), (0.5, 0.4, 0.3), 1),
        Box("cube", (0.45, 0.1, 0.04), (0.04, 0.04, 0.04), (1, 0, 0), 2),
    ]
    pose = look_at_pose7(eye=(0.5, -0.85, 0.55), target=(0.5, 0.0, 0.05))
    H = W = 48
    K = np.asarray([[48.0, 0, 24], [0, 48.0, 24], [0, 0, 1]], np.float32)
    _, depth, seg = render_boxes(boxes, pose, K, H, W)
    assert (depth > 0).sum() > 100  # scene actually visible

    pcd = np.asarray(
        get_camera_pointcloud(
            jnp.asarray(K), jnp.asarray(depth), jnp.asarray(pose[:3]),
            jnp.asarray(pose[3:7]),
        )
    )
    valid = depth > 0
    pts = pcd[valid]
    # Every valid point lies on the surface of some box (within epsilon).
    def dist_to_box_surface(p, box):
        d = np.abs(p - box.center) - box.half_extents
        return np.max(d, axis=-1)  # <= 0 inside; 0 on surface (outer faces)

    d_any = np.min(
        np.stack([np.abs(dist_to_box_surface(pts, b)) for b in boxes]), axis=0
    )
    assert np.quantile(d_any, 0.99) < 1e-3, d_any.max()
    # Cube-labelled pixels backproject inside the cube's AABB neighborhood.
    cube_pts = pcd[seg == 2]
    assert cube_pts.shape[0] > 3
    assert np.all(np.abs(cube_pts - boxes[1].center) < 0.05 + 1e-3)


def test_settle_on_release():
    env = make_cube_stacking_env(seed=1, num_cubes=2, randomize=False)
    c1 = env.initial_objects["cube_1"][:3].copy()
    c2 = env.initial_objects["cube_2"][:3].copy()
    # Drive: grasp cube_2, lift high, move over cube_1, release mid-air.
    def go(goal, n=40):
        for _ in range(n):
            env.step(goal)

    q = [0, 1, 0, 0]
    go(np.concatenate([c2, q, [0.0]]).astype(np.float32))
    go(np.concatenate([c2, q, [1.0]]).astype(np.float32), n=2)
    high = np.asarray([c1[0], c1[1], 0.4])
    go(np.concatenate([high, q, [1.0]]).astype(np.float32))
    assert np.allclose(env.objects["cube_2"][:3], env.state[:3], atol=1e-5)
    go(np.concatenate([high, q, [0.0]]).astype(np.float32), n=1)
    # Released above cube_1 -> falls onto its top, not floating at 0.4.
    z = env.objects["cube_2"][2]
    assert abs(z - (c1[2] + 2 * env.object_half)) < 1e-6, z


def test_settle_on_release_interpenetrating():
    """A release that interpenetrates the support (object center BELOW the
    support's top) settles ON the support, not through it to table level
    co-located with the support - a real engine resolves overlap upward."""
    env = make_cube_stacking_env(seed=1, num_cubes=2, randomize=False)
    c1 = env.initial_objects["cube_1"][:3].copy()
    c2 = env.initial_objects["cube_2"][:3].copy()

    def go(goal, n=40):
        for _ in range(n):
            env.step(goal)

    q = [0, 1, 0, 0]
    go(np.concatenate([c2, q, [0.0]]).astype(np.float32))
    go(np.concatenate([c2, q, [1.0]]).astype(np.float32), n=2)
    c1_top = c1[2] + env.object_half
    # Lower the held cube INTO cube_1: center 20% of a half-extent below
    # cube_1's top, i.e. the cubes overlap in z at release time.
    low = np.asarray([c1[0], c1[1], c1_top - 0.2 * env.object_half])
    go(np.concatenate([low, q, [1.0]]).astype(np.float32))
    go(np.concatenate([low, q, [0.0]]).astype(np.float32), n=1)
    z = env.objects["cube_2"][2]
    assert abs(z - (c1_top + env.object_half)) < 1e-6, z


def test_scripted_expert_stacks_and_records(tmp_path):
    """One scripted demo: evaluator-confirmed success + full demo layout +
    keypose extraction finds the grasp structure."""
    from nvblox_mindmap_tpu.closed_loop.evaluators import CubeStackingEvaluator
    from nvblox_mindmap_tpu.data.dataset import DemoDataset
    from nvblox_mindmap_tpu.data.keyposes import KeyposeDetectionMode
    from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment

    env = make_cube_stacking_env(seed=3, num_cubes=2)
    goals = scripted_stack_goals(env.initial_objects, env.object_half)
    demo_dir = str(tmp_path / "demo_00000")
    n = record_scripted_demo(demo_dir, env, goals)

    ev = CubeStackingEvaluator(num_cubes=2,
                               cube_side_length=2 * env.object_half)
    ev.start_demo("demo_00000", env)
    ev.evaluate_step(env)
    assert ev.current_success, env.get_object_poses()

    # Layout: frame files + semantics + labels map + outcome.
    for item in ("wrist_rgb.png", "wrist_depth.png", "wrist_pose.npy",
                 "wrist_intrinsics.npy", "wrist_semantic.png",
                 "robot_state.npy"):
        assert os.path.exists(os.path.join(demo_dir, f"0.{item}")), item
        assert os.path.exists(os.path.join(demo_dir, f"{n - 1}.{item}")), item
    assert os.path.exists(os.path.join(demo_dir, "semantic_labels.json"))
    assert int(np.load(os.path.join(demo_dir, "demo_successful.npy"))) == 1

    # Keyposes: grasp events + vertical-motion apexes are present.
    robot_states = DemoDataset.load_robot_states(demo_dir)
    assert robot_states.shape == (n, 9)
    keyposes = ArmEmbodiment().extract_keypose_indices(
        robot_states, extra_keyposes_around_grasp_events=[],
        keypose_detection_mode=KeyposeDetectionMode.HIGHEST_Z_OF_VERTICAL_MOTION,
    )
    assert len(keyposes) >= 4, keyposes
    # At least one keypose near the pick location and one near the place.
    kp_pos = robot_states[keyposes][:, :3]
    pick = env.initial_objects["cube_2"][:3]
    place = env.initial_objects["cube_1"][:3] + [0, 0, 2 * env.object_half]
    assert np.min(np.linalg.norm(kp_pos - pick, axis=1)) < 0.05
    assert np.min(np.linalg.norm(kp_pos - place, axis=1)) < 0.05


def test_recovery_demo_slips_and_recovers(tmp_path):
    """Recovery demonstration: a mid-transport grasp slip, then expert
    re-pick + successful stack (generator asserts evaluator success
    internally). The recording must show TWO grasp cycles with no jaw event
    at the slip itself, and keypose extraction must cover pick, recovery
    pick (a grasp away from both the original pick and the place), and
    place."""
    from nvblox_mindmap_tpu.closed_loop.scripted import (
        generate_cube_stacking_recovery_demos,
    )
    from nvblox_mindmap_tpu.data.dataset import DemoDataset
    from nvblox_mindmap_tpu.data.keyposes import KeyposeDetectionMode
    from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment

    (demo_dir,) = generate_cube_stacking_recovery_demos(
        str(tmp_path), 1, seed=500
    )
    assert os.path.exists(os.path.join(demo_dir, "scene.json"))
    assert int(np.load(os.path.join(demo_dir, "demo_successful.npy"))) == 1

    robot_states = DemoDataset.load_robot_states(demo_dir)
    jaw = robot_states[:, 7]
    closed = (jaw < 0.5 * (jaw.min() + jaw.max())).astype(int)
    assert (np.diff(closed) == 1).sum() == 2, "expected pick + recovery pick"
    assert (np.diff(closed) == -1).sum() == 2, (
        "expected replan-approach open + place release"
    )

    keyposes = ArmEmbodiment().extract_keypose_indices(
        robot_states, extra_keyposes_around_grasp_events=[],
        keypose_detection_mode=(
            KeyposeDetectionMode.HIGHEST_Z_OF_VERTICAL_MOTION
        ),
    )
    kp_pos = robot_states[keyposes][:, :3]
    import json

    with open(os.path.join(demo_dir, "scene.json")) as f:
        scene = json.load(f)
    pick = np.asarray(scene["objects"]["cube_2"])
    half = scene["object_half_extents"]["cube_2"][0]
    place = np.asarray(scene["objects"]["cube_1"]) + [0, 0, 2 * half]
    assert np.min(np.linalg.norm(kp_pos - pick, axis=1)) < 0.05
    assert np.min(np.linalg.norm(kp_pos - place, axis=1)) < 0.05
    # The recovery pick: a low grasp keypose away from both nominal sites.
    # Structurally guaranteed (not seed luck): _sample_slip_position keeps
    # the landing > 0.07 m from the original pick xy (avoid_xy) and
    # > 3*cube_half from every other cube incl. cube_1 (whose xy is the
    # place xy).
    low = kp_pos[kp_pos[:, 2] < 3 * half]
    away = (np.linalg.norm(low[:, :2] - pick[:2], axis=1) > 0.06) & (
        np.linalg.norm(low[:, :2] - place[:2], axis=1) > 0.06
    )
    assert away.any(), (kp_pos, pick, place)


@pytest.mark.slow
def test_datagen_fusion_reconstructs_cubes(tmp_path):
    """Fusing a recorded scene demo puts feature vertices on the cubes with
    approximately the cubes' colors (rgb feature passthrough)."""
    import dataclasses

    from nvblox_mindmap_tpu.apps.run_datagen import (
        make_mapping_feature_fn,
        process_demo,
    )
    from nvblox_mindmap_tpu.data.dataset import unpickle_zst
    from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment
    from nvblox_mindmap_tpu.embodiments.registry import Tasks
    from nvblox_mindmap_tpu.mapping.constants import MappingConfig

    demos = generate_cube_stacking_demos(str(tmp_path), num_demos=1, seed=5)
    cfg = MappingConfig.for_task(
        Tasks.CUBE_STACKING, feature_dim=3, voxel_size_m=0.02,
        max_feature_pages=512,
    )
    cfg = dataclasses.replace(
        cfg,
        upscaled_feature_image_size=(64, 64),
        static_mask_erosion_iterations=2,
        valid_depth_mask_erosion_iterations=2,
    )
    feature_fn = make_mapping_feature_fn("rgb", cfg.upscaled_feature_image_size)
    process_demo(demos[0], ArmEmbodiment(), cfg, feature_fn)

    meshes = sorted(glob.glob(os.path.join(demos[0], "*.nvblox_vertex_features.zst")),
                    key=lambda p: int(os.path.basename(p).split(".")[0]))
    assert len(meshes) > 10
    first = unpickle_zst(meshes[0])
    vertices = np.asarray(first["vertices"], np.float32)
    features = np.asarray(first["features"], np.float32)
    assert first["channel_length"] == 3 and vertices.shape[0] > 50

    # The INITIAL cube positions are reconstructed in the first frame's mesh.
    env = make_cube_stacking_env(seed=5, num_cubes=2)
    for name, pose in env.initial_objects.items():
        d = np.linalg.norm(vertices - pose[:3], axis=1)
        near = d < 3 * env.object_half
        assert near.sum() >= 3, f"no vertices near {name} at {pose[:3]}"
        # rgb-passthrough features near the red cube_1 / blue cube_2 colors:
        # red channel dominates for cube_1, blue for cube_2.
        f_near = features[near]
        if name == "cube_1":
            assert f_near[:, 0].mean() > f_near[:, 2].mean(), name
        else:
            assert f_near[:, 2].mean() > f_near[:, 0].mean(), name

    # The robot marker (dynamic class) is masked OUT of the static map:
    # no vertices hug the end-effector start position above the table.
    start_eef = np.asarray([0.4, 0.0, 0.3])
    d_eef = np.linalg.norm(vertices - start_eef, axis=1)
    assert (d_eef < 0.04).sum() == 0
