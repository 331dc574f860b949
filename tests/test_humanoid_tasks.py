"""Hermetic GR1 humanoid tasks: drill_in_box / stick_in_bin.

The reference runs these two tasks with the GR1T2 humanoid in Isaac Lab
(reference: mindmap/tasks/task_definitions/{drill_in_box,stick_in_bin},
gym ids Isaac-*-GR1T2-Right-v0). These tests exercise the framework-side
equivalents end-to-end in the scene world: scripted right-handed expert ->
recorded 37-dim GR1 robot states with head-turn keyposes -> datagen fusion
-> loader batches -> GT closed-loop replay judged by the object-state
evaluators (tasks/task_success.py geometry).
"""
import dataclasses
import glob
import os

import numpy as np
import pytest

from nvblox_mindmap_tpu.closed_loop.evaluators import (
    DrillInBoxEvaluator,
    StickInBinEvaluator,
    make_evaluator_for_task,
)
from nvblox_mindmap_tpu.closed_loop.policies import GroundTruthPolicy
from nvblox_mindmap_tpu.closed_loop.runner import (
    ClosedLoopConfig,
    run_closed_loop_policy,
)
from nvblox_mindmap_tpu.closed_loop.scripted import (
    env_from_scene_json,
    generate_drill_in_box_demos,
    generate_stick_in_bin_demos,
    make_drill_in_box_env,
)
from nvblox_mindmap_tpu.data.dataset import DemoDataset, SamplingWeightingType
from nvblox_mindmap_tpu.data.keyposes import KeyposeDetectionMode
from nvblox_mindmap_tpu.data.loader import get_data_loader_by_data_type
from nvblox_mindmap_tpu.data.vertex_sampling import VertexSamplingMethod
from nvblox_mindmap_tpu.embodiments.humanoid import HumanoidEmbodiment
from nvblox_mindmap_tpu.embodiments.registry import Tasks

DETECTION_MODE = KeyposeDetectionMode.HIGHEST_Z_OF_VERTICAL_MOTION_AND_HEAD_TURN
EXTRA_KEYPOSES = [5, 15]  # registry.py TASK_TO_EXTRA_KEYPOSES for GR1 tasks


def test_humanoid_env_right_hand_grasps():
    """The kinematic grasp handles the second gripper slot: closing the
    RIGHT hand near the drill attaches it (the GR1 tasks are right-handed)."""
    env = make_drill_in_box_env(seed=3, image_size=32)
    drill = env.initial_objects["power_drill"][:3].copy()
    goal = env.initial_state.copy()
    goal[8:11] = drill
    for _ in range(60):
        env.step(goal)
    goal[15] = 1.0  # close the right hand
    env.step(goal)
    goal[8:11] = drill + [0.0, 0.0, 0.2]
    for _ in range(10):
        env.step(goal)
    moved = env.get_object_poses()["power_drill"][:3]
    assert moved[2] > drill[2] + 0.1, "right hand failed to lift the drill"
    # The fixed container never moves.
    np.testing.assert_allclose(
        env.get_object_poses()["open_box"][:3],
        env.initial_objects["open_box"][:3],
    )


def test_pov_camera_follows_head_yaw():
    """The head camera's view direction rotates with policy-state yaw -
    what couples head-turn keyposes to the humanoid's observations."""
    env = make_drill_in_box_env(seed=0, image_size=32)
    env.reset()
    pose_before = env.get_cameras()["pov"].pose7.copy()
    goal = env.initial_state.copy()
    goal[16] = env.initial_state[16] + 0.8
    for _ in range(20):
        env.step(goal)
    pose_after = env.get_cameras()["pov"].pose7
    # Same eye, different orientation.
    np.testing.assert_allclose(pose_before[:3], pose_after[:3], atol=1e-6)
    assert np.linalg.norm(pose_before[3:] - pose_after[3:]) > 0.05
    assert "external" in env.get_cameras()


def test_custom_humanoid_camera_rig_refuses_serialization(tmp_path):
    """A factory-installed humanoid camera rig cannot be captured post-hoc
    (the pov pose is state-dependent); write_scene_json must refuse loudly
    instead of letting replay silently rebuild the default rig."""
    from nvblox_mindmap_tpu.closed_loop.scripted import write_scene_json

    env = make_drill_in_box_env(seed=0, image_size=32)
    # Simulate what every generate_* function does with a factory.
    env.camera_pose_fn = lambda step: {"pov": env._pov_pose_from_head_yaw()}
    env._custom_camera_fn = True
    with pytest.raises(ValueError, match="custom humanoid camera"):
        write_scene_json(str(tmp_path), env)


@pytest.fixture(scope="module")
def drill_demo(tmp_path_factory):
    out = tmp_path_factory.mktemp("drill_ds")
    demos = generate_drill_in_box_demos(str(out), 1, seed=0, image_size=48)
    return demos[0]


def test_drill_demo_has_head_turn_keyposes(drill_demo):
    """The recorded 37-dim states produce grasp intervals for the right hand
    only, plus >=1 head-turn keypose under the GR1 detection mode."""
    emb = HumanoidEmbodiment()
    states = DemoDataset.load_robot_states(drill_demo)
    assert states.shape[1] == 37
    (left_iv, _), (right_iv, _) = emb.get_grasp_events(states)
    assert left_iv == []  # the left hand never closes
    assert len(right_iv) == 2  # grasp + release
    base = emb.extract_keypose_indices(
        states, EXTRA_KEYPOSES, KeyposeDetectionMode.HIGHEST_Z_OF_VERTICAL_MOTION
    )
    with_turns = emb.extract_keypose_indices(
        states, EXTRA_KEYPOSES, DETECTION_MODE
    )
    assert len(with_turns) > len(base), "head-turn mode added no keyposes"


def test_drill_demo_semantics_label_robot(drill_demo):
    """GR1 scenes label the hand markers with the 'robot' class the
    drill_in_box mapping config masks out (mapping/constants.py
    dynamic_class_labels)."""
    import json

    with open(os.path.join(drill_demo, "semantic_labels.json")) as f:
        labels = json.load(f)
    assert "robot" in labels.values()
    assert "robot_arm" not in labels.values()


def test_drill_scene_json_roundtrip_renders_identically(drill_demo):
    """env_from_scene_json restores the humanoid env (embodiment, table,
    head rig) - the rebuilt env renders the same first pov frame."""
    env = env_from_scene_json(drill_demo)
    assert isinstance(env.embodiment, HumanoidEmbodiment)
    env.reset()
    import imageio.v2 as imageio

    recorded = (
        np.asarray(imageio.imread(os.path.join(drill_demo, "0.pov_rgb.png")))
        .astype(np.float32) / 255.0
    )
    rendered = env.get_cameras()["pov"].rgb
    assert np.abs(rendered - recorded).max() < 2.5 / 255.0


def test_drill_in_box_full_chain(drill_demo, tmp_path):
    """Fusion -> loader -> GT closed-loop success for drill_in_box."""
    from nvblox_mindmap_tpu.apps.run_datagen import (
        make_mapping_feature_fn,
        process_demo,
    )
    from nvblox_mindmap_tpu.mapping.constants import MappingConfig

    cfg = MappingConfig.for_task(
        Tasks.DRILL_IN_BOX, feature_dim=3, voxel_size_m=0.02,
        max_feature_pages=512,
    )
    cfg = dataclasses.replace(
        cfg,
        upscaled_feature_image_size=(48, 48),
        static_mask_erosion_iterations=2,
        valid_depth_mask_erosion_iterations=2,
    )
    feature_fn = make_mapping_feature_fn("rgb", cfg.upscaled_feature_image_size)
    process_demo(drill_demo, HumanoidEmbodiment(), cfg, feature_fn)
    states = DemoDataset.load_robot_states(drill_demo)
    meshes = glob.glob(os.path.join(drill_demo, "*.nvblox_vertex_features.zst"))
    assert len(meshes) == len(states)
    from nvblox_mindmap_tpu.data.dataset import unpickle_zst

    mesh = unpickle_zst(sorted(meshes)[-1])
    assert mesh["vertices"].shape[0] > 50, "fusion produced too few vertices"

    dataset_dir = os.path.dirname(drill_demo)
    loader, _ = get_data_loader_by_data_type(
        embodiment=HumanoidEmbodiment(),
        dataset_path=dataset_dir,
        demos="0",
        num_workers=0,
        batch_size=2,
        use_keyposes=True,
        data_type="mesh",
        only_sample_keyposes=True,
        extra_keyposes_around_grasp_events=EXTRA_KEYPOSES,
        keypose_detection_mode=DETECTION_MODE,
        include_failed_demos=False,
        sampling_weighting_type=SamplingWeightingType.NONE,
        num_history=3,
        prediction_horizon=1,
        num_vertices_to_sample=128,
        vertex_sampling_method=VertexSamplingMethod.RANDOM_WITHOUT_REPLACEMENT,
        seed=0,
    )
    batch = next(iter(loader))
    assert batch["gripper_history"].shape == (2, 3, 2, 8)
    assert batch["gt_head_yaw"].shape == (2, 1, 1)

    emb = HumanoidEmbodiment()
    evaluator = make_evaluator_for_task(Tasks.DRILL_IN_BOX)
    assert isinstance(evaluator, DrillInBoxEvaluator)
    summary = run_closed_loop_policy(
        make_env=lambda d: env_from_scene_json(drill_demo),
        make_policy=lambda d: GroundTruthPolicy.from_demo(
            drill_demo, emb, EXTRA_KEYPOSES, DETECTION_MODE
        ),
        embodiment=emb,
        evaluator=evaluator,
        demo_names=["demo_00000"],
        config=ClosedLoopConfig(max_num_steps=500),
    )
    assert summary["success_rate"] == 1.0, summary


def test_stick_in_bin_gt_closed_loop(tmp_path):
    """stick_in_bin: scripted demo in its own AABB region (x~[3.7, 5.5]),
    GT replay judged successful by the drum-cylinder evaluator."""
    demos = generate_stick_in_bin_demos(str(tmp_path), 1, seed=5, image_size=48)
    emb = HumanoidEmbodiment()
    evaluator = make_evaluator_for_task(Tasks.STICK_IN_BIN)
    assert isinstance(evaluator, StickInBinEvaluator)
    summary = run_closed_loop_policy(
        make_env=lambda d: env_from_scene_json(demos[0]),
        make_policy=lambda d: GroundTruthPolicy.from_demo(
            demos[0], emb, EXTRA_KEYPOSES, DETECTION_MODE
        ),
        embodiment=emb,
        evaluator=evaluator,
        demo_names=["demo_00000"],
        config=ClosedLoopConfig(max_num_steps=500),
    )
    assert summary["success_rate"] == 1.0, summary
    # Objects stayed inside the task AABB (mapping/constants.py) so fusion
    # would see the whole scene.
    from nvblox_mindmap_tpu.mapping.constants import get_workspace_bounds

    bounds = np.asarray(get_workspace_bounds("stick_in_bin"))
    env = env_from_scene_json(demos[0])
    for pose in env.initial_objects.values():
        assert np.all(pose[:3] >= bounds[0]) and np.all(pose[:3] <= bounds[1])
