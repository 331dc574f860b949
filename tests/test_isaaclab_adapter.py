"""Isaac Lab adapter protocol: mocked sim env drives the full surface.

The adapter itself has no Isaac Lab dependency (dependency-injected); only
make_isaaclab_environment needs the sim. These tests mock the gym-env surface
the adapter consumes and verify the step/reset/camera/object/success protocol
matches the reference episode semantics (closed_loop_policy.py:79-241).
"""
import numpy as np
import pytest

from nvblox_mindmap_tpu.closed_loop.isaaclab_adapter import (
    IsaacLabEnvironment,
    arm_action_from_policy_state,
    humanoid_action_from_policy_state,
)
from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment


class MockTerm:
    def __init__(self):
        self.value = np.asarray([False])

    def get_term(self, name):
        assert name == "success"
        return self.value


class MockScene:
    def __init__(self):
        self.objects = {
            "cube_1": np.asarray([0.4, 0.0, 0.02, 1, 0, 0, 0], np.float32),
            "cube_2": np.asarray([0.5, 0.1, 0.02, 1, 0, 0, 0], np.float32),
        }

    def get_state(self, is_relative=True):
        return {
            "rigid_object": {
                name: {"root_pose": pose[None]}
                for name, pose in self.objects.items()
            }
        }


class MockUnwrapped:
    def __init__(self):
        self.scene = MockScene()
        self.termination_manager = MockTerm()
        self.reset_to_calls = []

    def reset_to(self, state, arg, is_relative):
        self.reset_to_calls.append((state, is_relative))


class MockGymEnv:
    def __init__(self):
        self.unwrapped = MockUnwrapped()
        self.actions = []
        # Robot: eef pose + jaws, moves a bit toward the commanded pose.
        self.eef = np.asarray([0.3, 0.0, 0.3, 1, 0, 0, 0], np.float32)
        self.jaws = np.asarray([0.04, 0.04], np.float32)

    def step(self, action):
        action = np.asarray(action).reshape(-1)
        self.actions.append(action.copy())
        self.eef = action[:7].astype(np.float32)
        # gripper command: -1 close, +1 open (reference arm action).
        self.jaws = (np.full(2, 0.0, np.float32) if action[7] < 0
                     else np.full(2, 0.04, np.float32))

    def reset(self):
        pass


class MockCamera:
    def get_rgb(self):
        return np.full((8, 8, 3), 128, np.uint8)

    def get_depth(self):
        return np.full((8, 8), 1.0, np.float32)

    def get_intrinsics(self):
        return np.eye(3, dtype=np.float32) * 8

    def get_pose(self):
        return np.zeros(3, np.float32), np.asarray([1, 0, 0, 0], np.float32)

    def get_semantic_segmentation(self):
        seg = np.zeros((8, 8, 4), np.uint8)
        seg[2:5, 2:5] = [10, 20, 30, 255]
        return seg, {"(10, 20, 30, 255)": {"class": "robot_arm"},
                     "(0, 0, 0, 0)": {"class": "BACKGROUND"}}


def robot_state_fn(env):
    return np.concatenate([env.eef, env.jaws])


def make_adapter():
    env = MockGymEnv()
    adapter = IsaacLabEnvironment(
        env,
        ArmEmbodiment(),
        camera_handlers={"wrist": MockCamera()},
        robot_state_fn=robot_state_fn,
        initial_state={"seed": 0},
    )
    return env, adapter


def test_arm_action_conversion():
    state = np.asarray([0.4, 0.1, 0.3, 1, 0, 0, 0, 0.9], np.float32)
    action = arm_action_from_policy_state(state)
    np.testing.assert_array_equal(action[:7], state[:7])
    assert action[7] == -1.0  # closed
    open_action = arm_action_from_policy_state(
        np.asarray([0.4, 0.1, 0.3, 1, 0, 0, 0, 0.1], np.float32)
    )
    assert open_action[7] == 1.0


def test_humanoid_action_conversion():
    state = np.zeros(17, np.float32)
    state[3] = 1.0
    state[11] = 1.0
    state[7] = 1.0  # left closed
    action = humanoid_action_from_policy_state(state)
    assert action.shape == (37,)


def test_reset_uses_recorded_initial_state():
    env, adapter = make_adapter()
    adapter.reset()
    assert env.unwrapped.reset_to_calls == [({"seed": 0}, True)]


def test_step_none_holds_current_pose():
    """Warmup steps command the current pose (reference :123-134)."""
    env, adapter = make_adapter()
    adapter.step(None)
    assert len(env.actions) == 1
    np.testing.assert_allclose(env.actions[0][:7], env.eef)
    assert env.actions[0][7] == 1.0  # jaws open -> open command


def test_step_goal_moves_and_grips():
    env, adapter = make_adapter()
    goal = np.asarray([0.5, 0.0, 0.2, 1, 0, 0, 0, 1.0], np.float32)
    adapter.step(goal)
    np.testing.assert_allclose(env.eef, goal[:7])
    assert env.jaws[0] == 0.0  # closed
    state = adapter.get_policy_state()
    assert state.shape == (8,)
    assert state[7] == 1.0  # closedness observed


def test_cameras_carry_segmentation_with_label_map():
    env, adapter = make_adapter()
    frames = adapter.get_cameras()
    frame = frames["wrist"]
    assert frame.rgb.dtype == np.float32 and frame.rgb.max() <= 1.0
    assert frame.segmentation is not None
    labels = adapter.semantic_id_to_class
    robot_ids = [i for i, c in labels.items() if c == "robot_arm"]
    assert len(robot_ids) == 1
    assert (frame.segmentation == robot_ids[0]).sum() == 9

    # The TPU-side dynamic mask builds from this exact pair.
    from nvblox_mindmap_tpu.closed_loop.environment import (
        dynamic_mask_from_segmentation,
    )

    mask = dynamic_mask_from_segmentation(
        frame.segmentation, labels, ("robot_arm",)
    )
    assert mask.sum() == 9


def test_object_poses_and_success():
    env, adapter = make_adapter()
    poses = adapter.get_object_poses()
    assert set(poses) == {"cube_1", "cube_2"}
    assert poses["cube_1"].shape == (7,)
    assert adapter.is_success() is False
    env.unwrapped.termination_manager.value = np.asarray([True])
    assert adapter.is_success() is True


def test_success_fn_takes_priority_and_missing_term_warns(caplog):
    """success_fn (the task mdp predicate path, reference
    task_success.py:18-29) wins over the termination manager; a surgered env
    with neither warns loudly instead of silently reporting False forever."""
    import logging

    env, adapter = make_adapter()
    adapter.success_fn = lambda e: True
    assert adapter.is_success() is True

    env2, adapter2 = make_adapter()
    del adapter2.env.unwrapped.termination_manager  # surgered: no terms
    with caplog.at_level(logging.WARNING):
        assert adapter2.is_success() is False
    assert any("success_fn" in r.message for r in caplog.records)
    # Warned once, not per step.
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        assert adapter2.is_success() is False
    assert not caplog.records


def test_task_outcome_fn_raises_contract_error_off_sim_host():
    """Off the sim host the task mdp modules are absent: task_outcome_fn
    must raise the sim-host-contract ImportError, not return a broken fn."""
    from nvblox_mindmap_tpu.closed_loop.isaaclab_adapter import (
        task_outcome_fn,
    )

    for task in ("cube_stacking", "mug_in_drawer", "drill_in_box",
                 "stick_in_bin"):
        with pytest.raises(ImportError, match="sim-host"):
            task_outcome_fn(task)


def test_served_adapter_over_the_bridge():
    """The adapter works end-to-end through the remote protocol."""
    from nvblox_mindmap_tpu.closed_loop.remote_env import (
        EnvironmentServer,
        RemoteEnvironment,
    )

    env, adapter = make_adapter()
    server = EnvironmentServer(adapter, port=0).start()
    try:
        remote = RemoteEnvironment("127.0.0.1", server.port)
        remote.reset()
        remote.step(np.asarray([0.5, 0.0, 0.2, 1, 0, 0, 0, 1.0], np.float32))
        state = remote.get_policy_state()
        np.testing.assert_allclose(state[:3], [0.5, 0.0, 0.2], atol=1e-6)
        frames = remote.get_cameras()
        assert frames["wrist"].segmentation is not None
        labels = remote.semantic_id_to_class
        assert "robot_arm" in labels.values()
        poses = remote.get_object_poses()
        assert set(poses) == {"cube_1", "cube_2"}
        remote.close()
    finally:
        server.stop()


def test_factory_is_import_guarded():
    from nvblox_mindmap_tpu.closed_loop.isaaclab_adapter import (
        make_isaaclab_environment,
    )

    with pytest.raises(ImportError, match="Isaac Lab"):
        make_isaaclab_environment("cube_stacking", "x.hdf5", "demo_0")


class _Ns:
    """Attribute bag for duck-typed env-cfg mocks."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _mock_arm_env_cfg(eef_offset=(0.0, 0.0, 0.1034)):
    return _Ns(
        recorders={"r": 1},
        terminations={"t": 1},
        actions=_Ns(arm_action=_Ns(
            controller=_Ns(use_relative_mode=True),
            scale=0.5,
            body_offset=_Ns(pos=[0.0, 0.0, 0.0]),
        )),
        scene=_Ns(
            ee_frame=_Ns(target_frames=[_Ns(offset=_Ns(pos=list(eef_offset)))]),
            robot=_Ns(actuators={
                "panda_shoulder": _Ns(stiffness=400.0, damping=80.0),
                "panda_forearm": _Ns(stiffness=400.0, damping=80.0),
            }),
        ),
        viewer=_Ns(eye=(0, 0, 0)),
        sim=_Ns(render=_Ns(antialiasing_mode="On", carb_settings=None)),
    )


def test_perceptive_il_cfg_surgery_arm_absolute():
    """update_env_cfg_for_perceptive_il mirrors reference
    environments.py:109-195: recorders/terminations cleared, absolute-mode
    IK + control-frame z-offset correction, stiffness 400->2000 / damping
    80->240, viewer eye, deterministic render settings."""
    from nvblox_mindmap_tpu.closed_loop.isaaclab_adapter import (
        update_env_cfg_for_perceptive_il,
    )
    from nvblox_mindmap_tpu.embodiments.base import EmbodimentType

    cfg = update_env_cfg_for_perceptive_il(
        _mock_arm_env_cfg(), EmbodimentType.ARM,
        absolute_mode=True, render_settings="deterministic",
    )
    assert cfg.recorders == {} and cfg.terminations == {}
    arm = cfg.actions.arm_action
    assert arm.controller.use_relative_mode is False
    assert arm.scale == 1.0
    assert arm.body_offset.pos == [0.0, 0.0, 0.1034]
    for group in ("panda_shoulder", "panda_forearm"):
        assert cfg.scene.robot.actuators[group].stiffness == 2000.0
        assert cfg.scene.robot.actuators[group].damping == 240.0
    assert cfg.viewer.eye == (1.5, 1.5, 1.5)
    assert cfg.sim.render.antialiasing_mode == "Off"

    # Mismatched measurement-frame offset must trip the reference's assert.
    with pytest.raises(AssertionError, match="same offset"):
        update_env_cfg_for_perceptive_il(
            _mock_arm_env_cfg(eef_offset=(0.0, 0.0, 0.0)),
            EmbodimentType.ARM, absolute_mode=True,
        )


def test_perceptive_il_cfg_surgery_modes():
    """Relative arm mode and humanoid leave actions untouched; high_quality
    sets PathTracing; bad render settings raise."""
    from nvblox_mindmap_tpu.closed_loop.isaaclab_adapter import (
        update_env_cfg_for_perceptive_il,
    )
    from nvblox_mindmap_tpu.embodiments.base import EmbodimentType

    cfg = update_env_cfg_for_perceptive_il(
        _mock_arm_env_cfg(), EmbodimentType.ARM,
        absolute_mode=False, render_settings="high_quality",
    )
    assert cfg.actions.arm_action.controller.use_relative_mode is True
    assert cfg.sim.render.carb_settings == {"rtx.rendermode": "PathTracing"}

    cfg = update_env_cfg_for_perceptive_il(
        _mock_arm_env_cfg(), EmbodimentType.HUMANOID,
    )
    assert cfg.recorders == {} and cfg.viewer.eye == (1.5, 1.5, 1.5)

    with pytest.raises(ValueError, match="render settings"):
        update_env_cfg_for_perceptive_il(
            _mock_arm_env_cfg(), EmbodimentType.HUMANOID,
            render_settings="fancy",
        )


def test_compare_states_matches_and_diverges():
    """Replay-divergence semantics of the reference's compare_states
    (isaaclab_datagen_utils.py:40-72): nested asset/state layout, per-element
    0.1 tolerance, dataset indexed by action."""
    from nvblox_mindmap_tpu.closed_loop.isaaclab_adapter import compare_states

    dataset = {
        "articulation": {
            "robot": {"joint_position": np.stack([np.zeros(3), np.ones(3)])}
        },
        "rigid_object": {
            "cube": {"root_pose": np.stack([np.zeros(7), np.full(7, 0.5)])}
        },
    }
    runtime_ok = {
        "articulation": {"robot": {"joint_position": np.ones(3) + 0.05}},
        "rigid_object": {"cube": {"root_pose": np.full((1, 7), 0.45)}},
    }
    matched, log = compare_states(dataset, runtime_ok, action_index=1)
    assert matched and log == ""

    runtime_bad = {
        "articulation": {"robot": {"joint_position": np.ones(3)}},
        "rigid_object": {"cube": {"root_pose": np.full(7, 0.9)}},
    }
    matched, log = compare_states(dataset, runtime_bad, action_index=1)
    assert not matched
    assert '["rigid_object"]["cube"]["root_pose"]' in log
    assert "Dataset:" in log and "Runtime:" in log

    with pytest.raises(ValueError):
        compare_states(
            dataset,
            {"articulation": {"robot": {"joint_position": np.zeros(5)}},
             "rigid_object": {}},
            action_index=0,
        )


def test_compare_states_single_element_vectors():
    """1-element state vectors must not crash (squeeze would make them 0-d)."""
    from nvblox_mindmap_tpu.closed_loop.isaaclab_adapter import compare_states

    dataset = {
        "articulation": {"grip": {"width": np.asarray([[0.04], [0.02]])}},
        "rigid_object": {},
    }
    runtime = {
        "articulation": {"grip": {"width": np.asarray([[0.021]])}},
        "rigid_object": {},
    }
    matched, log = compare_states(dataset, runtime, action_index=1)
    assert matched and log == ""
