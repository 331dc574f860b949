"""On-policy corrective demo generation (DAgger): the policy drives, the
scripted expert takes over and finishes the stack.

The trained-policy version of this chain runs in
scripts/task_success_experiment.py (dagger stage); these tests exercise the
machinery with synthetic policies so they stay fast and deterministic:
- a DRIFTING policy that picks correctly but transports to a biased place
  (the diagnosed closed-loop failure mode) and tries to release there — the
  release must be intercepted and the expert must finish the transport;
- a WANDERING policy that never picks — the goal budget must trigger and the
  expert must replan the full stack from observed poses.
"""
import json
import os

import numpy as np
import pytest

from nvblox_mindmap_tpu.closed_loop.policies import GoalPolicy
from nvblox_mindmap_tpu.closed_loop.scripted import (
    generate_cube_stacking_dagger_demos,
    make_cube_stacking_env,
    scripted_completion_goals,
)
from nvblox_mindmap_tpu.data.dataset import DemoDataset
from nvblox_mindmap_tpu.data.keyposes import KeyposeDetectionMode
from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment

SEED = 311
CUBE_HALF = 0.04


def _goal(pos, closed):
    return np.concatenate(
        [np.asarray(pos, np.float32), [0, 1, 0, 0], [np.float32(closed)]]
    )


def _scene_layout(seed):
    env = make_cube_stacking_env(seed, num_cubes=2, cube_half=CUBE_HALF)
    pick = env.initial_objects["cube_2"][:3]
    place = env.initial_objects["cube_1"][:3] + [0, 0, 2 * CUBE_HALF]
    return np.asarray(pick), np.asarray(place)


def _drifting_policy(seed, drift=(0.15, 0.08)):
    """Picks cube_2 correctly, then transports to a place offset by
    ``drift`` and tries to release there — the measured failure mode."""
    pick, place = _scene_layout(seed)
    bad = place + np.asarray([drift[0], drift[1], 0.0])
    goals = [
        _goal([pick[0], pick[1], 0.22], 0.0),   # approach
        _goal(pick, 0.0),                       # descend
        _goal(pick, 1.0),                       # grasp
        _goal([pick[0], pick[1], 0.22], 1.0),   # lift
        _goal([bad[0], bad[1], 0.22], 1.0),     # drifted transport
        _goal(bad, 1.0),                        # drifted place
        _goal(bad, 0.0),                        # drifted release -> intercept
    ]
    return GoalPolicy(goals, repeat=False)


def _wandering_policy():
    """Open-gripper wandering: never grasps, never finishes."""
    goals = [
        _goal([0.5, 0.15, 0.25], 0.0),
        _goal([0.45, -0.15, 0.2], 0.0),
        _goal([0.55, 0.0, 0.3], 0.0),
    ]
    return GoalPolicy(goals, repeat=True)


def _keyposes(demo_dir):
    states = DemoDataset.load_robot_states(demo_dir)
    idx = ArmEmbodiment().extract_keypose_indices(
        states, extra_keyposes_around_grasp_events=[],
        keypose_detection_mode=KeyposeDetectionMode.HIGHEST_Z_BETWEEN_GRASP,
    )
    return states, idx


def test_dagger_intercepts_drifted_release_and_expert_places(tmp_path):
    demos, stats = generate_cube_stacking_dagger_demos(
        str(tmp_path), 1, lambda: _drifting_policy(SEED), seed=SEED,
        cube_half=CUBE_HALF,
        # Budget above the drifting policy's goal count: the stop must come
        # from the release interception, not the budget.
        policy_goal_budget_range=(20, 21),
    )
    (stat,) = stats
    assert stat["stop_reason"] == "release_intercepted"
    assert stat["held_at_takeover"] == ["cube_2"]
    assert 0 < stat["policy_frames"] < stat["total_frames"]
    # Success was asserted by the generator; the recording must carry exactly
    # one grasp cycle: the POLICY's pick close and the EXPERT's place open —
    # no policy release ever executed.
    states, keyposes = _keyposes(demos[0])
    jaw = states[:, 7]
    closed = (jaw < 0.5 * (jaw.min() + jaw.max())).astype(int)
    assert (np.diff(closed) == 1).sum() == 1
    assert (np.diff(closed) == -1).sum() == 1
    # A keypose lands on the CORRECT place (the expert's), and no keypose
    # sits at the drifted release site.
    pick, place = _scene_layout(SEED)
    bad = place + [0.15, 0.08, 0.0]
    kp = states[keyposes][:, :3]
    assert np.min(np.linalg.norm(kp - place, axis=1)) < 0.05
    assert np.min(np.linalg.norm(kp - pick, axis=1)) < 0.05
    low_kp = kp[kp[:, 2] < place[2] + CUBE_HALF]
    assert np.all(np.linalg.norm(low_kp[:, :2] - bad[:2], axis=1) > 0.05)
    assert os.path.exists(os.path.join(demos[0], "scene.json"))
    assert int(np.load(os.path.join(demos[0], "demo_successful.npy"))) == 1


def test_dagger_goal_budget_then_full_expert_replan(tmp_path):
    demos, stats = generate_cube_stacking_dagger_demos(
        str(tmp_path), 1, _wandering_policy, seed=SEED,
        cube_half=CUBE_HALF, policy_goal_budget_range=(2, 3),
    )
    (stat,) = stats
    assert stat["stop_reason"] == "goal_budget"
    assert stat["held_at_takeover"] == []
    states, keyposes = _keyposes(demos[0])
    pick, place = _scene_layout(SEED)
    kp = states[keyposes][:, :3]
    assert np.min(np.linalg.norm(kp - pick, axis=1)) < 0.05
    assert np.min(np.linalg.norm(kp - place, axis=1)) < 0.05


def test_completion_goals_put_down_held_base_cube_then_restack():
    """If the policy grabbed the BASE cube, the expert sets it down and
    replans the whole stack around its new position."""
    env = make_cube_stacking_env(SEED, num_cubes=2, cube_half=CUBE_HALF)
    env.reset()
    base0 = env.initial_objects["cube_1"][:3].copy()
    # Drive the env to grasp cube_1 and carry it somewhere off-nominal.
    for g in [
        _goal(base0, 0.0), _goal(base0, 1.0), _goal([0.6, 0.18, 0.2], 1.0)
    ]:
        for _ in range(40):
            env.step(g)
            if np.linalg.norm(env.get_policy_state()[:3] - g[:3]) < 0.01:
                break
    assert env.held_object_names() == ["cube_1"]
    goals = scripted_completion_goals(env, CUBE_HALF)
    for g in goals:
        for _ in range(40):
            env.step(g)
            if np.linalg.norm(env.get_policy_state()[:3] - g[:3]) < 0.01:
                break
    poses = env.get_object_poses()
    new_base = poses["cube_1"][:3]
    # Base was set down where it was carried (not back at its origin) and
    # cube_2 is stacked on it.
    assert np.linalg.norm(new_base[:2] - base0[:2]) > 0.05
    assert np.linalg.norm(
        poses["cube_2"][:3] - (new_base + [0, 0, 2 * CUBE_HALF])
    ) < 0.02


def test_experiment_seed_range_guard():
    from nvblox_mindmap_tpu.scripts.task_success_experiment import (
        _assert_disjoint_seed_ranges,
    )

    _assert_disjoint_seed_ranges((21, 8), (1234, 8), (5021, 16))
    with pytest.raises(AssertionError):
        _assert_disjoint_seed_ranges((1230, 8), (1234, 8))


def test_recovery_seed_range_guarded_before_generation(tmp_path):
    """gen_and_fuse must reject a --seed whose recovery range (seed+1000)
    collides with the held-out eval scenes — BEFORE generating anything."""
    from nvblox_mindmap_tpu.scripts.task_success_experiment import gen_and_fuse

    with pytest.raises(AssertionError, match="overlap"):
        gen_and_fuse(str(tmp_path), num_demos=8, seed=234,
                     task="cube_stacking", recovery_demos=8)
    assert not (tmp_path / "ds").exists()  # failed fast, no work done


def test_experiment_train_stage_flag_plumbing(monkeypatch, tmp_path):
    """The experiment train stage must forward every data-augmentation flag
    to the training app TOGETHER: the geometry-noise branch used to
    OVERWRITE noise_args, silently dropping --apply_random_transforms /
    --balance_demo_groups when combined (latent bug, round 4)."""
    from nvblox_mindmap_tpu.scripts import task_success_experiment as exp

    captured = {}

    def fake_train_main(argv):
        captured["argv"] = argv

    monkeypatch.setattr(
        "nvblox_mindmap_tpu.apps.run_training.main", fake_train_main
    )
    monkeypatch.setattr(exp, "latest_checkpoint", lambda out: "dummy.ckpt")
    exp.train(
        str(tmp_path), num_demos=8, iters=100,
        apply_geometry_noise=True, pos_noise_stddev_m=0.02,
        extra_demos=16, balance_sources=True,
        apply_random_transforms=True,
    )
    argv = captured["argv"]

    def flag_value(name):
        return argv[argv.index(name) + 1]

    assert flag_value("--apply_random_transforms") == "1"
    assert flag_value("--apply_geometry_noise") == "1"
    assert flag_value("--pos_noise_stddev_m") == "0.02"
    assert flag_value("--balance_demo_groups") == "0-7,8-23"
    # extra (dagger/recovery) demos widen the training range
    assert flag_value("--demos_train") == "0-23"
