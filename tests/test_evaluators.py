"""Task-semantics evaluators: cube stacking + mug in drawer.

Reproduces the reference's success logic (cube_stacking_evaluator.py:1-340,
mug_in_drawer_evaluator.py:1-285) against the kinematic environment's object
state: success is judged from object poses + gripper openness, not waypoint
proximity.
"""
import numpy as np

from nvblox_mindmap_tpu.closed_loop.environment import KinematicEnvironment
from nvblox_mindmap_tpu.closed_loop.evaluators import (
    BasicEvaluator,
    CubeStackingEvaluator,
    MugInDrawerEvaluator,
    make_evaluator_for_task,
)
from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment


def arm_state(pos, closed=0.0):
    return np.asarray([*pos, 1, 0, 0, 0, closed], dtype=np.float32)


def drive(env, evaluator, goal, max_steps=60):
    """Step toward a goal until the eef arrives, evaluating each step."""
    goal = np.asarray(goal, dtype=np.float32)
    for _ in range(max_steps):
        env.step(goal)
        evaluator.evaluate_step(env)
        if np.linalg.norm(env.state[:3] - goal[:3]) < 1e-3:
            break
    # One extra step so the commanded closedness is applied with the eef at
    # the goal (grasp/release happens at the object).
    env.step(goal)
    evaluator.evaluate_step(env)


CUBE = 0.045


def make_cube_env():
    emb = ArmEmbodiment()
    cubes = {
        "cube_1": np.asarray([0.40, 0.00, 0.02]),
        "cube_2": np.asarray([0.50, 0.15, 0.02]),
        "cube_3": np.asarray([0.60, -0.15, 0.02]),
    }
    return KinematicEnvironment(
        emb, arm_state([0.3, 0, 0.3]), waypoints=[], max_step_m=0.1,
        objects=cubes, grasp_radius_m=0.05,
    )


def stack_cube(env, ev, src_xyz, dst_xyz):
    """Pick the cube at src and place it at dst (open -> close -> carry ->
    open)."""
    drive(env, ev, arm_state(src_xyz, closed=0.0))
    drive(env, ev, arm_state(src_xyz, closed=1.0))  # grasp
    lift = np.asarray(src_xyz) + [0, 0, 0.15]
    drive(env, ev, arm_state(lift, closed=1.0))
    drive(env, ev, arm_state(dst_xyz, closed=1.0))
    drive(env, ev, arm_state(dst_xyz, closed=0.0))  # release


def test_cube_stacking_success_and_counts():
    env = make_cube_env()
    ev = CubeStackingEvaluator(num_cubes=3, cube_side_length=CUBE)
    ev.start_demo("demo_0", env)
    # Stack cube_2 onto cube_1, then cube_3 on top.
    stack_cube(env, ev, [0.50, 0.15, 0.02], [0.40, 0.00, 0.02 + CUBE])
    stack_cube(env, ev, [0.60, -0.15, 0.02], [0.40, 0.00, 0.02 + 2 * CUBE])
    assert ev.finalize_demo("demo_0", env) is True

    record = ev.eval_dict["demo_0_0"]
    assert record["success"] is True
    assert record["max_num_stacked_cubes"] == 3
    assert record["max_num_stacked_cubes_with_open_gripper"] == 3
    assert record["cubes_have_been_lifted"] == 2  # cube_1 never lifted
    assert record["cubes_have_been_moved"] == 2
    assert record["num_stacked_cubes"] == 3  # still stacked at demo end

    summary = ev.summarize_demos()
    assert summary["success_rate"] == 1.0
    assert summary["full_stack_at_demo_end_rate"] == 1.0
    assert summary["mean_num_stacked_cubes"] == 3.0


def test_cube_stacking_closed_gripper_is_not_success():
    """Holding the last cube on the stack (gripper closed) must not count -
    the reference requires an open gripper at max stack (:131-136)."""
    env = make_cube_env()
    ev = CubeStackingEvaluator(num_cubes=3, cube_side_length=CUBE)
    ev.start_demo("demo_0", env)
    stack_cube(env, ev, [0.50, 0.15, 0.02], [0.40, 0.00, 0.02 + CUBE])
    # Carry cube_3 over the stack but never release.
    drive(env, ev, arm_state([0.60, -0.15, 0.02], closed=0.0))
    drive(env, ev, arm_state([0.60, -0.15, 0.02], closed=1.0))
    drive(env, ev, arm_state([0.40, 0.00, 0.02 + 2 * CUBE], closed=1.0))
    assert ev.finalize_demo("demo_0", env) is False
    record = ev.eval_dict["demo_0_0"]
    assert record["max_num_stacked_cubes"] == 3
    assert record["max_num_stacked_cubes_with_open_gripper"] == 2


def test_cube_stacking_partial_stack_counts():
    env = make_cube_env()
    ev = CubeStackingEvaluator(num_cubes=3, cube_side_length=CUBE)
    ev.start_demo("demo_0", env)
    stack_cube(env, ev, [0.50, 0.15, 0.02], [0.40, 0.00, 0.02 + CUBE])
    assert ev.finalize_demo("demo_0", env) is False
    record = ev.eval_dict["demo_0_0"]
    assert record["max_num_stacked_cubes"] == 2
    assert record["cubes_have_been_moved"] == 1


DRAWER_POS = np.asarray([0.55, -0.6, 0.25])
WRONG_DRAWER_POS = np.asarray([0.55, 0.6, 0.25])


def make_mug_env():
    emb = ArmEmbodiment()
    objects = {
        "target_mug": np.asarray([0.45, 0.1, 0.05]),
        "bottom_of_drawer_with_mugs": DRAWER_POS,
        "bottom_of_drawer_with_boxes": WRONG_DRAWER_POS,
    }
    return KinematicEnvironment(
        emb, arm_state([0.3, 0, 0.3]), waypoints=[], max_step_m=0.1,
        objects=objects, grasp_radius_m=0.05,
    )


def test_mug_in_drawer_success():
    env = make_mug_env()
    ev = MugInDrawerEvaluator()
    ev.start_demo("demo_0", env)
    drive(env, ev, arm_state([0.45, 0.1, 0.05], closed=0.0))
    drive(env, ev, arm_state([0.45, 0.1, 0.05], closed=1.0))
    drive(env, ev, arm_state([0.45, 0.1, 0.30], closed=1.0))  # lift
    in_drawer = DRAWER_POS + [0.0, 0.0, 0.03]
    drive(env, ev, arm_state(in_drawer, closed=1.0))
    drive(env, ev, arm_state(in_drawer, closed=0.0))  # release in drawer
    assert ev.finalize_demo("demo_0", env) is True
    record = ev.eval_dict["demo_0_0"]
    assert record["mug_has_been_lifted"] is True
    assert record["mug_has_been_moved"] is True
    assert record["mug_has_been_in_drawer"] is True
    assert record["mug_has_been_in_wrong_drawer"] is False


def test_mug_in_wrong_drawer_fails():
    env = make_mug_env()
    ev = MugInDrawerEvaluator()
    ev.start_demo("demo_0", env)
    drive(env, ev, arm_state([0.45, 0.1, 0.05], closed=0.0))
    drive(env, ev, arm_state([0.45, 0.1, 0.05], closed=1.0))
    wrong = WRONG_DRAWER_POS + [0.0, 0.0, 0.03]
    drive(env, ev, arm_state(wrong, closed=1.0))
    drive(env, ev, arm_state(wrong, closed=0.0))
    assert ev.finalize_demo("demo_0", env) is False
    record = ev.eval_dict["demo_0_0"]
    assert record["mug_has_been_in_wrong_drawer"] is True
    assert record["mug_has_been_in_drawer"] is False


def test_mug_still_held_in_drawer_is_not_success():
    env = make_mug_env()
    ev = MugInDrawerEvaluator()
    ev.start_demo("demo_0", env)
    drive(env, ev, arm_state([0.45, 0.1, 0.05], closed=1.0))
    drive(env, ev, arm_state(DRAWER_POS + [0, 0, 0.03], closed=1.0))
    assert ev.finalize_demo("demo_0", env) is False
    assert ev.eval_dict["demo_0_0"]["mug_has_been_in_drawer"] is True


def test_make_evaluator_for_task():
    from nvblox_mindmap_tpu.embodiments.registry import Tasks

    assert isinstance(
        make_evaluator_for_task(Tasks.CUBE_STACKING), CubeStackingEvaluator
    )
    assert isinstance(
        make_evaluator_for_task(Tasks.MUG_IN_DRAWER), MugInDrawerEvaluator
    )
    from nvblox_mindmap_tpu.closed_loop.evaluators import (
        DrillInBoxEvaluator,
        StickInBinEvaluator,
    )

    assert isinstance(
        make_evaluator_for_task(Tasks.DRILL_IN_BOX), DrillInBoxEvaluator
    )
    assert isinstance(
        make_evaluator_for_task(Tasks.STICK_IN_BIN), StickInBinEvaluator
    )
    assert isinstance(
        make_evaluator_for_task(Tasks.CUBE_STACKING, env_has_object_state=False),
        BasicEvaluator,
    )


def test_object_in_box_geometry():
    """Pins the reference drill_in_box success AABB (terminations.py:30-74):
    0.4 x 0.3 footprint around the box bottom, z in (bottom - 1 cm,
    bottom + 0.2)."""
    from nvblox_mindmap_tpu.closed_loop.evaluators import object_in_box

    box = [1.0, 2.0, 0.5]
    assert object_in_box([1.0, 2.0, 0.55], box)
    assert object_in_box([1.19, 2.14, 0.52], box)  # just inside the corner
    assert not object_in_box([1.21, 2.0, 0.55], box)  # outside x half 0.2
    assert not object_in_box([1.0, 2.16, 0.55], box)  # outside y half 0.15
    assert object_in_box([1.0, 2.0, 0.495], box)  # within 1 cm below
    assert not object_in_box([1.0, 2.0, 0.485], box)
    assert not object_in_box([1.0, 2.0, 0.71], box)  # above box height


def test_object_in_drum_geometry():
    """Pins the reference stick_in_bin success cylinder (terminations.py:
    31-67): radius 0.3, height 0.7, 1 cm tolerance below the drum bottom."""
    from nvblox_mindmap_tpu.closed_loop.evaluators import object_in_drum

    drum = [0.5, -0.5, 0.0]
    assert object_in_drum([0.5, -0.5, 0.3], drum)
    assert object_in_drum([0.5 + 0.29, -0.5, 0.05], drum)
    assert not object_in_drum([0.5 + 0.31, -0.5, 0.05], drum)
    # Radius is measured in xy only.
    assert object_in_drum([0.5 + 0.2, -0.5 - 0.2, 0.65], drum)
    assert not object_in_drum([0.5, -0.5, 0.71], drum)
    assert not object_in_drum([0.5, -0.5, -0.02], drum)


def test_drill_in_box_evaluator_flow():
    """The container evaluator tracks lift/move and flips success only once
    the object is inside the box (judged from object poses, mirroring the
    sim success term the reference reads through BasicEvaluator)."""
    from nvblox_mindmap_tpu.closed_loop.evaluators import DrillInBoxEvaluator

    emb = ArmEmbodiment()
    env = KinematicEnvironment(
        emb, arm_state([0.3, 0.0, 0.3]),
        waypoints=[], max_step_m=0.1,
        objects={
            "power_drill": np.asarray([0.45, 0.0, 0.03]),
            "open_box": np.asarray([0.45, 0.4, 0.02]),
        },
        fixed_objects=["open_box"],
        grasp_radius_m=0.05,
    )
    ev = DrillInBoxEvaluator()
    ev.start_demo("d", env)
    drive(env, ev, arm_state([0.45, 0.0, 0.03]))
    drive(env, ev, arm_state([0.45, 0.0, 0.03], closed=1.0))  # grasp
    drive(env, ev, arm_state([0.45, 0.0, 0.25], closed=1.0))  # lift
    assert not ev.current_success
    drive(env, ev, arm_state([0.45, 0.4, 0.1], closed=1.0))   # into the box
    drive(env, ev, arm_state([0.45, 0.4, 0.1], closed=0.0))   # release
    assert ev.current_success
    assert ev.finalize_demo("d", env)
    extras = ev.eval_dict["d_0"]
    assert extras["object_has_been_lifted"] is True
    assert extras["object_has_been_moved"] is True


def test_runner_integration_with_task_evaluator(tmp_path):
    """run_closed_loop_policy drives a GT goal sequence through the kinematic
    world; the task evaluator judges success from object state."""
    from nvblox_mindmap_tpu.closed_loop.policies import GroundTruthPolicy
    from nvblox_mindmap_tpu.closed_loop.runner import (
        ClosedLoopConfig,
        run_closed_loop_policy,
    )

    goals = [
        arm_state([0.50, 0.15, 0.02], closed=0.0),
        arm_state([0.50, 0.15, 0.02], closed=1.0),
        arm_state([0.50, 0.15, 0.20], closed=1.0),
        arm_state([0.40, 0.00, 0.02 + CUBE], closed=1.0),
        arm_state([0.40, 0.00, 0.02 + CUBE], closed=0.0),
        arm_state([0.60, -0.15, 0.02], closed=0.0),
        arm_state([0.60, -0.15, 0.02], closed=1.0),
        arm_state([0.60, -0.15, 0.25], closed=1.0),
        arm_state([0.40, 0.00, 0.02 + 2 * CUBE], closed=1.0),
        arm_state([0.40, 0.00, 0.02 + 2 * CUBE], closed=0.0),
    ]
    emb = ArmEmbodiment()
    evaluator = CubeStackingEvaluator(
        num_cubes=3, cube_side_length=CUBE,
        eval_file_path=str(tmp_path / "eval.json"),
    )
    summary = run_closed_loop_policy(
        make_env=lambda name: make_cube_env(),
        make_policy=lambda name: GroundTruthPolicy(np.stack(goals)),
        embodiment=emb,
        evaluator=evaluator,
        demo_names=["demo_0"],
        config=ClosedLoopConfig(max_num_steps=400, max_num_steps_to_goal=60),
    )
    assert summary["success_rate"] == 1.0
    import json

    eval_file = json.loads((tmp_path / "eval.json").read_text())
    assert eval_file["demo_0_0"]["success"] is True
