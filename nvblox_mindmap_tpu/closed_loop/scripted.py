"""Scripted cube-stacking expert + demo recorder for the kinematic world.

The reference generates its demonstration datasets with Isaac Lab Mimic
experts and records them through IsaacLabWriter (reference:
mindmap/run_isaaclab_datagen.py, mindmap/isaaclab_utils/isaaclab_writer.py).
This module is the hermetic equivalent on ``SceneKinematicEnvironment``: a
deterministic pick-and-place expert stacks the cubes, and every sim step is
persisted in the recorded demo layout (RGB/depth/pose/intrinsics/semantics
PNGs + 9-dim arm robot states with ramped jaw positions, so the keypose
machinery's grasp-event detection sees the same signal shape as real jaws).

The produced demos feed the standard chain unchanged: run_datagen fusion ->
run_training -> open/closed-loop evaluation, which is what closes the full
capability loop (datagen -> train -> live mapping + diffusion -> task
success) without a simulator.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np

from nvblox_mindmap_tpu.closed_loop.goals import is_goal_reached
from nvblox_mindmap_tpu.closed_loop.scene import (
    SceneKinematicEnvironment,
    look_at_pose7,
)
from nvblox_mindmap_tpu.data.writer import DemoWriter
from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment

# Jaw positions for the recorded 9-dim arm robot state: fully open matches
# the embodiment's GRIPPER_OPEN_THRESHOLD; the ramp speed (7.5 mm/frame)
# clears the grasp-event speed threshold (arm.py gripper_speed_threshold).
JAW_OPEN = 0.04
JAW_CLOSED = 0.01
JAW_SPEED = 0.0075

DOWN_QUAT = np.asarray([0.0, 1.0, 0.0, 0.0], dtype=np.float32)  # eef pointing down


def _goal(pos, closed: float) -> np.ndarray:
    return np.concatenate(
        [np.asarray(pos, np.float32), DOWN_QUAT, [np.float32(closed)]]
    )


def scripted_stack_goals(
    objects: Dict[str, np.ndarray],
    cube_half: float,
    hover_z: float = 0.22,
    retreat_pos=(0.4, 0.0, 0.3),
    approach_from=None,
) -> List[np.ndarray]:
    """Expert goal sequence stacking cube_2 (and cube_3, ...) onto cube_1.

    Mirrors the Mimic expert's phase structure (approach / descend / grasp /
    lift / transport / place / release / retreat) as 8-dim arm policy states.

    ``approach_from``: optional FIXED staging position replacing the
    above-the-pick approach. With it, the first object-dependent keypose is
    the pick itself - so a policy's gripper HISTORY carries no information
    about where the object is, and predicting the pick requires reading the
    observation (the control needed by the spatial-memory experiment).
    """
    names = sorted(objects)
    assert names[0] == "cube_1", f"expected cube_1..cube_N, got {names}"
    base = np.asarray(objects["cube_1"][:3], np.float64)
    goals: List[np.ndarray] = []
    for level, name in enumerate(names[1:], start=1):
        pick = np.asarray(objects[name][:3], np.float64)
        place = base + np.asarray([0.0, 0.0, 2.0 * cube_half * level])
        if approach_from is None:
            approach = _goal([pick[0], pick[1], hover_z], 0.0)
        else:
            approach = _goal(approach_from, 0.0)
        goals += [
            approach,                                  # approach / staging
            _goal(pick, 0.0),                          # descend
            _goal(pick, 1.0),                          # grasp
            _goal([pick[0], pick[1], hover_z], 1.0),   # lift
            _goal([place[0], place[1], hover_z], 1.0),  # transport
            _goal(place, 1.0),                          # place
            _goal(place, 0.0),                          # release
            _goal([place[0], place[1], hover_z], 0.0),  # retreat up
        ]
    goals.append(_goal(retreat_pos, 0.0))
    return goals


class ArmDemoRecorder:
    """Streams SceneKinematicEnvironment frames into the demo layout.

    Writes per frame: wrist_{rgb,depth,semantic}.png + wrist_{pose,
    intrinsics}.npy + robot_state.npy (9-dim: pose7 + 2 jaws). Jaws ramp
    toward the commanded closedness at JAW_SPEED so grasp events are
    detectable intervals, as real gripper recordings are.
    """

    def __init__(self, demo_dir: str, env: SceneKinematicEnvironment):
        self.writer = DemoWriter(demo_dir)
        self.env = env
        self.t = 0
        self._jaw = JAW_OPEN
        self.writer.write_semantic_labels(env.semantic_id_to_class)

    @property
    def jaws_settled(self) -> bool:
        target = JAW_CLOSED if float(self.env.state[7]) >= 0.5 else JAW_OPEN
        return abs(self._jaw - target) < 1e-6

    def record_frame(self) -> None:
        target = JAW_CLOSED if float(self.env.state[7]) >= 0.5 else JAW_OPEN
        self._jaw += np.clip(target - self._jaw, -JAW_SPEED, JAW_SPEED)
        state9 = np.concatenate(
            [self.env.state[:7], [self._jaw, self._jaw]]
        ).astype(np.float32)
        self.writer.write_robot_state(self.t, state9)
        for name, frame in self.env.get_cameras().items():
            self.writer.write_camera_frame(
                self.t, name, frame.rgb, frame.depth, frame.pose7,
                frame.intrinsics,
            )
            if frame.segmentation is not None:
                self.writer.write_semantic(self.t, name, frame.segmentation)
        self.t += 1


def record_scripted_demo(
    demo_dir: str,
    env: SceneKinematicEnvironment,
    goals: List[np.ndarray],
    max_steps_per_goal: int = 40,
    settle_frames: int = 2,
) -> int:
    """Run the scripted goals in ``env``, recording every frame.

    Returns the number of recorded frames. Writes demo_successful.npy = 1
    (the expert is deterministic; callers may assert task success separately
    with an evaluator on the same env before recording).
    """
    embodiment = env.embodiment
    assert isinstance(embodiment, ArmEmbodiment), "arm-only recorder"
    env.reset()
    rec = ArmDemoRecorder(demo_dir, env)
    rec.record_frame()  # initial observation
    for goal in goals:
        for _ in range(max_steps_per_goal):
            env.step(goal)
            rec.record_frame()
            if (
                is_goal_reached(embodiment, env.get_policy_state(), goal)
                and rec.jaws_settled
            ):
                break
        for _ in range(settle_frames):
            env.step(goal)
            rec.record_frame()
    rec.writer.write_outcome(1)
    return rec.t


def write_scene_json(demo_dir: str, env: SceneKinematicEnvironment) -> None:
    """Persist the scene spec next to the demo so closed-loop evaluation can
    reconstruct the same world (the sim-side analog: Isaac episodes re-spawn
    the task scene from the env config + recorded reset state)."""
    import json

    spec = {
        "objects": {k: [float(x) for x in v[:3]]
                    for k, v in env.initial_objects.items()},
        # Per-object half extents (mixed-size scenes); older scene.json
        # files carry a single float, which the loader still accepts.
        "object_half_extents": {
            k: [float(x) for x in v]
            for k, v in env.object_half_map.items()
        },
        "fixed_objects": sorted(env.fixed_objects),
        "object_colors": {
            k: [float(x) for x in v] for k, v in env.object_colors.items()
        },
        "image_size": env.image_size,
        "grasp_radius_m": env.grasp_radius_m,
        "initial_state": [float(x) for x in env.initial_state],
    }
    with open(os.path.join(demo_dir, "scene.json"), "w") as f:
        json.dump(spec, f, indent=2)


def env_from_scene_json(demo_dir: str) -> Optional[SceneKinematicEnvironment]:
    """Rebuild the SceneKinematicEnvironment recorded with a demo, or None."""
    import json

    path = os.path.join(demo_dir, "scene.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        spec = json.load(f)
    half = spec["object_half_extents"]
    if isinstance(half, dict):
        half = {k: np.asarray(v) for k, v in half.items()}
    return SceneKinematicEnvironment(
        ArmEmbodiment(),
        np.asarray(spec["initial_state"], np.float32),
        objects={k: np.asarray(v) for k, v in spec["objects"].items()},
        object_half_extents=half,
        image_size=int(spec["image_size"]),
        grasp_radius_m=spec["grasp_radius_m"],
        fixed_objects=spec.get("fixed_objects"),
        object_colors={
            k: np.asarray(v)
            for k, v in spec.get("object_colors", {}).items()
        },
    )


def make_cube_stacking_env(
    seed: int,
    num_cubes: int = 2,
    cube_half: float = 0.04,
    image_size: int = 64,
    camera_pose_fn: Optional[Callable[[int], Dict[str, np.ndarray]]] = None,
    randomize: bool = True,
    grasp_radius_m: float = 0.06,
) -> SceneKinematicEnvironment:
    """Cube-stacking scene with per-seed randomized cube placements.

    Cubes rest on the table (top z = 0) inside the cube_stacking task AABB
    (mapping/constants.py): x in [0.3, 0.7], y in [-0.25, 0.25].
    """
    rng = np.random.default_rng(seed)
    objects: Dict[str, np.ndarray] = {}
    positions: List[np.ndarray] = []
    for i in range(num_cubes):
        for _ in range(100):
            if randomize:
                xy = rng.uniform([0.32, -0.22], [0.68, 0.22])
            else:
                xy = np.asarray([0.4 + 0.2 * i, -0.1 + 0.2 * i])
            if all(
                np.linalg.norm(xy - p[:2]) > 6.0 * cube_half for p in positions
            ):
                break
        pos = np.asarray([xy[0], xy[1], cube_half])
        positions.append(pos)
        objects[f"cube_{i + 1}"] = pos
    start = np.concatenate([[0.4, 0.0, 0.3], DOWN_QUAT, [0.0]]).astype(
        np.float32
    )
    return SceneKinematicEnvironment(
        ArmEmbodiment(),
        start,
        objects=objects,
        object_half_extents=cube_half,
        image_size=image_size,
        camera_pose_fn=camera_pose_fn,
        grasp_radius_m=grasp_radius_m,
    )


# --- mug_in_drawer scene -----------------------------------------------------
# Geometry mirrors the MugInDrawerEvaluator's reference-parity constants
# (evaluators.py / reference mug_in_drawer_evaluator.py): drawer bottoms are
# 0.4 x 0.65 trays, the mug is a 0.05-radius x 0.1-height body, and success
# means the mug released inside the mugs drawer - the boxes drawer is the
# distractor target the evaluator tracks as a failure mode.
MUG_HALF = np.asarray([0.045, 0.045, 0.05])
DRAWER_HALF = np.asarray([0.2, 0.325, 0.01])
DRAWER_Z = 0.02  # tray bottom slab center: top surface at 0.03


def make_mug_in_drawer_env(
    seed: int,
    image_size: int = 64,
    camera_pose_fn: Optional[Callable[[int], Dict[str, np.ndarray]]] = None,
    randomize: bool = True,
    grasp_radius_m: float = 0.06,
) -> SceneKinematicEnvironment:
    """Mug + two drawer trays in the mug_in_drawer task AABB.

    The mug spawns on the table between the trays; per-seed randomization
    moves the mug AND swaps which side holds the mugs drawer, so a policy
    must identify the correct drawer from the observation.
    """
    rng = np.random.default_rng(seed)
    if randomize:
        mug_xy = rng.uniform([0.32, -0.18], [0.62, 0.18])
        mugs_side = 1.0 if rng.uniform() < 0.5 else -1.0
    else:
        mug_xy = np.asarray([0.45, 0.0])
        mugs_side = 1.0
    objects = {
        "target_mug": np.asarray([mug_xy[0], mug_xy[1], MUG_HALF[2]]),
        "bottom_of_drawer_with_mugs": np.asarray(
            [0.45, mugs_side * 0.5, DRAWER_Z]
        ),
        "bottom_of_drawer_with_boxes": np.asarray(
            [0.45, -mugs_side * 0.5, DRAWER_Z]
        ),
    }
    start = np.concatenate([[0.4, 0.0, 0.3], DOWN_QUAT, [0.0]]).astype(
        np.float32
    )
    if camera_pose_fn is None:
        # Wider framing than the cube scene: both drawer trays (y = +-0.5)
        # must be visible so the policy can identify the correct one.
        wide_pose = look_at_pose7(
            eye=(0.45, -1.15, 0.8), target=(0.45, 0.0, 0.03)
        )

        def camera_pose_fn(step: int) -> Dict[str, np.ndarray]:
            return {"wrist": wide_pose}

    return SceneKinematicEnvironment(
        ArmEmbodiment(),
        start,
        objects=objects,
        object_half_extents={
            "target_mug": MUG_HALF,
            "bottom_of_drawer_with_mugs": DRAWER_HALF,
            "bottom_of_drawer_with_boxes": DRAWER_HALF,
        },
        fixed_objects=[
            "bottom_of_drawer_with_mugs", "bottom_of_drawer_with_boxes",
        ],
        object_colors={
            "target_mug": np.asarray([0.9, 0.9, 0.92]),
            # Color encodes drawer identity (the hermetic stand-in for the
            # reference scene's visually distinct drawer contents).
            "bottom_of_drawer_with_mugs": np.asarray([0.2, 0.6, 0.25]),
            "bottom_of_drawer_with_boxes": np.asarray([0.6, 0.3, 0.15]),
        },
        table_half_extents=(0.45, 0.85, 0.025),
        image_size=image_size,
        camera_pose_fn=camera_pose_fn,
        grasp_radius_m=grasp_radius_m,
    )


def scripted_mug_goals(
    objects: Dict[str, np.ndarray], hover_z: float = 0.24,
    retreat_pos=(0.4, 0.0, 0.3),
) -> List[np.ndarray]:
    """Expert: pick the mug, transport it into the mugs drawer, release."""
    mug = np.asarray(objects["target_mug"][:3], np.float64)
    drawer = np.asarray(objects["bottom_of_drawer_with_mugs"][:3], np.float64)
    place = np.asarray(
        [drawer[0], drawer[1], drawer[2] + DRAWER_HALF[2] + MUG_HALF[2]]
    )
    return [
        _goal([mug[0], mug[1], hover_z], 0.0),        # approach
        _goal(mug, 0.0),                              # descend
        _goal(mug, 1.0),                              # grasp
        _goal([mug[0], mug[1], hover_z], 1.0),        # lift
        _goal([place[0], place[1], hover_z], 1.0),    # transport
        _goal(place, 1.0),                            # lower into drawer
        _goal(place, 0.0),                            # release
        _goal([place[0], place[1], hover_z], 0.0),    # retreat up
        _goal(retreat_pos, 0.0),
    ]


def generate_mug_in_drawer_demos(
    dataset_dir: str,
    num_demos: int,
    seed: int = 0,
    image_size: int = 64,
    camera_pose_fn_factory: Optional[
        Callable[[SceneKinematicEnvironment], Callable]
    ] = None,
    require_expert_success: bool = True,
) -> List[str]:
    """Scripted mug_in_drawer demos, expert-verified by MugInDrawerEvaluator."""
    from nvblox_mindmap_tpu.closed_loop.evaluators import MugInDrawerEvaluator

    demo_dirs = []
    for d in range(num_demos):
        env = make_mug_in_drawer_env(seed + d, image_size=image_size)
        if camera_pose_fn_factory is not None:
            env.camera_pose_fn = camera_pose_fn_factory(env)
        goals = scripted_mug_goals(env.initial_objects)
        demo_dir = os.path.join(dataset_dir, f"demo_{d:05d}")
        evaluator = MugInDrawerEvaluator()
        evaluator.start_demo(f"demo_{d:05d}", env)

        n = record_scripted_demo(demo_dir, env, goals)
        write_scene_json(demo_dir, env)
        evaluator.evaluate_step(env)
        if require_expert_success and not evaluator.current_success:
            raise AssertionError(
                f"scripted expert failed mug_in_drawer demo {d} "
                f"(objects: {env.get_object_poses()})"
            )
        assert n > 10, f"demo {d} too short ({n} frames)"
        demo_dirs.append(demo_dir)
    return demo_dirs


def generate_cube_stacking_demos(
    dataset_dir: str,
    num_demos: int,
    seed: int = 0,
    num_cubes: int = 2,
    cube_half: float = 0.04,
    image_size: int = 64,
    camera_pose_fn_factory: Optional[
        Callable[[SceneKinematicEnvironment], Callable]
    ] = None,
    require_expert_success: bool = True,
    approach_from=None,
) -> List[str]:
    """Generate ``num_demos`` scripted stacking demos in the demo layout.

    Each demo gets its own randomized scene (seed + index). With
    ``require_expert_success`` the expert's own rollout is judged by
    CubeStackingEvaluator before recording counts - a failing expert is a
    bug, not data.
    """
    from nvblox_mindmap_tpu.closed_loop.evaluators import CubeStackingEvaluator

    demo_dirs = []
    for d in range(num_demos):
        env = make_cube_stacking_env(
            seed + d, num_cubes=num_cubes, cube_half=cube_half,
            image_size=image_size,
        )
        if camera_pose_fn_factory is not None:
            env.camera_pose_fn = camera_pose_fn_factory(env)
        goals = scripted_stack_goals(
            env.initial_objects, cube_half, approach_from=approach_from
        )
        demo_dir = os.path.join(dataset_dir, f"demo_{d:05d}")
        evaluator = CubeStackingEvaluator(
            num_cubes=num_cubes, cube_side_length=2.0 * cube_half
        )
        evaluator.start_demo(f"demo_{d:05d}", env)

        n = record_scripted_demo(demo_dir, env, goals)
        write_scene_json(demo_dir, env)
        evaluator.evaluate_step(env)
        if require_expert_success and not evaluator.current_success:
            raise AssertionError(
                f"scripted expert failed to stack in demo {d} "
                f"(objects: {env.get_object_poses()})"
            )
        assert n > 10, f"demo {d} too short ({n} frames)"
        demo_dirs.append(demo_dir)
    return demo_dirs
