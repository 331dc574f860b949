"""Demo validation app (reference: mindmap/run_validate_demos.py).

Replays each demo's ground-truth keyposes closed-loop (kinematic check) and
overwrites ``demo_successful.npy`` with FAILED_GT_EVAL for demos whose GT
keyposes cannot be executed - the fault-*detection* pass that excludes bad
demos from training.
"""
from __future__ import annotations

import logging
import os

import numpy as np

from nvblox_mindmap_tpu.closed_loop.environment import KinematicEnvironment
from nvblox_mindmap_tpu.closed_loop.evaluators import BasicEvaluator
from nvblox_mindmap_tpu.closed_loop.policies import GroundTruthPolicy
from nvblox_mindmap_tpu.closed_loop.runner import ClosedLoopConfig, run_one_episode
from nvblox_mindmap_tpu.data.dataset import DemoOutcome, get_demo_paths
from nvblox_mindmap_tpu.embodiments.registry import make_embodiment_for_task
from nvblox_mindmap_tpu.utils.config import ClosedLoopAppArgs, parse_args

logger = logging.getLogger("nvblox_mindmap_tpu.run_validate_demos")


def main(argv=None, task=None, dataset=None, demos=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(message)s")
    # The reference's validate app parses ClosedLoopAppArgs (its
    # ValidateDemosAppArgs class is dead code without a task field;
    # run_validate_demos.py:44) - task/dataset come from the full arg set.
    args = parse_args(ClosedLoopAppArgs, argv)
    task = task or args.task
    dataset = dataset or args.dataset
    demos = demos or args.demos_closed_loop
    assert task is not None and dataset is not None, "--task and --dataset required"

    from nvblox_mindmap_tpu.embodiments.registry import (
        TASK_TO_EXTRA_KEYPOSES_AROUND_GRASP_EVENTS,
        TASK_TO_KEYPOSE_DETECTION_MODE,
    )

    embodiment = make_embodiment_for_task(task)
    extra = TASK_TO_EXTRA_KEYPOSES_AROUND_GRASP_EVENTS[task]
    mode = TASK_TO_KEYPOSE_DETECTION_MODE[task]

    results = {}
    for demo_path in get_demo_paths(dataset, demos):
        gt = GroundTruthPolicy.from_demo(demo_path, embodiment, extra, mode)
        initial = gt.goals[0]
        waypoints = [g[:3] for g in gt.goals[1:]]
        env = KinematicEnvironment(embodiment, initial, waypoints)
        evaluator = BasicEvaluator()
        evaluator.start_demo(demo_path)
        # Re-serve the goals from the start for execution.
        policy = GroundTruthPolicy(np.stack(gt.goals[1:])) if len(gt.goals) > 1 else gt
        success = run_one_episode(
            env, policy, embodiment, evaluator,
            ClosedLoopConfig(
                max_num_steps_to_goal=args.max_num_steps_to_goal,
                max_intermediate_distance_m=args.max_intermediate_distance_m,
                terminate_after_n_steps=args.terminate_after_n_steps,
            ),
        )
        results[demo_path] = success
        if not success:
            outcome_path = os.path.join(demo_path, "demo_successful.npy")
            np.save(outcome_path, np.asarray(DemoOutcome.FAILED_GT_EVAL.value))
            logger.info("Demo %s marked FAILED_GT_EVAL", demo_path)
    logger.info(
        "Validated %d demos, %d failed",
        len(results),
        sum(not v for v in results.values()),
    )
    return results


if __name__ == "__main__":
    main()
