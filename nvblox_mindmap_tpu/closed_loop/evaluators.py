"""Closed-loop evaluators: per-demo success tracking and summaries.

(reference: mindmap/closed_loop/evaluators/*) The evaluator observes every
sim step, finalizes a per-demo outcome, and summarizes a success rate +
JSON evaluation file.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from nvblox_mindmap_tpu.closed_loop.environment import EnvironmentBase


class EvaluatorBase:
    def __init__(self):
        self.demo_outcomes: Dict[str, bool] = {}
        self._current_success = False

    def start_demo(self, demo_name: str):
        self._current_success = False

    def evaluate_step(self, env: EnvironmentBase):
        if env.is_success():
            self._current_success = True

    def finalize_demo(self, demo_name: str) -> bool:
        # Keep the best outcome over retries.
        prev = self.demo_outcomes.get(demo_name, False)
        self.demo_outcomes[demo_name] = prev or self._current_success
        return self._current_success

    def success_rate(self) -> float:
        if not self.demo_outcomes:
            return 0.0
        return float(np.mean([v for v in self.demo_outcomes.values()]))

    def summarize_demos(self) -> Dict:
        return {
            "num_demos": len(self.demo_outcomes),
            "num_successes": int(sum(self.demo_outcomes.values())),
            "success_rate": self.success_rate(),
            "outcomes": {k: bool(v) for k, v in self.demo_outcomes.items()},
        }

    def write_eval_file(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.summarize_demos(), f, indent=2)


class BasicEvaluator(EvaluatorBase):
    """Success from the environment's own success term."""


class WaypointEvaluator(EvaluatorBase):
    """Success when the end-effector has visited all required waypoints.

    Stands in for the task-specific evaluators (CubeStacking / MugInDrawer)
    against environments that expose object state via waypoints.
    """

    def __init__(self, waypoints: List[np.ndarray], tolerance_m: float = 0.03):
        super().__init__()
        self.waypoints = [np.asarray(w) for w in waypoints]
        self.tolerance_m = tolerance_m
        self._visited: List[bool] = []

    def start_demo(self, demo_name: str):
        super().start_demo(demo_name)
        self._visited = [False] * len(self.waypoints)

    def evaluate_step(self, env: EnvironmentBase):
        eef = np.asarray(env.get_policy_state())[:3]
        for i, w in enumerate(self.waypoints):
            if not self._visited[i] and np.linalg.norm(eef - w) < self.tolerance_m:
                self._visited[i] = True
        if all(self._visited):
            self._current_success = True


class CubeStackingEvaluator(WaypointEvaluator):
    """Cube-stacking proxy: visit each cube's grasp point in order."""


class MugInDrawerEvaluator(WaypointEvaluator):
    """Mug-in-drawer proxy: visit mug then drawer."""
