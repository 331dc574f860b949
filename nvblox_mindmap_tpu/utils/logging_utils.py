"""Metric logging: console + optional wandb (reference: wandb calls throughout
run_training.py).

``MetricLogger`` mirrors the reference's logging surface - per-component
train losses, the 18 eval metrics, learning rate, timings - to the console
and, when wandb is importable and enabled, to a wandb run. Everything is a
no-op-safe call so headless TPU pods run without wandb installed/configured.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger("nvblox_mindmap_tpu.metrics")


class MetricLogger:
    def __init__(
        self,
        use_wandb: bool = False,
        wandb_project: Optional[str] = None,
        wandb_name: Optional[str] = None,
        wandb_entity: Optional[str] = None,
        wandb_mode: str = "disabled",
        config: Optional[Dict] = None,
    ):
        self._wandb = None
        if use_wandb and wandb_mode != "disabled":
            try:
                import wandb

                wandb.init(
                    project=wandb_project,
                    name=wandb_name,
                    entity=wandb_entity,
                    mode=wandb_mode,
                    config=config,
                )
                self._wandb = wandb
            except Exception as e:  # wandb missing or offline failure
                logger.warning("wandb unavailable (%s); console logging only", e)

    def log(self, metrics: Dict[str, Any], step: int, prefix: str = ""):
        flat = {}
        for key, value in metrics.items():
            arr = np.asarray(value)
            if arr.ndim == 0:
                flat[f"{prefix}{key}"] = float(arr)
            else:
                for i, v in enumerate(arr.ravel()):
                    flat[f"{prefix}{key}_{i}"] = float(v)
        if self._wandb is not None:
            self._wandb.log(flat, step=step)
        else:
            parts = ", ".join(f"{k}={v:.5f}" for k, v in flat.items())
            logger.info("step %d: %s", step, parts)

    def log_timings(self, step: int, timer_names_to_log):
        from nvblox_mindmap_tpu.utils.timers import get_mean_time

        self.log(
            {f"timings/{name}": get_mean_time(name) for name in timer_names_to_log},
            step,
        )

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
