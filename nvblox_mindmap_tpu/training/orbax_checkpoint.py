"""Orbax checkpoint backend (async, production TPU checkpointing).

The default backend (training/checkpoint.py) writes single-file msgpack
checkpoints - simple and portable. For large-scale TPU training, orbax adds
async writes (training continues during serialization), atomicity, and
sharded-array support. Same best/last contract as the default backend.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax


class OrbaxCheckpointer:
    def __init__(self, checkpoint_dir: str, async_write: bool = True):
        import orbax.checkpoint as ocp

        self.checkpoint_dir = os.path.abspath(checkpoint_dir)
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self._ocp = ocp
        self._ckptr = (
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            if async_write
            else ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        )

    def _path(self, name: str) -> str:
        return os.path.join(self.checkpoint_dir, name)

    def save(self, name: str, params: Any, opt_state: Any, step: int,
             loss: Optional[float]):
        payload = {
            "params": params,
            "opt_state": opt_state,
            "meta": {
                "iter": step,
                "best_loss": float("nan") if loss is None else float(loss),
            },
        }
        self._ckptr.save(self._path(name), payload, force=True)

    def save_best_and_last(self, params, opt_state, step: int,
                           new_loss: Optional[float],
                           best_loss: Optional[float]) -> Optional[float]:
        if new_loss is not None and (best_loss is None or new_loss <= best_loss):
            best_loss = new_loss
            self.save("best", params, opt_state, step, best_loss)
        # last records the RUNNING best (reference checkpoint.py:42-50).
        self.save("last", params, opt_state, step, best_loss)
        return best_loss

    def restore(self, name: str, params_template: Any, opt_state_template: Any
                ) -> Tuple[Any, Any, int, Optional[float]]:
        import math

        target = {
            "params": params_template,
            "opt_state": opt_state_template,
            "meta": {"iter": 0, "best_loss": 0.0},
        }
        restored = self._ckptr.restore(self._path(name), item=target)
        best = restored["meta"]["best_loss"]
        best = None if (best is None or math.isnan(best)) else float(best)
        return (
            restored["params"],
            restored["opt_state"],
            int(restored["meta"]["iter"]),
            best,
        )

    def wait(self):
        """Block until pending async saves complete."""
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()
