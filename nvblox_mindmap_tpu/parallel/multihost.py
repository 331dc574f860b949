"""Multi-host collectives for metrics and synchronization.

Replaces the reference's pickle-based torch.distributed all_gather + barrier
(reference: model_utils/distributed_training.py:16-57,
image_processing/feature_extraction.py:293-300) with jax multihost utilities:
metric pytrees reduce with process_allgather over DCN; barriers are
sync_global_devices.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np


def is_distributed() -> bool:
    return jax.process_count() > 1


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def print_dist(*args, **kwargs):
    """Print only on process 0 (reference: print_dist)."""
    if get_rank() == 0:
        print(*args, **kwargs)


def all_gather_metrics(metrics: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Gather a metric dict from every process; returns the per-process list.

    Single-process: returns [metrics].
    """
    if not is_distributed():
        return [dict(metrics)]
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    stacked = multihost_utils.process_allgather(
        {k: np.asarray(metrics[k]) for k in keys}
    )
    return [
        {k: np.asarray(stacked[k])[p] for k in keys}
        for p in range(get_world_size())
    ]


def mean_metrics_across_processes(metrics: Dict[str, Any]) -> Dict[str, Any]:
    gathered = all_gather_metrics(metrics)
    return {
        k: np.mean([g[k] for g in gathered], axis=0) for k in gathered[0]
    }


def barrier(name: str = "barrier"):
    """Global device barrier (reference: dist.barrier around rank-0 work)."""
    if is_distributed():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
