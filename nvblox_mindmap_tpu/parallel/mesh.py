"""Device mesh and sharding helpers (data-parallel training).

The reference trains with DDP over NCCL (reference:
mindmap/model_utils/multi_gpu.py, run_training.py:608-613). The TPU-native
equivalent: a 1-D ``Mesh(('data',))`` over all local/global devices; batches
are sharded on the leading axis, parameters replicated, and jit inserts the
gradient psum over ICI automatically. Multi-host initialization goes through
``jax.distributed.initialize`` (call ``maybe_init_distributed`` once per
process).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a pytree of host arrays with leading-axis sharding.

    None leaves pass through (the model-input dict uses None for absent
    modalities).
    """
    sharding = batch_sharding(mesh)

    def put(x):
        if x is None:
            return None
        if not isinstance(x, jax.Array):
            # Host arrays copy in; device arrays (e.g. packed-epoch HBM
            # slices, data/packed.py) must NOT round-trip through
            # np.asarray - device_put reshards in place (a no-op when the
            # sharding already matches).
            x = np.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch, is_leaf=lambda x: x is None)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if x is not None else None,
        tree,
        is_leaf=lambda x: x is None,
    )


_DISTRIBUTED_INITIALIZED = False


def maybe_init_distributed():
    """Initialize jax.distributed from environment if running multi-process.

    MUST run before any other jax call in the process: querying
    jax.process_count() (as an earlier version did) initializes the XLA
    backend and makes jax.distributed.initialize() fail. The decision is
    therefore made purely from environment variables; idempotent.
    """
    import os

    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
        _DISTRIBUTED_INITIALIZED = True
