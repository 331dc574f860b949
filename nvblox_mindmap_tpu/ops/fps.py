"""Farthest point sampling (greedy max-min) in JAX.

Replaces the reference's DGL CUDA op ``dgl.geometry.farthest_point_sampler``
(reference: mindmap/diffuser_actor/encoder.py:366-370). Note the reference runs
FPS in *feature space* (not xyz), starting from index 0; we keep both choices.

TPU mapping: a ``lax.scan`` over K selections; each step is one (B, N, C)
distance computation + running-min + argmax, which XLA vectorizes on the VPU.
Static shapes throughout (K fixed at trace time).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sampling(
    points: jnp.ndarray, num_samples: int, start_idx: int = 0
) -> jnp.ndarray:
    """Greedy farthest point sampling.

    Args:
        points: (B, N, C) point set (any feature space).
        num_samples: number of points K to select (static).
        start_idx: index of the first selected point.

    Returns:
        (B, K) int32 indices of the selected points.
    """
    B, N, C = points.shape
    assert 1 <= num_samples <= N

    first = jnp.full((B,), start_idx, dtype=jnp.int32)

    def dist_to(idx):
        # (B, N) squared distance from points[b, idx[b]] to every point.
        sel = jnp.take_along_axis(points, idx[:, None, None], axis=1)  # (B, 1, C)
        diff = points - sel
        return jnp.sum(diff * diff, axis=-1)

    def step(carry, _):
        min_dist, last_idx = carry
        min_dist = jnp.minimum(min_dist, dist_to(last_idx))
        next_idx = jnp.argmax(min_dist, axis=-1).astype(jnp.int32)
        return (min_dist, next_idx), next_idx

    init = (jnp.full((B, N), jnp.inf, dtype=points.dtype), first)
    if num_samples == 1:
        return first[:, None]
    # Unroll amortizes per-step dispatch overhead: each compiled scan body
    # covers several selections (the recurrence itself is inherently serial).
    (_, _), rest = jax.lax.scan(
        step, init, None, length=num_samples - 1, unroll=8
    )
    # rest: (K-1, B) -> (B, K-1)
    return jnp.concatenate([first[:, None], rest.T], axis=1)


def gather_points(values: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather along the point axis: values (B, N, ...), indices (B, K) -> (B, K, ...)."""
    idx = indices.reshape(indices.shape + (1,) * (values.ndim - 2))
    idx = jnp.broadcast_to(idx, indices.shape + values.shape[2:])
    return jnp.take_along_axis(values, idx, axis=1)
