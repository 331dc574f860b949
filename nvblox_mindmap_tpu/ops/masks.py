"""Binary mask operations (erosion, borders, AND-pooling downscale).

Matches the reference semantics (mindmap/image_processing/image_mask_operations.py):
erosion = max-pool of the inverted mask; downscale = all-reduce over
``factor x factor`` blocks. Implemented with reduce_window / reshape so XLA
lowers them to fused vector ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def erode_mask(mask: jnp.ndarray, kernel_size: int = 3, iterations: int = 1) -> jnp.ndarray:
    """Erode a 2D bool mask: expand the False regions by max-pooling their complement."""
    assert mask.ndim == 2
    assert kernel_size % 2 == 1
    pad = (kernel_size - 1) // 2
    inv = (~mask).astype(jnp.float32)
    for _ in range(iterations):
        inv = jax.lax.reduce_window(
            inv,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(kernel_size, kernel_size),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
        )
    return ~(inv > 0)


def get_border_mask(shape, border_percent: float) -> jnp.ndarray:
    """(H, W) bool mask, False on a border of ``border_percent`` of each side."""
    height, width = shape[:2]
    border_h = int(border_percent * 0.01 * height)
    border_w = int(border_percent * 0.01 * width)
    mask = jnp.ones((height, width), dtype=bool)
    if border_h > 0 and border_w > 0:
        mask = mask.at[:border_h, :].set(False)
        mask = mask.at[-border_h:, :].set(False)
        mask = mask.at[:, :border_w].set(False)
        mask = mask.at[:, -border_w:].set(False)
    return mask


def downscale_mask(mask: jnp.ndarray, factor: int) -> jnp.ndarray:
    """AND-pool a (..., H, W) bool mask by ``factor`` along the last two dims."""
    assert factor > 0
    *lead, H, W = mask.shape
    assert H % factor == 0 and W % factor == 0
    view = mask.reshape(*lead, H // factor, factor, W // factor, factor)
    return jnp.all(view, axis=(-1, -3))
