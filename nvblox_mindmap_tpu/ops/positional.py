"""Positional encodings: sinusoidal time embedding and rotary 3D encodings.

Semantics match the reference (mindmap/diffuser_actor/position_encodings.py):

- ``sinusoidal_pos_emb``: classic transformer timestep embedding,
  exp-spaced frequencies, (sin || cos).
- ``rotary_pe_3d``: XYZ rotary encoding. The feature dimension F is split
  into three bands of F//3 (one per axis); each band holds F//6 frequencies
  duplicated pairwise (interleaved) so that ``embed_rotary`` can rotate
  adjacent (even, odd) channel pairs. Output layout is (..., N, F, 2) with
  channel 0 = cos, channel 1 = sin.
- ``embed_rotary``: applies the rotation x*cos + rot90(x)*sin where
  rot90 interleaves (-x_odd, x_even).

These are pure functions of positions; no parameters.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def sinusoidal_pos_emb(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(...,) scalar positions -> (..., dim) embeddings (sin || cos)."""
    half_dim = dim // 2
    emb_scale = math.log(10000) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb_scale)
    args = x[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def _interleave_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(..., d) -> (..., 2d) duplicating each value pairwise: a,b -> a,a,b,b."""
    return jnp.stack([x, x], axis=-1).reshape(x.shape[:-1] + (2 * x.shape[-1],))


def rotary_pe_1d(positions: jnp.ndarray, feature_dim: int) -> jnp.ndarray:
    """1D rotary code: (..., N) -> (..., N, F, 2) with (cos, sin) last."""
    div_term = jnp.exp(
        jnp.arange(0, feature_dim, 2, dtype=jnp.float32)
        * (-math.log(10000.0) / feature_dim)
    )
    args = positions[..., None].astype(jnp.float32) * div_term
    sin = _interleave_pairs(jnp.sin(args))
    cos = _interleave_pairs(jnp.cos(args))
    return jnp.stack([cos, sin], axis=-1)


def rotary_pe_3d(xyz: jnp.ndarray, feature_dim: int) -> jnp.ndarray:
    """3D rotary code.

    Args:
        xyz: (..., N, 3) positions.
        feature_dim: embedding dim F; must be divisible by 6.

    Returns:
        (..., N, F, 2) with channel 0 = cos, channel 1 = sin; the F axis is
        [x-band || y-band || z-band], each of width F//3.
    """
    assert feature_dim % 6 == 0, (
        f"rotary 3D PE needs embedding_dim divisible by 6 (3 xyz bands of "
        f"sin/cos pairs), got {feature_dim} (reference "
        f"position_encodings.py:58-145 has the same constraint; use e.g. "
        f"{feature_dim - feature_dim % 6} or {feature_dim + 6 - feature_dim % 6})"
    )
    band = feature_dim // 3
    div_term = jnp.exp(
        jnp.arange(0, band, 2, dtype=jnp.float32) * (-math.log(10000.0) / band)
    )
    args = xyz[..., None].astype(jnp.float32) * div_term  # (..., N, 3, band//2)
    sin = _interleave_pairs(jnp.sin(args))  # (..., N, 3, band)
    cos = _interleave_pairs(jnp.cos(args))
    # Concatenate the 3 axis bands along the feature dim.
    sin = sin.reshape(sin.shape[:-2] + (3 * band,))
    cos = cos.reshape(cos.shape[:-2] + (3 * band,))
    return jnp.stack([cos, sin], axis=-1)


def embed_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate channel pairs of x by the rotary phase (cos, sin).

    x, cos, sin: (..., N, F). Returns same shape.
    """
    x_even = x[..., 0::2]
    x_odd = x[..., 1::2]
    x2 = jnp.stack([-x_odd, x_even], axis=-1).reshape(x.shape)
    return x * cos + x2 * sin


def apply_rotary_code(x: jnp.ndarray, code: jnp.ndarray) -> jnp.ndarray:
    """Apply a (cos, sin) rotary code of shape (..., N, F, 2) to x (..., N, F)."""
    return embed_rotary(x, code[..., 0], code[..., 1])
