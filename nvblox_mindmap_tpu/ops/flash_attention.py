"""Pallas flash attention for TPU.

Parity item for the reference's flash-attn CUDA path
(mindmap/diffuser_actor/multihead_flash_attention.py + converter.py:11-48):
a fused streaming-softmax attention kernel that never materializes the
(L, S) score matrix in HBM.

Kernel shape notes:
- The grid tiles (batch*head, q-blocks, k-blocks); the k axis is the minor
  (sequential) grid dimension, with the running (acc, max, denominator)
  flash recurrence carried in VMEM scratch across k iterations. Only one
  (block_k, d) K/V tile is VMEM-resident at a time, so long contexts stream
  from HBM instead of requiring the whole key axis in VMEM.
- TPU lanes want the last dim =128; head dims are zero-padded to 128 and
  sequence lengths padded to block multiples (padded keys are masked).
- Rows with NO valid keys output exact zeros (p is multiplied by the
  inclusion mask, so the denominator is 0 and the safe-divide yields 0).
  The XLA path's documented fallback is uniform weights instead; the two
  impls only differ in that degenerate case (the encoder substitutes
  content before fully-masked contexts reach attention).
- Block sizes default to 512x512: measured 11x faster than 128x128 at a
  16k-token context on the chip (43.7 ms vs 494 ms, 12.6 TF/s f32) - bigger
  tiles amortize the per-grid-step overhead while staying ~1 MB of VMEM.
  bf16 inputs measured slower (cast overhead dominates); keep f32.
- This model's contexts (<= ~4k tokens, head_dim 15) are small enough that
  XLA's fused attention is already near-optimal, so the default path stays
  XLA; flash becomes profitable for long-context variants and is exposed via
  ``attention_impl="flash"`` / ``convert_to_flash_attention``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, acc_ref, m_ref, l_ref,
                  *, num_k_blocks: int):
    """One (batch*head, q-block, k-block) program.

    The k axis is the minor grid dimension: scratch (acc, m, l) carries the
    streaming-softmax state across k iterations; the output block is written
    once on the last k iteration.
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[...]  # (block_q, d)
    k = k_ref[...]  # (block_k, d)
    v = v_ref[...]
    mask = mask_ref[0, :]  # (block_k,) bool, True = valid key
    mask_f = mask.astype(jnp.float32)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    s = jnp.where(mask[None, :], s, NEG_INF)

    m_prev = m_ref[:, 0]
    l_prev = l_ref[:, 0]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    alpha = jnp.exp(m_prev - m_new)
    # Multiplying by the inclusion mask keeps masked columns at exactly 0
    # even when every score in the row is NEG_INF (then exp(s - m_new) = 1).
    p = jnp.exp(s - m_new[:, None]) * mask_f[None, :]
    l_new = l_prev * alpha + jnp.sum(p, axis=-1)
    acc_ref[...] = acc_ref[...] * alpha[:, None] + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(ki == num_k_blocks - 1)
    def _finish():
        l = l_ref[:, 0]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[...] = (acc_ref[...] / safe_l[:, None]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention over pre-scaled q/k/v.

    Args:
        q: (B, H, L, D) queries (already scaled by 1/sqrt(D_head)).
        k, v: (B, H, S, D).
        key_padding_mask: optional (B, S) bool, True = VALID key (note: this
            is the inclusion convention; the model layer inverts its
            exclusion masks before calling).

    Returns:
        (B, H, L, D) attention output.
    """
    B, H, L, D = q.shape
    S = k.shape[2]
    Dp = _round_up(D, 128)
    Lp = _round_up(L, block_q)
    Sp = _round_up(S, block_k)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Lp - L), (0, Dp - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D)))
    if key_padding_mask is None:
        mask = jnp.ones((B, S), dtype=bool)
    else:
        mask = key_padding_mask
    maskp = jnp.pad(mask, ((0, 0), (0, Sp - S)))
    # Broadcast the mask over heads: (B*H, 1, Sp) - 2D trailing dims for
    # TPU tiling.
    maskp = jnp.repeat(maskp, H, axis=0)[:, None, :]

    qf = qp.reshape(B * H, Lp, Dp)
    kf = kp.reshape(B * H, Sp, Dp)
    vf = vp.reshape(B * H, Sp, Dp)

    num_k_blocks = Sp // block_k
    kernel = functools.partial(_flash_kernel, num_k_blocks=num_k_blocks)
    out = pl.pallas_call(
        kernel,
        grid=(B * H, Lp // block_q, num_k_blocks),
        in_specs=[
            pl.BlockSpec((None, block_q, Dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((None, block_k, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((None, block_k, Dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((None, 1, block_k), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((None, block_q, Dp), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, Dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, Dp), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, maskp)
    return out.reshape(B, H, Lp, Dp)[:, :, :L, :D]
