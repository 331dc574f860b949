"""Pallas flash attention for TPU.

Parity item for the reference's flash-attn CUDA path
(mindmap/diffuser_actor/multihead_flash_attention.py + converter.py:11-48):
a fused streaming-softmax attention kernel that never materializes the
(L, S) score matrix in HBM.

Kernel shape notes:
- Blocks tile the query axis; the key axis is streamed in VMEM-resident
  chunks with a running (max, denominator) rescale - the standard
  flash-attention recurrence.
- TPU lanes want the last dim =128; head dims are zero-padded to 128 and
  sequence lengths padded to block multiples (padded keys are masked).
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

NEG_INF = -1e9


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int,
                  kv_len: int):
    """One (batch*head, q-block) program: stream K/V blocks."""
    q = q_ref[...]  # (block_q, d)
    block_q, d = q.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        start = i * block_k
        k = k_ref[pl.ds(start, block_k), :]  # (block_k, d)
        v = v_ref[pl.ds(start, block_k), :]
        mask = mask_ref[0, pl.ds(start, block_k)]  # (block_k,) bool

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = jnp.where(mask[None, :], s, NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return (acc, m_new, l_new)

    n_blocks = kv_len // block_k
    init = (
        jnp.zeros((block_q, d), dtype=jnp.float32),
        jnp.full((block_q,), NEG_INF, dtype=jnp.float32),
        jnp.zeros((block_q,), dtype=jnp.float32),
    )
    acc, _, l = jax.lax.fori_loop(0, n_blocks, body, init)
    safe_l = jnp.where(l > 0, l, 1.0)
    o_ref[...] = (acc / safe_l[:, None]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_padding_mask: Optional[jnp.ndarray] = None,
    block_q: int = 128,
    block_k: int = 128,
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

    kernel = functools.partial(_flash_kernel, block_k=block_k, kv_len=Sp)
    out = pl.pallas_call(
        kernel,
        grid=(B * H, Lp // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, Dp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, Sp, Dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, Sp, Dp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, 1, Sp), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, Dp), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, Dp), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, maskp)
    return out.reshape(B, H, Lp, Dp)[:, :, :L, :D]
