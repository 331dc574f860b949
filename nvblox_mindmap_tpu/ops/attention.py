"""Fused multi-head attention for TPU.

Functional core used by all model layers. Batch-first layout (B, L, E); heads
are split after the rotary rotation is applied to the *full* embedding vector,
matching the reference semantics where the rotary 3D code spans F (= 3 bands of
F//3) rather than per-head dims (reference:
mindmap/diffuser_actor/multihead_custom_attention.py:420-431).

Design notes (TPU):
- One einsum for scores, one for the value contraction; XLA fuses the scale,
  mask add and softmax into the surrounding matmuls. For the context sizes of
  this model (<= ~4k tokens, E=120) this saturates the MXU without a custom
  kernel; a Pallas flash-attention path is provided in ``flash_attention.py``
  for long contexts.
- ``key_padding_mask`` is an exclusion mask: True = masked out (reference
  convention). Masked logits get a large negative instead of -inf so fully
  masked rows produce uniform weights rather than NaN.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9

# Process-wide default attention implementation ("xla" or "flash"), resolved
# at TRACE time when a call site passes impl=None. This is the hook the
# inference converter uses (models/converter.py, mirroring the reference's
# module-surgery custom->flash swap): set it BEFORE the first call of a
# jitted function - already-compiled programs keep the impl they were traced
# with.
_DEFAULT_IMPL = "xla"


def set_default_attention_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    if impl not in ("xla", "flash"):
        raise ValueError(f"Unknown attention impl {impl!r}; 'xla' or 'flash'")
    _DEFAULT_IMPL = impl


def get_default_attention_impl() -> str:
    return _DEFAULT_IMPL


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,
    rotary_codes: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    need_weights: bool = True,
    impl: Optional[str] = None,
    slot_competition: bool = False,
    k_mem: Optional[jnp.ndarray] = None,
    v_mem: Optional[jnp.ndarray] = None,
    mem_mask: Optional[jnp.ndarray] = None,
    gate_logits: Optional[jnp.ndarray] = None,
    return_kv: bool = False,
):
    """Scaled dot-product attention over projected q/k/v.

    Args:
        q: (B, L, E) projected queries.
        k: (B, S, E) projected keys.
        v: (B, S, E) projected values.
        num_heads: number of attention heads (E % num_heads == 0).
        key_padding_mask: optional (B, S) bool; True = exclude that key.
        rotary_codes: optional (q_code, k_code), each (B, L/S, E, 2) from
            ``rotary_pe_3d``; applied to q and k at full embedding width.
        need_weights: also return per-head attention weights (B, H, L, S).
        slot_competition: slot-attention-style normalization - softmax over
            the *query* axis (+1e-8) then renormalize over keys (reference:
            multihead_custom_attention.py:495-497).
        k_mem / v_mem: optional (B, S_mem, E) projected memory keys/values
            for memorizing-transformers gating (reference :507-545; the
            reference takes (B, E, S_mem) and permutes - we take batch-first).
        mem_mask: optional (B, S_mem) float/bool *multiplicative* weight mask
            on the memory attention (reference :520-528).
        gate_logits: (num_heads,) learnable gate; output becomes
            sigmoid(gate)*mem_attn + (1-sigmoid(gate))*attn per head.
        return_kv: additionally return the post-rotary per-head q, k, v
            (reference :550-551). Returns (out, q, k, v) in that case.

    Returns:
        (attn_out (B, L, E), weights or None), or (out, q, k, v) when
        ``return_kv`` (each (B, T, H, head_dim)).
    """
    if impl is None:
        impl = _DEFAULT_IMPL
    B, L, E = q.shape
    S = k.shape[1]
    assert E % num_heads == 0
    head_dim = E // num_heads
    scaling = head_dim**-0.5

    q = q * scaling
    if rotary_codes is not None:
        from nvblox_mindmap_tpu.ops.positional import apply_rotary_code

        q_code, k_code = rotary_codes
        q = apply_rotary_code(q, q_code)
        k = apply_rotary_code(k, k_code)

    qh = q.reshape(B, L, num_heads, head_dim)
    kh = k.reshape(B, S, num_heads, head_dim)
    vh = v.reshape(B, S, num_heads, head_dim)

    has_memory = gate_logits is not None and k_mem is not None and v_mem is not None
    if (k_mem is not None or v_mem is not None) and not has_memory:
        raise ValueError(
            "k_mem/v_mem require gate_logits (module: gate_attn=True) and "
            "both tensors - memory would otherwise be silently ignored"
        )
    if (
        impl == "flash"
        and not need_weights
        and not slot_competition
        and not has_memory
        and not return_kv
    ):
        from nvblox_mindmap_tpu.ops import flash_attention as fa

        inclusion = None if key_padding_mask is None else ~key_padding_mask
        out = fa.flash_attention(
            qh.transpose(0, 2, 1, 3),
            kh.transpose(0, 2, 1, 3),
            vh.transpose(0, 2, 1, 3),
            key_padding_mask=inclusion,
            # Mosaic kernels are TPU-only; fall back to the Pallas
            # interpreter on other backends (tests, CPU dry runs).
            interpret=jax.default_backend() != "tpu",
        )
        return out.transpose(0, 2, 1, 3).reshape(B, L, E), None

    logits = jnp.einsum("blhd,bshd->bhls", qh, kh)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, logits)
    if slot_competition:
        # Slots compete for keys: normalize over queries first, then make
        # each query's weights sum to one over keys.
        weights = jax.nn.softmax(logits, axis=-2) + 1e-8
        if key_padding_mask is not None:
            # A fully -1e9 key *column* still softmaxes to uniform over the
            # query axis (the reference NaNs here); zero masked keys before
            # the key-axis renormalization so padding cannot leak.
            weights = jnp.where(
                key_padding_mask[:, None, None, :], 0.0, weights
            )
        weights = weights / jnp.maximum(
            jnp.sum(weights, axis=-1, keepdims=True), 1e-20
        )
    else:
        weights = jax.nn.softmax(logits, axis=-1)
    outh = jnp.einsum("bhls,bshd->blhd", weights, vh)

    if has_memory:
        kmh = k_mem.reshape(B, -1, num_heads, head_dim)
        vmh = v_mem.reshape(B, -1, num_heads, head_dim)
        mem_w = jax.nn.softmax(jnp.einsum("blhd,bshd->bhls", qh, kmh), axis=-1)
        if mem_mask is not None:
            mem_w = mem_w * mem_mask[:, None, None, :].astype(mem_w.dtype)
        mem_out = jnp.einsum("bhls,bshd->blhd", mem_w, vmh)
        gate = jax.nn.sigmoid(gate_logits).reshape(1, 1, num_heads, 1)
        outh = gate * mem_out + (1.0 - gate) * outh

    out = outh.reshape(B, L, E)
    if return_kv:
        return out, qh, kh, vh
    return out, (weights if need_weights else None)
