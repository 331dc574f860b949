"""Transformer building blocks (flax.linen), batch-first.

TPU-native re-design of the reference's attention stack
(mindmap/diffuser_actor/layers.py, multihead_custom_attention.py):

- ``MultiheadAttention``: q/k/v/out projections around the fused attention op
  in ``ops/attention.py``. Rotary codes are applied at full embedding width.
- ``AdaLN``: zero-initialized scale/shift modulation from the diffusion
  timestep embedding (reference layers.py:308-325).
- ``RelativeAttentionLayer``: post-norm residual attention with optional AdaLN
  on the query and rotary relative position codes.
- ``FFWRelative{Cross,Self,SelfCross}AttentionModule``: stacks of
  (attention, feed-forward) pairs; return the per-layer outputs like the
  reference so callers can pick the last.

All modules operate on (B, N, C) tensors; masks are exclusion masks (True =
ignore key), matching the reference convention.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from nvblox_mindmap_tpu.ops.attention import multi_head_attention


class MultiheadAttention(nn.Module):
    """Projected multi-head attention with the reference's variant surface.

    ``slot_competition``, ``gate_attn`` (+ ``k_mem``/``v_mem``/``mem_mask``
    memory gating) and ``return_kv`` mirror the reference's
    MultiheadCustomAttention options (multihead_custom_attention.py:45-68,
    495-551); the reference model never enables them in its shipped configs,
    but they are part of the module contract.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    slot_competition: bool = False
    gate_attn: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        rotary_codes: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        need_weights: bool = True,
        deterministic: bool = True,
        k_mem: Optional[jnp.ndarray] = None,
        v_mem: Optional[jnp.ndarray] = None,
        mem_mask: Optional[jnp.ndarray] = None,
        return_kv: bool = False,
    ):
        dense = lambda name: nn.Dense(
            self.embed_dim, kernel_init=nn.initializers.xavier_uniform(), name=name
        )
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)
        gate_logits = None
        if self.gate_attn:
            # Reference inits the per-head gate with randn (:67-68).
            gate_logits = self.param(
                "gate_attn", nn.initializers.normal(1.0), (self.num_heads,)
            )
        # Under the flash default (models/converter.py inference swap) the
        # kernel cannot materialize weights - drop them, like the reference's
        # MultiheadFlashAttention drop-in.
        from nvblox_mindmap_tpu.ops.attention import get_default_attention_impl

        if get_default_attention_impl() == "flash":
            need_weights = False
        result = multi_head_attention(
            q,
            k,
            v,
            num_heads=self.num_heads,
            key_padding_mask=key_padding_mask,
            rotary_codes=rotary_codes,
            need_weights=need_weights,
            slot_competition=self.slot_competition,
            k_mem=k_mem,
            v_mem=v_mem,
            mem_mask=mem_mask,
            gate_logits=gate_logits,
            return_kv=return_kv,
        )
        if return_kv:
            out, qh, kh, vh = result
            return dense("out_proj")(out), qh, kh, vh
        out, weights = result
        out = dense("out_proj")(out)
        return out, weights


class AdaLN(nn.Module):
    """Adaptive layer modulation; zero-init so it starts as identity."""

    embedding_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """x: (B, N, C); t: (B, C)."""
        mod = nn.Dense(
            2 * self.embedding_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="modulation",
        )(nn.silu(t))
        scale, shift = jnp.split(mod, 2, axis=-1)
        return x * (1 + scale[:, None, :]) + shift[:, None, :]


class FeedforwardLayer(nn.Module):
    embedding_dim: int
    hidden_dim: int
    dropout: float = 0.0
    use_adaln: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        diff_ts: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if diff_ts is not None:
            assert self.use_adaln
            x = AdaLN(self.embedding_dim)(x, diff_ts)
        h = nn.Dense(
            self.hidden_dim, kernel_init=nn.initializers.xavier_uniform(), name="linear1"
        )(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(
            self.embedding_dim, kernel_init=nn.initializers.xavier_uniform(), name="linear2"
        )(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm()(x + h)


class RelativeCrossAttentionLayer(nn.Module):
    """Post-norm residual cross-attention with rotary relative positions."""

    embedding_dim: int
    num_heads: int
    dropout: float = 0.0
    use_adaln: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        value: jnp.ndarray,
        diff_ts: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        value_pos: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if diff_ts is not None:
            assert self.use_adaln
            adaln_query = AdaLN(self.embedding_dim)(query, diff_ts)
        else:
            adaln_query = query
        rotary = None if query_pos is None else (query_pos, value_pos)
        attn_out, weights = MultiheadAttention(
            self.embedding_dim, self.num_heads, self.dropout
        )(
            adaln_query,
            value,
            value,
            rotary_codes=rotary,
            key_padding_mask=key_padding_mask,
            deterministic=deterministic,
        )
        attn_out = nn.Dropout(self.dropout, deterministic=deterministic)(attn_out)
        return nn.LayerNorm()(query + attn_out), weights


class FFWRelativeCrossAttentionModule(nn.Module):
    """num_layers x (cross-attention, feed-forward); returns per-layer outputs."""

    embedding_dim: int
    num_attn_heads: int
    num_layers: int
    dropout: float = 0.0
    use_adaln: bool = True

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        value: jnp.ndarray,
        diff_ts: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        value_pos: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        outputs, all_weights = [], []
        for i in range(self.num_layers):
            query, weights = RelativeCrossAttentionLayer(
                self.embedding_dim,
                self.num_attn_heads,
                self.dropout,
                self.use_adaln,
                name=f"attn_{i}",
            )(
                query,
                value,
                diff_ts,
                query_pos,
                value_pos,
                key_padding_mask,
                deterministic,
            )
            query = FeedforwardLayer(
                self.embedding_dim,
                self.embedding_dim,
                self.dropout,
                self.use_adaln,
                name=f"ffw_{i}",
            )(query, diff_ts, deterministic)
            outputs.append(query)
            all_weights.append(weights)
        return outputs, all_weights


class FFWRelativeSelfAttentionModule(nn.Module):
    """num_layers x (self-attention, feed-forward); returns per-layer outputs."""

    embedding_dim: int
    num_attn_heads: int
    num_layers: int
    dropout: float = 0.0
    use_adaln: bool = True

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        diff_ts: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        outputs = []
        for i in range(self.num_layers):
            query, _ = RelativeCrossAttentionLayer(
                self.embedding_dim,
                self.num_attn_heads,
                self.dropout,
                self.use_adaln,
                name=f"attn_{i}",
            )(
                query,
                query,
                diff_ts,
                query_pos,
                query_pos,
                key_padding_mask,
                deterministic,
            )
            query = FeedforwardLayer(
                self.embedding_dim,
                self.embedding_dim,
                self.dropout,
                self.use_adaln,
                name=f"ffw_{i}",
            )(query, diff_ts, deterministic)
            outputs.append(query)
        return outputs


class FFWRelativeSelfCrossAttentionModule(nn.Module):
    """Self-attention layers with interleaved cross-attention to a context.

    (reference layers.py:476-539) Cross layers sit at evenly spaced indices
    among the self layers; both share the AdaLN timestep conditioning. Used
    by the lang_enhanced diffusion head (context = language features).
    """

    embedding_dim: int
    num_attn_heads: int
    num_self_attn_layers: int
    num_cross_attn_layers: int
    dropout: float = 0.0
    use_adaln: bool = True

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        context: Optional[jnp.ndarray],
        diff_ts: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        context_pos: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        import numpy as np

        cross_inds = np.linspace(
            0, self.num_self_attn_layers, self.num_cross_attn_layers + 1,
            dtype=np.int32,
        ).tolist()
        outputs = []
        for i in range(self.num_self_attn_layers):
            if i in cross_inds and context is not None:
                cur_query_pos = None if context_pos is None else query_pos
                query, _ = RelativeCrossAttentionLayer(
                    self.embedding_dim,
                    self.num_attn_heads,
                    self.dropout,
                    self.use_adaln,
                    name=f"cross_{i}",
                )(
                    query,
                    context,
                    diff_ts,
                    cur_query_pos,
                    context_pos,
                    key_padding_mask,
                    deterministic,
                )
            query, _ = RelativeCrossAttentionLayer(
                self.embedding_dim,
                self.num_attn_heads,
                self.dropout,
                self.use_adaln,
                name=f"self_{i}",
            )(query, query, diff_ts, query_pos, query_pos, None, deterministic)
            query = FeedforwardLayer(
                self.embedding_dim,
                self.embedding_dim,
                self.dropout,
                self.use_adaln,
                name=f"ffw_{i}",
            )(query, diff_ts, deterministic)
            outputs.append(query)
        return outputs


class ParallelAttentionLayer(nn.Module):
    """Cross/self attention between two sequences.

    Supports the configurations the reference actually instantiates
    (vision->language cross attention and trajectory->language attention:
    cross_attention1 only, optional FFN, post-norm).
    """

    d_model: int
    n_heads: int
    dropout: float = 0.0
    self_attention1: bool = False
    cross_attention1: bool = True
    apply_ffn: bool = True

    @nn.compact
    def __call__(
        self,
        seq1: jnp.ndarray,
        seq2: jnp.ndarray,
        seq1_key_padding_mask: Optional[jnp.ndarray] = None,
        seq2_key_padding_mask: Optional[jnp.ndarray] = None,
        seq1_sem_pos: Optional[jnp.ndarray] = None,
        seq2_sem_pos: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        def with_pos(x, pos):
            return x if pos is None else x + pos

        if self.cross_attention1:
            q1 = with_pos(seq1, seq1_sem_pos)
            k2 = with_pos(seq2, seq2_sem_pos)
            attn_out, _ = MultiheadAttention(
                self.d_model, self.n_heads, self.dropout, name="cross_12"
            )(
                q1,
                k2,
                seq2,
                key_padding_mask=seq2_key_padding_mask,
                deterministic=deterministic,
            )
            attn_out = nn.Dropout(self.dropout, deterministic=deterministic)(attn_out)
            seq1 = nn.LayerNorm(name="norm_12")(seq1 + attn_out)

        if self.self_attention1:
            q1 = with_pos(seq1, seq1_sem_pos)
            attn_out, _ = MultiheadAttention(
                self.d_model, self.n_heads, self.dropout, name="sa1"
            )(
                q1,
                q1,
                seq1,
                key_padding_mask=seq1_key_padding_mask,
                deterministic=deterministic,
            )
            attn_out = nn.Dropout(self.dropout, deterministic=deterministic)(attn_out)
            seq1 = nn.LayerNorm(name="norm_1")(seq1 + attn_out)

        if self.apply_ffn and (self.cross_attention1 or self.self_attention1):
            h = nn.Dense(4 * self.d_model, name="ffn_1")(seq1)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = nn.Dense(self.d_model, name="ffn_2")(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            seq1 = nn.LayerNorm(name="norm_122")(seq1 + h)
        return seq1


class ParallelAttention(nn.Module):
    num_layers: int
    d_model: int
    n_heads: int
    dropout: float = 0.0
    self_attention1: bool = False
    cross_attention1: bool = True
    apply_ffn: bool = True

    @nn.compact
    def __call__(
        self,
        seq1: jnp.ndarray,
        seq2: jnp.ndarray,
        seq1_key_padding_mask: Optional[jnp.ndarray] = None,
        seq2_key_padding_mask: Optional[jnp.ndarray] = None,
        seq1_sem_pos: Optional[jnp.ndarray] = None,
        seq2_sem_pos: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        for i in range(self.num_layers):
            seq1 = ParallelAttentionLayer(
                self.d_model,
                self.n_heads,
                self.dropout,
                self.self_attention1,
                self.cross_attention1,
                self.apply_ffn,
                name=f"layer_{i}",
            )(
                seq1,
                seq2,
                seq1_key_padding_mask,
                seq2_key_padding_mask,
                seq1_sem_pos,
                seq2_sem_pos,
                deterministic,
            )
        return seq1
