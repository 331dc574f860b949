"""Denoising transformer head (flax, batch-first).

TPU re-design of the reference DiffusionHead
(mindmap/diffuser_actor/diffusion_head.py):

trajectory tokens -> [+ sinusoidal traj-time PE]
  -> 2x rotary cross-attention to the full context (AdaLN-conditioned)
  -> 4x self-attention over [trajectory || FPS context]
  -> separate 2-layer rotation / position self-attention heads
  -> MLP predictors (rot 6D, pos 3, openness logit, optional head yaw).

The AdaLN signal is sinusoidal(timestep) MLP + flattened gripper-history
embedding. Empty-context samples fall back to an all-active mask with zeroed
features so softmax stays finite (reference diffusion_head.py:277-289) -
expressed here as branchless jnp.where so it stays jit-safe.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from nvblox_mindmap_tpu.models.layers import (
    FFWRelativeCrossAttentionModule,
    FFWRelativeSelfAttentionModule,
    FFWRelativeSelfCrossAttentionModule,
    ParallelAttention,
)
from nvblox_mindmap_tpu.ops.positional import rotary_pe_3d, sinusoidal_pos_emb


class Mlp(nn.Module):
    hidden: int
    out: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.out)(x)


class DiffusionHead(nn.Module):
    embedding_dim: int = 120
    num_attn_heads: int = 8
    use_instruction: bool = False
    lang_enhanced: bool = False
    rotation_dim: int = 6
    nhist: int = 3
    prediction_horizon: int = 1
    ngrippers: int = 1
    predict_head_yaw: bool = False
    diffusion_dropout: float = 0.0
    predictor_dropout: float = 0.0

    def setup(self):
        E = self.embedding_dim
        self.traj_encoder = nn.Dense(E, name="traj_encoder")
        self.time_emb_l1 = nn.Dense(E, name="time_emb_l1")
        self.time_emb_l2 = nn.Dense(E, name="time_emb_l2")
        self.gripper_hist_l1 = nn.Dense(E, name="gripper_hist_l1")
        self.gripper_hist_l2 = nn.Dense(E, name="gripper_hist_l2")

        self.traj_lang_attention = ParallelAttention(
            num_layers=1,
            d_model=E,
            n_heads=self.num_attn_heads,
            dropout=self.diffusion_dropout,
            self_attention1=False,
            cross_attention1=True,
            apply_ffn=False,
        )

        self.cross_attn = FFWRelativeCrossAttentionModule(
            E, self.num_attn_heads, num_layers=2, dropout=self.diffusion_dropout,
            use_adaln=True,
        )
        if self.lang_enhanced:
            # Interleave cross-attention to language (reference
            # diffusion_head.py:94-102, 113-116, 131-135).
            self.self_attn = FFWRelativeSelfCrossAttentionModule(
                E, self.num_attn_heads, num_self_attn_layers=4,
                num_cross_attn_layers=3, dropout=self.diffusion_dropout,
                use_adaln=True,
            )
        else:
            self.self_attn = FFWRelativeSelfAttentionModule(
                E, self.num_attn_heads, num_layers=4,
                dropout=self.diffusion_dropout, use_adaln=True,
            )
        self.rotation_proj = nn.Dense(E, name="rotation_proj")
        if self.lang_enhanced:
            self.rotation_self_attn = FFWRelativeSelfCrossAttentionModule(
                E, self.num_attn_heads, 2, 1, dropout=self.diffusion_dropout,
                use_adaln=True,
            )
        else:
            self.rotation_self_attn = FFWRelativeSelfAttentionModule(
                E, self.num_attn_heads, num_layers=2,
                dropout=self.diffusion_dropout, use_adaln=True,
            )
        self.rotation_predictor = Mlp(E, self.rotation_dim, self.predictor_dropout)
        self.position_proj = nn.Dense(E, name="position_proj")
        if self.lang_enhanced:
            self.position_self_attn = FFWRelativeSelfCrossAttentionModule(
                E, self.num_attn_heads, 2, 1, dropout=self.diffusion_dropout,
                use_adaln=True,
            )
        else:
            self.position_self_attn = FFWRelativeSelfAttentionModule(
                E, self.num_attn_heads, num_layers=2,
                dropout=self.diffusion_dropout, use_adaln=True,
            )
        self.position_predictor = Mlp(E, 3, self.predictor_dropout)
        self.openness_predictor = Mlp(E, 1, self.predictor_dropout)
        if self.predict_head_yaw:
            self.head_yaw_predictor = Mlp(E, 1, self.predictor_dropout)

    def encode_denoising_timestep(
        self, timestep: jnp.ndarray, gripper_history_features: jnp.ndarray
    ) -> jnp.ndarray:
        """(B,) timestep + (B, M, E) history features -> (B, E) AdaLN signal."""
        t = sinusoidal_pos_emb(timestep, self.embedding_dim)
        t = self.time_emb_l2(nn.relu(self.time_emb_l1(t)))
        g = gripper_history_features.reshape(gripper_history_features.shape[0], -1)
        g = self.gripper_hist_l2(nn.relu(self.gripper_hist_l1(g)))
        return t + g

    def __call__(
        self,
        trajectory: jnp.ndarray,
        timestep: jnp.ndarray,
        context_feats: jnp.ndarray,
        context: jnp.ndarray,
        context_mask: jnp.ndarray,
        adaln_gripper_feats: jnp.ndarray,
        fps_feats: jnp.ndarray,
        fps_pos: jnp.ndarray,
        fps_mask: jnp.ndarray,
        instr_feats: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        """Denoise one step.

        Args:
            trajectory: (B, L, G, 9) noisy normalized trajectory.
            timestep: (B,) diffusion step indices.
            context_feats/context/context_mask: full context tokens.
            adaln_gripper_feats: (B, nhist*G, E) gripper-history embedding.
            fps_feats/fps_pos/fps_mask: subsampled context tokens.

        Returns:
            (traj_pred (B, L, G, 10): pos+rot6d+openness logit,
             head_yaw (B, L, 1) or None,
             cross-attn weights (B, L*G, N) averaged over heads & layers' last)
        """
        B, L, G, _ = trajectory.shape
        assert trajectory.shape[-1] == 9
        n_traj = L * G

        traj_feats = self.traj_encoder(trajectory).reshape(B, n_traj, self.embedding_dim)
        traj_time_pos = sinusoidal_pos_emb(
            jnp.arange(n_traj, dtype=jnp.float32), self.embedding_dim
        )[None]
        if self.use_instruction and instr_feats is not None:
            traj_feats = self.traj_lang_attention(
                traj_feats, instr_feats, seq1_sem_pos=traj_time_pos,
                deterministic=deterministic,
            )
        traj_feats = traj_feats + traj_time_pos

        # Branchless empty-sample fallback: all-masked rows become all-active
        # with zeroed features so attention weights stay finite.
        empty = ~jnp.any(context_mask, axis=-1)
        context_mask = jnp.where(empty[:, None], True, context_mask)
        context_feats = jnp.where(empty[:, None, None], 0.0, context_feats)
        empty_fps = ~jnp.any(fps_mask, axis=-1)
        fps_mask = jnp.where(empty_fps[:, None], True, fps_mask)
        fps_feats = jnp.where(empty_fps[:, None, None], 0.0, fps_feats)

        time_embs = self.encode_denoising_timestep(timestep, adaln_gripper_feats)

        traj_xyz = trajectory[..., :3].reshape(B, n_traj, 3)
        rel_gripper_pos = rotary_pe_3d(traj_xyz, self.embedding_dim)
        rel_context_pos = rotary_pe_3d(context, self.embedding_dim)

        outputs, all_weights = self.cross_attn(
            traj_feats,
            context_feats,
            diff_ts=time_embs,
            query_pos=rel_gripper_pos,
            value_pos=rel_context_pos,
            key_padding_mask=~context_mask,
            deterministic=deterministic,
        )
        gripper_features = outputs[-1]

        features = jnp.concatenate([gripper_features, fps_feats], axis=1)
        rel_pos = jnp.concatenate([rel_gripper_pos, fps_pos], axis=1)
        combined_mask = jnp.concatenate(
            [jnp.zeros((B, n_traj), dtype=bool), ~fps_mask], axis=1
        )
        if self.lang_enhanced:
            features = self.self_attn(
                features,
                instr_feats,
                diff_ts=time_embs,
                query_pos=rel_pos,
                deterministic=deterministic,
            )[-1]
        else:
            features = self.self_attn(
                features,
                diff_ts=time_embs,
                query_pos=rel_pos,
                key_padding_mask=combined_mask,
                deterministic=deterministic,
            )[-1]

        if self.lang_enhanced:
            rot_feats = self.rotation_self_attn(
                features, instr_feats, diff_ts=time_embs, query_pos=rel_pos,
                deterministic=deterministic,
            )[-1][:, :n_traj]
        else:
            rot_feats = self.rotation_self_attn(
                features, diff_ts=time_embs, query_pos=rel_pos,
                key_padding_mask=combined_mask, deterministic=deterministic,
            )[-1][:, :n_traj]
        rotation = self.rotation_predictor(
            self.rotation_proj(rot_feats), deterministic
        )

        if self.lang_enhanced:
            pos_feats = self.position_self_attn(
                features, instr_feats, diff_ts=time_embs, query_pos=rel_pos,
                deterministic=deterministic,
            )[-1][:, :n_traj]
        else:
            pos_feats = self.position_self_attn(
                features, diff_ts=time_embs, query_pos=rel_pos,
                key_padding_mask=combined_mask, deterministic=deterministic,
            )[-1][:, :n_traj]
        pos_feats = self.position_proj(pos_feats)
        position = self.position_predictor(pos_feats, deterministic)
        openness = self.openness_predictor(pos_feats, deterministic)

        head_yaw = None
        if self.predict_head_yaw:
            multi_gripper = pos_feats.reshape(B, L, G * self.embedding_dim)
            head_yaw = self.head_yaw_predictor(multi_gripper, deterministic)

        traj_pred = jnp.concatenate([position, rotation, openness], axis=-1)
        traj_pred = traj_pred.reshape(B, L, G, 10)

        # Last cross-attn layer's weights averaged over heads: (B, n_traj, N).
        # None under the flash-attention inference swap (the kernel does not
        # materialize weights, matching the reference's flash drop-in).
        cross_attn_weights = (
            None if all_weights[-1] is None else jnp.mean(all_weights[-1], axis=1)
        )
        return traj_pred, head_yaw, cross_attn_weights
