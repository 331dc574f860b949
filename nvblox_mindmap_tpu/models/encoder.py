"""Context encoder for the DiffuserActor policy (flax, batch-first).

TPU re-design of the reference Encoder (mindmap/diffuser_actor/encoder.py):

- ``encode_images``   : frozen backbone features -> linear embed -> bilinear
                        position resample -> AND-pooled validity mask.
- ``encode_feature_pointcloud``: mesh vertex features (e.g. 768-d RADIO)
                        linearly embedded to the model dim.
- ``encode_gripper_history``: openness-conditioned learnable queries
                        cross-attending (3 rotary layers) to the full context.
- ``run_fps``         : feature-space farthest point sampling (JAX op replaces
                        the DGL CUDA kernel).
- ``encode_instruction`` + ``vision_language_attention`` for language.

All tensors channel-last / batch-first; positions stay fp32 for the rotary
codes while feature matmuls may run bf16.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from nvblox_mindmap_tpu.models.feature_extractors import (
    FeatureExtractorType,
    get_feature_dim,
    make_feature_extractor,
)
from nvblox_mindmap_tpu.models.layers import (
    FFWRelativeCrossAttentionModule,
    ParallelAttention,
)
from nvblox_mindmap_tpu.ops.fps import farthest_point_sampling, gather_points
from nvblox_mindmap_tpu.ops.masks import downscale_mask
from nvblox_mindmap_tpu.ops.positional import rotary_pe_3d


class Encoder(nn.Module):
    embedding_dim: int = 120
    nhist: int = 3
    ngrippers: int = 1
    num_attn_heads: int = 8
    num_vis_ins_attn_layers: int = 2
    fps_subsampling_factor: int = 5
    data_type: str = "rgbd"  # "rgbd" | "mesh" | "rgbd_and_mesh"
    encode_openness: bool = True
    feature_type: FeatureExtractorType = FeatureExtractorType.RGB
    feature_image_size: Tuple[int, int] = (32, 32)
    feature_num_prefix_tokens: Optional[int] = None
    use_shared_feature_encoder: bool = False
    dropout: float = 0.0
    # Run the FROZEN backbone forward over (B*ncam) images in chunks of this
    # many images via nn.scan (params broadcast, so the checkpoint tree is
    # unchanged). The backbone's backward pass is pruned by stop_gradient
    # (feature_extractors.py freeze_backbone), so chunking cuts its live
    # activation peak ~linearly with zero recompute cost — what lets the
    # flagship rgbd train step fit batch 64+ in one chip's 16 GB HBM
    # (unchunked b64 exceeds it). None = single full-width forward.
    backbone_chunk_images: Optional[int] = None

    def setup(self):
        uses_rgb = self.data_type in ("rgbd", "rgbd_and_mesh")
        uses_mesh = self.data_type in ("mesh", "rgbd_and_mesh")
        feature_dim = get_feature_dim(self.feature_type)

        if uses_rgb:
            self.feature_extractor = make_feature_extractor(
                self.feature_type,
                self.feature_image_size,
                num_prefix_tokens=self.feature_num_prefix_tokens,
            )
            self.image_feature_encoder = nn.Dense(
                self.embedding_dim, name="image_feature_encoder"
            )
        if uses_mesh and not self.use_shared_feature_encoder:
            self.reconstruction_encoder = nn.Dense(
                self.embedding_dim, name="reconstruction_encoder"
            )

        n_queries = self.nhist * self.ngrippers
        if self.encode_openness:
            # A linear map of the binary open/close vector: equivalent to two
            # learnable queries per slot (open / closed).
            self.curr_open_close_encoder = nn.Dense(
                n_queries * self.embedding_dim, name="curr_open_close_encoder"
            )
        else:
            self.gripper_history_embed = self.param(
                "gripper_history_embed",
                nn.initializers.normal(1.0),
                (n_queries, self.embedding_dim),
            )
        self.gripper_context_head = FFWRelativeCrossAttentionModule(
            self.embedding_dim,
            self.num_attn_heads,
            num_layers=3,
            dropout=self.dropout,
            use_adaln=False,
        )
        self.goal_gripper_embed = self.param(
            "goal_gripper_embed", nn.initializers.normal(1.0), (1, self.embedding_dim)
        )
        self.instruction_encoder = nn.Dense(self.embedding_dim, name="instruction_encoder")
        self.vl_attention = ParallelAttention(
            num_layers=self.num_vis_ins_attn_layers,
            d_model=self.embedding_dim,
            n_heads=self.num_attn_heads,
            dropout=self.dropout,
            self_attention1=False,
            cross_attention1=True,
        )

    def relative_pe(self, xyz: jnp.ndarray) -> jnp.ndarray:
        """Rotary 3D code for (B, N, 3) positions -> (B, N, F, 2)."""
        return rotary_pe_3d(xyz, self.embedding_dim)

    def encode_images(
        self,
        rgb: jnp.ndarray,
        positions: jnp.ndarray,
        valid_mask: Optional[jnp.ndarray] = None,
    ):
        """Image observations to context tokens.

        Args:
            rgb: (B, ncam, H, W, 3) in [0, 1].
            positions: (B, ncam, H, W, 3) world points.
            valid_mask: optional (B, ncam, H, W) bool.

        Returns:
            feats (B, ncam*h*w, E), positions (B, ncam*h*w, 3),
            mask (B, ncam*h*w) or None.
        """
        B, ncam, H, W, _ = rgb.shape
        flat_rgb = rgb.reshape(B * ncam, H, W, 3)
        chunk = self.backbone_chunk_images
        if chunk and B * ncam > chunk and (B * ncam) % chunk == 0:
            # Sequential chunks over the frozen backbone: scan's per-step
            # buffers hold one chunk's ViT activations instead of all
            # B*ncam images' at once. variable_broadcast keeps the params
            # out of the scan carry (and the param tree identical to the
            # unchunked module, so checkpoints interchange freely).
            chunked = flat_rgb.reshape(
                (B * ncam) // chunk, chunk, H, W, 3
            )
            scan_extract = nn.scan(
                lambda mdl, carry, x: (carry, mdl(x)),
                variable_broadcast="params",
                split_rngs={"params": False},
            )
            _, feats = scan_extract(self.feature_extractor, None, chunked)
            feats = feats.reshape((B * ncam,) + feats.shape[2:])
        else:
            feats = self.feature_extractor(flat_rgb)  # (B*ncam, h, w, C)
        h, w = feats.shape[1:3]
        feats = self.image_feature_encoder(feats)

        import jax

        pos = jax.image.resize(
            positions.reshape(B * ncam, H, W, 3),
            (B * ncam, h, w, 3),
            method="bilinear",
        )
        feats = feats.reshape(B, ncam * h * w, self.embedding_dim)
        pos = pos.reshape(B, ncam * h * w, 3)
        mask = None
        if valid_mask is not None:
            assert h == w and H % h == 0
            mask = downscale_mask(valid_mask, H // h).reshape(B, ncam * h * w)
        return feats, pos, mask

    def encode_feature_pointcloud(self, features: jnp.ndarray, points: jnp.ndarray):
        """Mesh vertex features (B, N, C) + vertices (B, N, 3) -> embedded tokens."""
        if self.use_shared_feature_encoder:
            encoder = self.image_feature_encoder
        else:
            encoder = self.reconstruction_encoder
        # fp16 features from the feed upcast here (device-side).
        return encoder(features.astype(jnp.float32)), points

    def encode_gripper_history(
        self,
        gripper_history: jnp.ndarray,
        context_feats: jnp.ndarray,
        context: jnp.ndarray,
        curr_closedness: jnp.ndarray,
        deterministic: bool = True,
    ):
        """Gripper-history queries cross-attend to the scene context.

        Args:
            gripper_history: (B, nhist, ngrippers, >=3) poses.
            context_feats: (B, N, E); context: (B, N, 3).
            curr_closedness: (B, nhist, ngrippers, 1).

        Returns:
            (feats (B, nhist*ngrippers, E), pos code, last-layer weights).
        """
        B = gripper_history.shape[0]
        n_queries = self.nhist * self.ngrippers
        if self.encode_openness:
            closed = curr_closedness.reshape(B, n_queries)
            queries = self.curr_open_close_encoder(closed).reshape(
                B, n_queries, self.embedding_dim
            )
        else:
            queries = jnp.broadcast_to(
                self.gripper_history_embed[None],
                (B, n_queries, self.embedding_dim),
            )

        gripper_xyz = gripper_history[..., :3].reshape(B, n_queries, 3)
        gripper_pos = self.relative_pe(gripper_xyz)
        context_pos = self.relative_pe(context)
        outputs, weights = self.gripper_context_head(
            queries,
            context_feats,
            query_pos=gripper_pos,
            value_pos=context_pos,
            deterministic=deterministic,
        )
        return outputs[-1], gripper_pos, weights[-1]

    def encode_goal_gripper(
        self,
        goal_gripper: jnp.ndarray,
        context_feats: jnp.ndarray,
        context: jnp.ndarray,
        deterministic: bool = True,
    ):
        """Goal-gripper query cross-attends to the context.

        Args:
            goal_gripper: (B, >=3) goal pose (xyz used for the rotary code).

        Returns:
            (feats (B, 1, E), pos code (B, 1, E, 2)).
        """
        B = goal_gripper.shape[0]
        queries = jnp.broadcast_to(
            self.goal_gripper_embed[None], (B, 1, self.embedding_dim)
        )
        goal_pos = self.relative_pe(goal_gripper[:, None, :3])
        context_pos = self.relative_pe(context)
        outputs, _ = self.gripper_context_head(
            queries,
            context_feats,
            query_pos=goal_pos,
            value_pos=context_pos,
            deterministic=deterministic,
        )
        return outputs[-1], goal_pos

    def encode_instruction(self, instruction: jnp.ndarray):
        """(B, T, 512) CLIP text features -> (B, T, E) + zero rotary code."""
        instr_feats = self.instruction_encoder(instruction)
        dummy_pos = self.relative_pe(
            jnp.zeros(instruction.shape[:2] + (3,), dtype=jnp.float32)
        )
        return instr_feats, dummy_pos

    def vision_language_attention(self, feats, instr_feats, deterministic=True):
        return self.vl_attention(feats, instr_feats, deterministic=deterministic)

    def run_fps(
        self,
        context_features: jnp.ndarray,
        context_pos: jnp.ndarray,
        context_valid_mask: jnp.ndarray,
    ):
        """Feature-space FPS subsampling with zeroed-invalid semantics.

        Invalid tokens are zeroed (not removed - shapes stay static); the
        returned mask marks samples that landed on non-zero features.
        (reference: encoder.py:338-406)
        """
        B, N, C = context_features.shape
        masked = jnp.where(context_valid_mask[..., None], context_features, 0.0)
        k = max(N // self.fps_subsampling_factor, 1)
        idx = farthest_point_sampling(masked, k, start_idx=0)
        sampled_feats = gather_points(masked, idx)
        sampled_pos = gather_points(context_pos, idx)
        sampled_valid = jnp.any(sampled_feats != 0, axis=-1)
        return sampled_feats, sampled_pos, sampled_valid
