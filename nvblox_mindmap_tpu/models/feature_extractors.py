"""Vision feature extractors as fused XLA graphs (flax).

Mirrors the reference registry (mindmap/image_processing/feature_extraction.py):

- ``RGB``             : passthrough, bilinear resize to the feature size (3-d).
- ``RADIO_V25_B``     : ViT-B/16-style backbone, 768-d patch features.
- ``DINO_V2_VITS14``  : ViT-S/14, 384-d patch features.
- ``CLIP_RESNET50_FPN``: ModifiedResNet-50 + FPN, 120-d (the only trainable
  extractor when no FPN checkpoint is given).

All extractors consume channel-last RGB in [0, 1] of shape (B, H, W, 3) and
emit (B, h, w, C) feature images. The ViT backbones share one flax
implementation; pretrained weights can be converted from the torch checkpoints
with ``convert_torch_vit_weights`` (the architecture matches 1:1).
"""
from __future__ import annotations

import enum
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FeatureExtractorType(str, enum.Enum):
    CLIP_RESNET50_FPN = "clip_resnet50_fpn"
    RADIO_V25_B = "radio_v25_b"
    DINO_V2_VITS14 = "dino_v2_vits14"
    RGB = "rgb"


FEATURE_DIMS = {
    FeatureExtractorType.CLIP_RESNET50_FPN: 120,
    FeatureExtractorType.RADIO_V25_B: 768,
    FeatureExtractorType.DINO_V2_VITS14: 384,
    FeatureExtractorType.RGB: 3,
}

# Per-extractor input normalization (mean, std); RGB/RADIO use identity.
_IMAGENET = ([0.485, 0.456, 0.406], [0.229, 0.224, 0.225])
_WIT = ([0.48145466, 0.4578275, 0.40821073], [0.26862954, 0.26130258, 0.27577711])
_IDENTITY = ([0.0, 0.0, 0.0], [1.0, 1.0, 1.0])

NORMALIZATION = {
    FeatureExtractorType.CLIP_RESNET50_FPN: _WIT,
    FeatureExtractorType.RADIO_V25_B: _IDENTITY,
    FeatureExtractorType.DINO_V2_VITS14: _IMAGENET,
    FeatureExtractorType.RGB: _IDENTITY,
}


# Default CLS/register token counts of the pretrained hub checkpoints (both
# RADIO and DINOv2 run a CLS token through attention; converted checkpoints
# carrying a different count override this via their 'prefix_tokens' shape).
DEFAULT_PREFIX_TOKENS = {
    FeatureExtractorType.RADIO_V25_B: 1,
    FeatureExtractorType.DINO_V2_VITS14: 1,
}


def get_feature_dim(t: FeatureExtractorType) -> int:
    return FEATURE_DIMS[t]


def _resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Channel-last bilinear resize (half-pixel centers = align_corners=False)."""
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, size[0], size[1], C), method="bilinear")


class RgbFeatureExtractor(nn.Module):
    """Passthrough extractor: scaled RGB is the feature."""

    feature_image_size: Tuple[int, int] = (32, 32)

    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:
        return _resize_bilinear(rgb, self.feature_image_size)


class VitFeatureExtractor(nn.Module):
    """Patch-token ViT backbone returning a (B, h, w, C) feature image.

    Covers RADIO v2.5-b (patch 16, 768-d, 12 layers) and DINOv2 ViT-S/14
    (patch 14, 384-d, 12 layers). Runs in bfloat16 on the MXU; layernorms in
    fp32.
    """

    patch_size: int
    width: int
    depth: int
    num_heads: int
    feature_image_size: Tuple[int, int] = (32, 32)
    mean_std: Tuple = _IDENTITY
    mlp_ratio: float = 4.0
    # CLS / register tokens. The pretrained hub models (RADIO, DINOv2) run
    # these through attention alongside the patches; they must be present for
    # converted weights to reproduce the original patch features. Token values
    # arrive pre-pos-embedded from the converter; they are dropped from the
    # output (the policy consumes patch features only, reference
    # RadioFeatureExtractorBase._extract_features_impl).
    num_prefix_tokens: int = 0
    # DINOv2 checkpoints carry trained per-block LayerScale gammas
    # (ls1/ls2, init_values=1.0 in the hub models); without them converted
    # weights silently scale every residual branch by 1 instead of the
    # trained value. RADIO/timm ViTs have no layer scale.
    use_layer_scale: bool = False
    # The reference runs every pretrained backbone under torch.no_grad()
    # (feature_extraction.py freezes all extractor weights); the XLA
    # equivalent is stop_gradient on the output, which prunes the entire
    # backward ViT pass (and its activation residency) from the compiled
    # train step at trace time — the optimizer's trainable_mask alone would
    # still pay for computing the discarded gradients.
    freeze_backbone: bool = True

    @nn.compact
    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.mean_std[0])
        std = jnp.asarray(self.mean_std[1])
        x = (rgb - mean) / std
        # Size the input so the patch grid equals the requested feature size.
        in_size = (
            self.feature_image_size[0] * self.patch_size,
            self.feature_image_size[1] * self.patch_size,
        )
        x = _resize_bilinear(x, in_size).astype(jnp.bfloat16)

        x = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            name="patch_embed",
            dtype=jnp.bfloat16,
        )(x)
        B, h, w, C = x.shape
        x = x.reshape(B, h * w, C)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, h * w, self.width)
        )
        x = x + pos.astype(x.dtype)

        if self.num_prefix_tokens > 0:
            prefix = self.param(
                "prefix_tokens",
                nn.initializers.normal(0.02),
                (1, self.num_prefix_tokens, self.width),
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(prefix.astype(x.dtype),
                                  (B, self.num_prefix_tokens, C)), x],
                axis=1,
            )

        def layer_scale(y, name):
            if not self.use_layer_scale:
                return y
            gamma = self.param(name, nn.initializers.ones, (self.width,))
            return y * gamma.astype(y.dtype)

        for i in range(self.depth):
            y = nn.LayerNorm(dtype=jnp.float32, name=f"ln1_{i}")(x).astype(jnp.bfloat16)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=jnp.bfloat16, name=f"attn_{i}"
            )(y, y)
            x = x + layer_scale(y, f"ls1_{i}")
            y = nn.LayerNorm(dtype=jnp.float32, name=f"ln2_{i}")(x).astype(jnp.bfloat16)
            y = nn.Dense(int(self.width * self.mlp_ratio), dtype=jnp.bfloat16,
                         name=f"mlp1_{i}")(y)
            # Exact (erf) GELU: the torch checkpoints were trained with
            # nn.GELU default, not the tanh approximation.
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(self.width, dtype=jnp.bfloat16, name=f"mlp2_{i}")(y)
            x = x + layer_scale(y, f"ls2_{i}")

        x = nn.LayerNorm(dtype=jnp.float32, name="ln_final")(x)
        if self.num_prefix_tokens > 0:
            x = x[:, self.num_prefix_tokens:, :]
        x = x.reshape(B, h, w, self.width).astype(jnp.float32)
        if self.freeze_backbone:
            x = jax.lax.stop_gradient(x)
        return x


def make_feature_extractor(
    t: FeatureExtractorType,
    feature_image_size: Tuple[int, int] = (32, 32),
    fpn_trainable: bool = True,
    mean_std: Optional[Tuple] = None,
    num_prefix_tokens: Optional[int] = None,
) -> nn.Module:
    """Instantiate the extractor module for a registry type.

    ``mean_std`` overrides the registry input normalization - converted
    checkpoints that carry their own conditioner stats (e.g. RADIO's
    input_conditioner) pass them through here. ``num_prefix_tokens``
    overrides the hub default CLS/register token count.
    """
    if t == FeatureExtractorType.RGB:
        return RgbFeatureExtractor(feature_image_size=feature_image_size)
    if num_prefix_tokens is None:
        num_prefix_tokens = DEFAULT_PREFIX_TOKENS.get(t, 0)
    if t == FeatureExtractorType.RADIO_V25_B:
        return VitFeatureExtractor(
            patch_size=16,
            width=768,
            depth=12,
            num_heads=12,
            feature_image_size=feature_image_size,
            mean_std=mean_std or NORMALIZATION[t],
            num_prefix_tokens=num_prefix_tokens,
        )
    if t == FeatureExtractorType.DINO_V2_VITS14:
        return VitFeatureExtractor(
            patch_size=14,
            width=384,
            depth=12,
            num_heads=6,
            feature_image_size=feature_image_size,
            mean_std=mean_std or NORMALIZATION[t],
            num_prefix_tokens=num_prefix_tokens,
            use_layer_scale=True,  # DINOv2 hub blocks carry ls1/ls2 gammas
        )
    if t == FeatureExtractorType.CLIP_RESNET50_FPN:
        from nvblox_mindmap_tpu.models.clip_resnet_fpn import ClipResNet50Fpn

        return ClipResNet50Fpn(feature_image_size=feature_image_size)
    raise ValueError(f"Unknown feature extractor type: {t}")
