"""CLIP ModifiedResNet-50 backbone + Feature Pyramid Network (flax).

Re-implements the reference's CLIP_RESNET50_FPN extractor
(mindmap/image_processing/feature_extraction.py:373-503):

- CLIP's ModifiedResNet: 3-conv stem, blur-style anti-aliased downsampling
  (average-pool before strided projection), 4 bottleneck stages.
- torchvision-style FPN over the 5 taps [stem, layer1..layer4] with 120-d
  output channels; the "res3" level (stride 8) is the feature image, so a
  256x256 input yields 32x32 features.

The backbone is frozen in the reference; here freezing is handled by the
optimizer mask (see training/trainer.py). Weight conversion from the torch
CLIP checkpoint maps 1:1 onto these module names.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with running statistics stored as (frozen) params.

    The CLIP trunk is frozen in the reference (feature_extraction.py:434-442:
    requires_grad=False everywhere but the FPN), so its batch statistics never
    update. Keeping mean/var in the ``params`` collection (masked out by the
    frozen-extractor optimizer mask like every other backbone param) means the
    whole model lives in one collection: checkpoints stay self-contained and
    the train step needs no mutable-collection plumbing.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


class Bottleneck(nn.Module):
    """CLIP anti-aliased bottleneck (expansion 4)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        norm = lambda name: FrozenBatchNorm(name=name)
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(norm("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(out)
        out = nn.relu(norm("bn2")(out))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride), (self.stride, self.stride))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = norm("bn3")(out)

        identity = x
        if self.stride > 1 or x.shape[-1] != self.planes * 4:
            identity = nn.avg_pool(
                x, (self.stride, self.stride), (self.stride, self.stride)
            ) if self.stride > 1 else x
            identity = nn.Conv(
                self.planes * 4, (1, 1), use_bias=False, name="downsample_conv"
            )(identity)
            identity = norm("downsample_bn")(identity)
        return nn.relu(out + identity)


class ModifiedResNetFeatures(nn.Module):
    """CLIP ModifiedResNet-50 emitting the 5 intermediate feature maps."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        norm = lambda name: FrozenBatchNorm(name=name)
        # 3-conv stem at stride 2.
        x = nn.Conv(self.width // 2, (3, 3), strides=2, padding=1, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(norm("bn1")(x))
        x = nn.Conv(self.width // 2, (3, 3), padding=1, use_bias=False, name="conv2")(x)
        x = nn.relu(norm("bn2")(x))
        x = nn.Conv(self.width, (3, 3), padding=1, use_bias=False, name="conv3")(x)
        x0 = nn.relu(norm("bn3")(x))
        x = nn.avg_pool(x0, (2, 2), (2, 2))

        feats = [x0]
        planes = self.width
        for stage, blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                x = Bottleneck(
                    planes, stride if b == 0 else 1, name=f"layer{stage + 1}_{b}"
                )(x)
            feats.append(x)
            planes *= 2
        return feats  # [res1(64), res2(256), res3(512), res4(1024), res5(2048)]


class FeaturePyramidNetwork(nn.Module):
    """torchvision-style FPN: lateral 1x1 + top-down nearest upsample + 3x3 out."""

    out_channels: int = 120

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"inner_{i}")(f)
            for i, f in enumerate(feats)
        ]
        results = [None] * len(laterals)
        last = laterals[-1]
        results[-1] = nn.Conv(self.out_channels, (3, 3), padding=1,
                              name=f"layer_{len(laterals) - 1}")(last)
        for i in range(len(laterals) - 2, -1, -1):
            B, H, W, C = laterals[i].shape
            upsampled = jax.image.resize(last, (B, H, W, C), method="nearest")
            last = laterals[i] + upsampled
            results[i] = nn.Conv(self.out_channels, (3, 3), padding=1,
                                 name=f"layer_{i}")(last)
        return results


class ClipResNet50Fpn(nn.Module):
    """Full extractor: backbone taps -> FPN -> res3 (stride-8) feature image."""

    feature_image_size: Tuple[int, int] = (32, 32)
    out_channels: int = 120
    # Reference semantics: the CLIP trunk is always frozen (torch.no_grad()
    # in feature_extraction.py) while the FPN trains when no pretrained FPN
    # checkpoint is given. stop_gradient at the trunk/FPN boundary prunes
    # the ResNet backward pass from the compiled train step; the optimizer's
    # trainable_mask (training/optimizer.py:frozen_feature_extractor_mask)
    # keeps masking updates as belt-and-suspenders.
    freeze_backbone: bool = True

    @nn.compact
    def __call__(self, rgb: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
        x = (rgb - mean) / std
        # res3 is stride 8 => input must be 8x the feature size.
        in_size = (self.feature_image_size[0] * 8, self.feature_image_size[1] * 8)
        B, _, _, C = x.shape
        x = jax.image.resize(x, (B, in_size[0], in_size[1], C), method="bilinear")
        feats = ModifiedResNetFeatures(name="backbone")(x)
        if self.freeze_backbone:
            feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
        fpn_out = FeaturePyramidNetwork(self.out_channels, name="fpn")(feats)
        return fpn_out[2]  # res3
