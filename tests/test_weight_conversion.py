"""Torch->flax ViT weight conversion: numerical cross-check against torch."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from nvblox_mindmap_tpu.models.feature_extractors import VitFeatureExtractor
from nvblox_mindmap_tpu.models.weight_conversion import (
    convert_torch_vit_weights,
    interpolate_pos_embed,
)

WIDTH, HEADS, DEPTH, PATCH = 16, 2, 2, 4
GRID = 4  # 16x16 input / patch 4


class TorchBlock(torch.nn.Module):
    """timm-style pre-norm transformer block with fused qkv."""

    def __init__(self):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(WIDTH)
        self.qkv = torch.nn.Linear(WIDTH, 3 * WIDTH)
        self.proj = torch.nn.Linear(WIDTH, WIDTH)
        self.norm2 = torch.nn.LayerNorm(WIDTH)
        self.fc1 = torch.nn.Linear(WIDTH, 4 * WIDTH)
        self.fc2 = torch.nn.Linear(4 * WIDTH, WIDTH)

    def forward(self, x):
        B, N, E = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(B, N, 3, HEADS, E // HEADS)
        q, k, v = qkv.unbind(2)
        attn = torch.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(E // HEADS)
        attn = attn.softmax(-1)
        h = torch.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, E)
        x = x + self.proj(h)
        h = self.norm2(x)
        x = x + self.fc2(torch.nn.functional.gelu(self.fc1(h)))
        return x


class TorchVit(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.patch = torch.nn.Conv2d(3, WIDTH, PATCH, stride=PATCH)
        self.pos_embed = torch.nn.Parameter(
            torch.randn(1, GRID * GRID, WIDTH) * 0.02
        )
        self.blocks = torch.nn.ModuleList([TorchBlock() for _ in range(DEPTH)])
        self.norm = torch.nn.LayerNorm(WIDTH)

    def forward(self, x_bchw):
        x = self.patch(x_bchw)  # (B, E, g, g)
        B, E, g, _ = x.shape
        x = x.flatten(2).transpose(1, 2)  # (B, N, E)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)

    def timm_state_dict(self):
        sd = {
            "patch_embed.proj.weight": self.patch.weight.detach().numpy(),
            "patch_embed.proj.bias": self.patch.bias.detach().numpy(),
            "pos_embed": self.pos_embed.detach().numpy(),
            "norm.weight": self.norm.weight.detach().numpy(),
            "norm.bias": self.norm.bias.detach().numpy(),
        }
        for i, blk in enumerate(self.blocks):
            b = f"blocks.{i}."
            sd[b + "norm1.weight"] = blk.norm1.weight.detach().numpy()
            sd[b + "norm1.bias"] = blk.norm1.bias.detach().numpy()
            sd[b + "norm2.weight"] = blk.norm2.weight.detach().numpy()
            sd[b + "norm2.bias"] = blk.norm2.bias.detach().numpy()
            sd[b + "attn.qkv.weight"] = blk.qkv.weight.detach().numpy()
            sd[b + "attn.qkv.bias"] = blk.qkv.bias.detach().numpy()
            sd[b + "attn.proj.weight"] = blk.proj.weight.detach().numpy()
            sd[b + "attn.proj.bias"] = blk.proj.bias.detach().numpy()
            sd[b + "mlp.fc1.weight"] = blk.fc1.weight.detach().numpy()
            sd[b + "mlp.fc1.bias"] = blk.fc1.bias.detach().numpy()
            sd[b + "mlp.fc2.weight"] = blk.fc2.weight.detach().numpy()
            sd[b + "mlp.fc2.bias"] = blk.fc2.bias.detach().numpy()
        return sd


def test_vit_conversion_matches_torch_forward():
    torch.manual_seed(0)
    model = TorchVit().eval()
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(1, GRID * PATCH, GRID * PATCH, 3)).astype(
        np.float32
    )

    with torch.no_grad():
        ref = model(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
    ref = ref.reshape(1, GRID, GRID, WIDTH)

    params = convert_torch_vit_weights(
        model.timm_state_dict(), depth=DEPTH, num_heads=HEADS,
        num_prefix_tokens=0,
    )
    module = VitFeatureExtractor(
        patch_size=PATCH,
        width=WIDTH,
        depth=DEPTH,
        num_heads=HEADS,
        feature_image_size=(GRID, GRID),
    )
    out = np.asarray(module.apply({"params": params}, jnp.asarray(img)))
    # Forward runs in bf16 -> allow bf16-scale tolerance.
    err = np.abs(out - ref).max()
    scale = np.abs(ref).max()
    assert err / scale < 0.08, (err, scale)
    # Correlation is essentially 1.
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


def test_interpolate_pos_embed():
    params = {"pos_embed": np.random.default_rng(0).normal(size=(1, 16, 8))}
    out = interpolate_pos_embed(params, 8)
    assert out["pos_embed"].shape == (1, 64, 8)
    same = interpolate_pos_embed(params, 4)
    np.testing.assert_array_equal(same["pos_embed"], params["pos_embed"])
