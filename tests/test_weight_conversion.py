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


class TorchClipBottleneck(torch.nn.Module):
    """CLIP ModifiedResNet bottleneck (anti-aliased downsampling)."""

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.avgpool = (
            torch.nn.AvgPool2d(stride) if stride > 1 else torch.nn.Identity()
        )
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = torch.nn.Sequential()
            self.downsample.add_module("-1", torch.nn.AvgPool2d(stride)
                                       if stride > 1 else torch.nn.Identity())
            self.downsample.add_module(
                "0", torch.nn.Conv2d(inplanes, planes * 4, 1, bias=False)
            )
            self.downsample.add_module("1", torch.nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        identity = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + identity)


class TorchModifiedResNet(torch.nn.Module):
    def __init__(self, layers, width):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, width // 2, 3, stride=2, padding=1,
                                     bias=False)
        self.bn1 = torch.nn.BatchNorm2d(width // 2)
        self.conv2 = torch.nn.Conv2d(width // 2, width // 2, 3, padding=1,
                                     bias=False)
        self.bn2 = torch.nn.BatchNorm2d(width // 2)
        self.conv3 = torch.nn.Conv2d(width // 2, width, 3, padding=1,
                                     bias=False)
        self.bn3 = torch.nn.BatchNorm2d(width)
        self.avgpool = torch.nn.AvgPool2d(2)
        inplanes, planes = width, width
        for stage, blocks in enumerate(layers):
            stride = 1 if stage == 0 else 2
            mods = []
            for b in range(blocks):
                mods.append(
                    TorchClipBottleneck(inplanes, planes,
                                        stride if b == 0 else 1)
                )
                inplanes = planes * 4
            setattr(self, f"layer{stage + 1}", torch.nn.Sequential(*mods))
            planes *= 2

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x0 = torch.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x0)
        feats = [x0]
        for i in (1, 2, 3, 4):
            x = getattr(self, f"layer{i}")(x)
            feats.append(x)
        return feats


def test_clip_resnet_conversion_matches_torch_forward():
    """Converted ModifiedResNet weights reproduce the torch taps exactly."""
    from nvblox_mindmap_tpu.models.clip_resnet_fpn import ModifiedResNetFeatures
    from nvblox_mindmap_tpu.models.weight_conversion import (
        convert_clip_resnet_weights,
    )

    layers, width = (1, 1, 1, 1), 8
    torch.manual_seed(0)
    ref = TorchModifiedResNet(layers, width).eval()
    # Randomize batch-norm stats so eval mode is a real check.
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    state = {"visual." + k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_clip_resnet_weights(state, layers=layers)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref(torch.from_numpy(np.moveaxis(x, -1, 1)))

    model = ModifiedResNetFeatures(layers=layers, width=width)
    ours = model.apply(variables, jnp.asarray(x))
    assert len(ours) == len(ref_feats) == 5
    for i, (a, b) in enumerate(zip(ours, ref_feats)):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(a), -1, 1), b.numpy(), atol=2e-4,
            err_msg=f"tap {i}",
        )


def test_variables_npz_roundtrip_and_graft(tmp_path):
    from nvblox_mindmap_tpu.models.weight_conversion import (
        graft_subtree,
        load_variables_npz,
        save_variables_npz,
    )

    variables = {
        "params": {"a": {"kernel": np.ones((2, 3), np.float32)},
                   "b": {"bias": np.zeros(4, np.float32)}},
        "batch_stats": {"a": {"mean": np.full(3, 0.5, np.float32)}},
    }
    path = str(tmp_path / "w.npz")
    save_variables_npz(path, variables)
    loaded = load_variables_npz(path)
    np.testing.assert_array_equal(
        loaded["params"]["a"]["kernel"], variables["params"]["a"]["kernel"]
    )
    np.testing.assert_array_equal(
        loaded["batch_stats"]["a"]["mean"],
        variables["batch_stats"]["a"]["mean"],
    )

    new = {"kernel": np.full((2, 3), 7.0, np.float32)}
    grafted = graft_subtree(variables, "params/a", new)
    np.testing.assert_array_equal(grafted["params"]["a"]["kernel"], 7.0)
    # Original untouched; sibling subtree shared.
    np.testing.assert_array_equal(variables["params"]["a"]["kernel"], 1.0)
    assert grafted["params"]["b"] is variables["params"]["b"]

    import pytest as _pytest
    with _pytest.raises(KeyError, match="graft"):
        graft_subtree(variables, "params/missing", new)


def test_npz_mmap_fast_path_matches_np_load(tmp_path):
    """The ZIP_STORED zero-copy loader must be bit-exact vs np.load across
    dtypes/shapes, and compressed archives must fall back (not fail)."""
    from nvblox_mindmap_tpu.models.weight_conversion import (
        _load_npz_arrays_mmap,
        load_variables_npz,
    )

    rng = np.random.default_rng(3)
    arrays = {
        "f32": rng.standard_normal((7, 5)).astype(np.float32),
        "f16": rng.standard_normal((3, 2, 4)).astype(np.float16),
        "i32": rng.integers(-9, 9, (11,)).astype(np.int32),
        "boolean": rng.integers(0, 2, (4, 4)).astype(bool),
        "scalar": np.float32(2.5),
        "empty": np.zeros((0, 3), np.float32),
        "fortran": np.asfortranarray(rng.standard_normal((6, 4))),
    }
    path = str(tmp_path / "stored.npz")
    np.savez(path, **arrays)

    fast = _load_npz_arrays_mmap(path)
    assert fast is not None, "stored npz must take the mmap fast path"
    ref = np.load(path)
    assert set(fast) == set(ref.files)
    for key in ref.files:
        np.testing.assert_array_equal(fast[key], ref[key])
        assert fast[key].dtype == ref[key].dtype
    assert not fast["f32"].flags.writeable  # view of a read-only mapping

    # Compressed archive: fast path declines, load_variables_npz falls back.
    cpath = str(tmp_path / "compressed.npz")
    np.savez_compressed(cpath, **{"params/a/kernel": arrays["f32"]})
    assert _load_npz_arrays_mmap(cpath) is None
    nested = load_variables_npz(cpath)
    np.testing.assert_array_equal(nested["params"]["a"]["kernel"],
                                  arrays["f32"])

    # Corruption: flip a payload byte (zip structure intact). The fast path
    # must not return garbage - CRC check declines, and the np.load fallback
    # surfaces the corruption as an error.
    bpath = str(tmp_path / "bitrot.npz")
    np.savez(bpath, big=rng.standard_normal((256, 256)).astype(np.float32))
    raw = bytearray(open(bpath, "rb").read())
    raw[len(raw) // 2] ^= 0xFF  # middle of the stored payload
    open(bpath, "wb").write(bytes(raw))
    import pytest

    assert _load_npz_arrays_mmap(bpath) is None
    with pytest.raises(Exception):
        np.asarray(load_variables_npz(bpath)["big"])


def test_layer_scale_conversion_and_forward_effect():
    """DINOv2 LayerScale gammas (ls1/ls2) are converted and actually scale
    the residual branches (previously silently dropped)."""
    import jax
    import jax.numpy as jnp

    from nvblox_mindmap_tpu.models.feature_extractors import VitFeatureExtractor
    from nvblox_mindmap_tpu.models.weight_conversion import (
        convert_torch_vit_weights,
    )
    from tests.test_pretrained_wiring import make_random_vit_sd

    sd = make_random_vit_sd(width=32, depth=2, patch=4, grid=4, seed=0)
    # Add trained LayerScale gammas like the DINOv2 hub blocks.
    rng = np.random.default_rng(1)
    for i in range(2):
        sd[f"blocks.{i}.ls1.gamma"] = rng.uniform(0.3, 1.5, 32).astype(
            np.float32
        )
        sd[f"blocks.{i}.ls2.gamma"] = rng.uniform(0.3, 1.5, 32).astype(
            np.float32
        )
    params = convert_torch_vit_weights(sd, depth=2, num_heads=4,
                                       num_prefix_tokens=1)
    assert "ls1_0" in params and "ls2_1" in params
    np.testing.assert_array_equal(params["ls1_0"],
                                  sd["blocks.0.ls1.gamma"])

    module = VitFeatureExtractor(
        patch_size=4, width=32, depth=2, num_heads=4,
        feature_image_size=(4, 4), num_prefix_tokens=1, use_layer_scale=True,
    )
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    out = module.apply({"params": params}, x)
    # Setting all gammas to 1 changes the output (the gammas are live).
    ones = dict(params)
    for k in ("ls1_0", "ls1_1", "ls2_0", "ls2_1"):
        ones[k] = np.ones_like(params[k])
    out_ones = module.apply({"params": ones}, x)
    assert not np.allclose(np.asarray(out), np.asarray(out_ones), atol=1e-4)
