"""Torch -> flax weight conversion for the frozen vision backbones.

The reference loads RADIO / DINOv2 / CLIP weights from torch hub
(reference: image_processing/feature_extraction.py:360-535). This module maps
those torch state dicts onto the flax modules in ``feature_extractors.py``:

- timm/DINOv2-style ViT: patch_embed.proj, pos_embed, blocks.N.{norm1, attn
  (fused qkv), norm2, mlp.fc1/fc2}, final norm. CLS/register tokens are
  dropped (the policy consumes patch features only).
- Layout rules: torch Linear (out, in) -> flax kernel (in, out); torch Conv
  (out, in, kh, kw) -> flax (kh, kw, in, out); fused qkv splits into flax
  MultiHeadDotProductAttention's (E, heads, head_dim) projections.

Conversion is pure numpy on host; feed the result to ``module.apply`` as
{"params": params}. Use ``interpolate_pos_embed`` when the runtime patch grid
differs from the pretraining grid.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _linear(w: np.ndarray, b: np.ndarray) -> Dict[str, np.ndarray]:
    return {"kernel": np.asarray(w).T, "bias": np.asarray(b)}


def _layernorm(w: np.ndarray, b: np.ndarray) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(w), "bias": np.asarray(b)}


def convert_torch_vit_weights(
    state_dict: Dict[str, np.ndarray],
    depth: int,
    num_heads: int,
    prefix: str = "",
    num_prefix_tokens: int = 1,
    keep_prefix_tokens: bool = True,
) -> Dict:
    """Map a timm/DINOv2-style ViT state dict onto VitFeatureExtractor params.

    Args:
        state_dict: name -> numpy array (call .numpy() on torch tensors).
        depth: number of transformer blocks.
        num_heads: attention heads.
        prefix: optional key prefix in the state dict (e.g. "model.").
        num_prefix_tokens: CLS (+ register) entries at the head of pos_embed.
        keep_prefix_tokens: emit a 'prefix_tokens' param (cls/register token
            values with their pos-embed slice folded in) so the flax module
            runs them through attention like the original - required for
            numerical fidelity; the module drops them from its output.

    Returns:
        flax params dict for VitFeatureExtractor.
    """
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}

    params: Dict = {}
    conv_w = sd["patch_embed.proj.weight"]  # (E, 3, p, p)
    params["patch_embed"] = {
        "kernel": conv_w.transpose(2, 3, 1, 0),
        "bias": sd["patch_embed.proj.bias"],
    }
    pos = sd["pos_embed"]  # (1, prefix+N, E)
    params["pos_embed"] = pos[:, num_prefix_tokens:, :]

    if keep_prefix_tokens:
        width_ = conv_w.shape[0]
        tokens = []
        if "cls_token" in sd:
            tokens.append(sd["cls_token"].reshape(1, -1, width_))
        if "register_tokens" in sd:
            tokens.append(sd["register_tokens"].reshape(1, -1, width_))
        if "reg_token" in sd:
            tokens.append(sd["reg_token"].reshape(1, -1, width_))
        if tokens:
            prefix_tokens = np.concatenate(tokens, axis=1).copy()
            folded = min(num_prefix_tokens, prefix_tokens.shape[1])
            if folded > 0:
                prefix_tokens[:, :folded] += pos[:, :folded]
            params["prefix_tokens"] = prefix_tokens

    width = conv_w.shape[0]
    head_dim = width // num_heads
    for i in range(depth):
        b = f"blocks.{i}."
        params[f"ln1_{i}"] = _layernorm(sd[b + "norm1.weight"], sd[b + "norm1.bias"])
        params[f"ln2_{i}"] = _layernorm(sd[b + "norm2.weight"], sd[b + "norm2.bias"])
        # DINOv2 LayerScale gammas (init_values=1.0 hub blocks). The flax
        # module must be built with use_layer_scale=True to consume them.
        if b + "ls1.gamma" in sd:
            params[f"ls1_{i}"] = sd[b + "ls1.gamma"]
            params[f"ls2_{i}"] = sd[b + "ls2.gamma"]

        qkv_w = sd[b + "attn.qkv.weight"]  # (3E, E)
        qkv_b = sd[b + "attn.qkv.bias"]
        q_w, k_w, v_w = np.split(qkv_w, 3, axis=0)
        q_b, k_b, v_b = np.split(qkv_b, 3, axis=0)

        def proj(w, bias):
            # (E_out, E_in) -> (E_in, heads, head_dim)
            return {
                "kernel": w.T.reshape(width, num_heads, head_dim),
                "bias": bias.reshape(num_heads, head_dim),
            }

        out_w = sd[b + "attn.proj.weight"]  # (E, E)
        params[f"attn_{i}"] = {
            "query": proj(q_w, q_b),
            "key": proj(k_w, k_b),
            "value": proj(v_w, v_b),
            "out": {
                "kernel": out_w.T.reshape(num_heads, head_dim, width),
                "bias": sd[b + "attn.proj.bias"],
            },
        }
        params[f"mlp1_{i}"] = _linear(sd[b + "mlp.fc1.weight"], sd[b + "mlp.fc1.bias"])
        params[f"mlp2_{i}"] = _linear(sd[b + "mlp.fc2.weight"], sd[b + "mlp.fc2.bias"])

    params["ln_final"] = _layernorm(sd["norm.weight"], sd["norm.bias"])
    return params


def interpolate_pos_embed(params: Dict, target_grid: int) -> Dict:
    """Bilinearly resample the patch pos_embed to a new grid size.

    Pretrained ViTs store pos_embed for their training grid (e.g. 16x16 for
    224/14); the extractor may run at a different patch grid (e.g. 32x32).
    """
    import jax

    pos = np.asarray(params["pos_embed"])  # (1, N, E)
    n, e = pos.shape[1], pos.shape[2]
    g = int(round(np.sqrt(n)))
    assert g * g == n, f"pos_embed length {n} is not square"
    if g == target_grid:
        return params
    grid = pos.reshape(1, g, g, e)
    resized = np.asarray(
        jax.image.resize(grid, (1, target_grid, target_grid, e), method="bilinear")
    )
    out = dict(params)
    out["pos_embed"] = resized.reshape(1, target_grid * target_grid, e)
    return out


def _conv(w: np.ndarray) -> Dict[str, np.ndarray]:
    return {"kernel": np.asarray(w).transpose(2, 3, 1, 0)}


def _batchnorm(prefix: str, sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torch BatchNorm2d -> FrozenBatchNorm params (running stats included)."""
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
        "mean": np.asarray(sd[prefix + ".running_mean"]),
        "var": np.asarray(sd[prefix + ".running_var"]),
    }


def convert_clip_resnet_weights(
    state_dict: Dict[str, np.ndarray], layers=(3, 4, 6, 3)
) -> Dict:
    """Map CLIP's ModifiedResNet visual state dict onto ModifiedResNetFeatures.

    Accepts keys with or without the ``visual.`` prefix of the full CLIP
    checkpoint (reference: image_processing/feature_extraction.py:473-476
    loads the RN50 trunk). The attention-pool head is ignored - the extractor
    taps intermediate feature maps only. Returns a single params tree (batch
    statistics live in FrozenBatchNorm params) for the ``backbone`` submodule
    of ClipResNet50Fpn.
    """
    sd = {
        (k[len("visual."):] if k.startswith("visual.") else k): v
        for k, v in state_dict.items()
    }
    params: Dict = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv(sd[f"conv{i}.weight"])
        params[f"bn{i}"] = _batchnorm(f"bn{i}", sd)
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            name = f"layer{stage + 1}_{b}"
            t = f"layer{stage + 1}.{b}"
            mp: Dict = {}
            for j in (1, 2, 3):
                mp[f"conv{j}"] = _conv(sd[f"{t}.conv{j}.weight"])
                mp[f"bn{j}"] = _batchnorm(f"{t}.bn{j}", sd)
            if f"{t}.downsample.0.weight" in sd:
                mp["downsample_conv"] = _conv(sd[f"{t}.downsample.0.weight"])
                mp["downsample_bn"] = _batchnorm(f"{t}.downsample.1", sd)
            params[name] = mp
    return {"params": params}


def convert_radio_vit_weights(
    state_dict: Dict[str, np.ndarray],
    depth: int = 12,
    num_heads: int = 12,
) -> Dict:
    """Map a RADIO torch-hub checkpoint onto VitFeatureExtractor params.

    The RADIO hub model (reference: feature_extraction.py:360-370 loads
    ``NVlabs/RADIO`` ``radio_v2.5-b``) wraps a ViT whose stem is a
    ``patch_generator`` (linear patch embedder + cls/register tokens + a
    cropped position embedding) and whose inputs pass through an
    ``input_conditioner`` holding normalization tensors. This converter:

    - strips the ``radio_model.``/``base_model.``/``model.`` wrappers,
    - accepts either a timm stem (``patch_embed.proj.*`` conv weights) or the
      RADIO ``patch_generator`` stem (Conv2d or flattened-Linear embedder),
    - drops cls/register tokens (the policy consumes patch features only;
      reference RadioFeatureExtractorBase keeps only the spatial features),
    - reads ``input_conditioner.norm_mean/norm_std`` when present and returns
      them under ``norm_mean``/``norm_std`` so the flax module can apply the
      identical input normalization.

    Returns {"params": ..., "norm_mean": (3,)?, "norm_std": (3,)?}.
    Verify converted checkpoints against a stored activation fixture
    (tests/test_backbone_golden.py; reference pattern:
    mindmap/tests/test_feature_extraction.py:15-50).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    for wrapper in ("radio_model.", "base_model.", "model."):
        if any(k.startswith(wrapper + "blocks.") for k in sd):
            sd = {
                k[len(wrapper):] if k.startswith(wrapper) else k: v
                for k, v in sd.items()
            }

    out: Dict = {}
    mean = sd.get("input_conditioner.norm_mean")
    std = sd.get("input_conditioner.norm_std")
    if mean is not None:
        out["norm_mean"] = np.asarray(mean).reshape(-1)
    if std is not None:
        out["norm_std"] = np.asarray(std).reshape(-1)

    if "patch_generator.embedder.weight" in sd:
        emb_w = sd["patch_generator.embedder.weight"]
        emb_b = sd.get(
            "patch_generator.embedder.bias",
            np.zeros(emb_w.shape[0], emb_w.dtype),
        )
        if emb_w.ndim == 4:  # Conv2d (E, 3, p, p)
            patch = {
                "kernel": emb_w.transpose(2, 3, 1, 0),
                "bias": emb_b,
            }
        else:  # Linear over flattened patches: (E, p*p*3) in RADIO's
            # (3, p, p) -> channels-first flatten order; flax Conv expects
            # (p, p, 3, E).
            e, flat = emb_w.shape
            p = int(round(np.sqrt(flat / 3)))
            assert 3 * p * p == flat, f"non-square patch embedder: {emb_w.shape}"
            patch = {
                "kernel": emb_w.reshape(e, 3, p, p).transpose(2, 3, 1, 0),
                "bias": emb_b,
            }
        pos = sd["patch_generator.pos_embed"]  # (1, N, E), patches only
        vit_sd = dict(sd)
        vit_sd["patch_embed.proj.weight"] = np.zeros(
            (patch["kernel"].shape[3], 3, patch["kernel"].shape[0],
             patch["kernel"].shape[1]),
            patch["kernel"].dtype,
        )
        vit_sd["patch_embed.proj.bias"] = patch["bias"]
        vit_sd["pos_embed"] = pos
        params = convert_torch_vit_weights(
            vit_sd, depth=depth, num_heads=num_heads, num_prefix_tokens=0,
            keep_prefix_tokens=False,
        )
        params["patch_embed"] = patch
        # RADIO's patch_generator concatenates cls/register tokens after the
        # (patch-only) pos embed; they attend, so keep them as prefix tokens.
        width_ = patch["kernel"].shape[-1]
        tokens = []
        for key in (
            "patch_generator.cls_token.token",
            "patch_generator.cls_token",
            "patch_generator.register_tokens",
            "patch_generator.registers",
        ):
            if key in sd:
                tokens.append(sd[key].reshape(1, -1, width_))
        if tokens:
            params["prefix_tokens"] = np.concatenate(tokens, axis=1)
    else:
        n_prefix = 0
        if "cls_token" in sd:
            n_prefix += sd["cls_token"].shape[1] if sd["cls_token"].ndim == 3 else 1
        if "register_tokens" in sd:
            n_prefix += sd["register_tokens"].shape[1]
        params = convert_torch_vit_weights(
            sd, depth=depth, num_heads=num_heads, num_prefix_tokens=n_prefix
        )
    out["params"] = params
    return out


def save_variables_npz(path: str, variables: Dict) -> None:
    """Flatten a variables pytree to an .npz with '/'-joined keys."""
    import jax.tree_util as jtu

    flat = {
        "/".join(str(p.key) for p in key_path): np.asarray(leaf)
        for key_path, leaf in jtu.tree_flatten_with_path(variables)[0]
    }
    np.savez(path, **flat)


def _load_npz_arrays_mmap(path: str) -> Optional[Dict[str, np.ndarray]]:
    """Zero-copy reader for uncompressed (ZIP_STORED) .npz files.

    np.load streams each member through Python's zipfile in small chunks
    with CRC verification — ~30 MB/s on slow hosts, which turns loading a
    ViT-B-sized backbone checkpoint (~340 MB, what save_variables_npz and
    the reference's converted RADIO/CLIP weights produce) into tens of
    seconds. Members written by np.savez are stored uncompressed, so we can
    instead mmap the archive once and expose every array as a view of the
    mapping. Returns None when any member is compressed or non-trivially
    encoded (caller falls back to np.load). Member CRCs are still verified
    (zlib.crc32 runs at GB/s — negligible vs the chunked-read cost np.load
    pays), so corrupted archives raise like np.load instead of silently
    yielding garbage weights. Arrays are read-only views; mutate-in-place
    callers must copy (checkpoint consumers device_put them anyway).
    """
    import io
    import mmap
    import zipfile
    import zlib

    try:
        with open(path, "rb") as f:
            with zipfile.ZipFile(f) as zf:
                infos = zf.infolist()
            if any(zi.compress_type != zipfile.ZIP_STORED for zi in infos):
                return None
            if not all(zi.filename.endswith(".npy") for zi in infos):
                return None
            # mmap keeps the mapping alive after the fd closes; the returned
            # arrays are read-only views of it.
            mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        out: Dict[str, np.ndarray] = {}
        for zi in infos:
            # The local file header's name/extra lengths can differ from the
            # central directory's (np.savez pads 'extra' for alignment).
            h = zi.header_offset
            name_len = int.from_bytes(mm[h + 26:h + 28], "little")
            extra_len = int.from_bytes(mm[h + 28:h + 30], "little")
            start = h + 30 + name_len + extra_len
            buf = memoryview(mm)[start:start + zi.file_size]
            if zlib.crc32(buf) != zi.CRC:
                raise ValueError(
                    f"CRC mismatch for npz member {zi.filename!r} in {path}:"
                    " the archive is corrupted"
                )
            head = io.BytesIO(bytes(buf[:256]))
            version = np.lib.format.read_magic(head)
            np.lib.format._check_version(version)
            shape, fortran, dtype = np.lib.format._read_array_header(
                head, version
            )
            if dtype.hasobject:
                return None
            count = int(np.prod(shape)) if shape else 1
            data = np.frombuffer(buf, dtype=dtype, count=count,
                                 offset=head.tell())
            out[zi.filename[: -len(".npy")]] = data.reshape(
                shape, order="F" if fortran else "C"
            )
        return out
    except Exception:
        return None


def load_variables_npz(path: str) -> Dict:
    """Inverse of save_variables_npz: .npz -> nested variables dict."""
    arrays = _load_npz_arrays_mmap(path)
    if arrays is None:
        loaded = np.load(path)
        arrays = {key: loaded[key] for key in loaded.files}
    nested: Dict = {}
    for key, value in arrays.items():
        node = nested
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return nested


def graft_subtree(variables: Dict, path: str, subtree: Dict) -> Dict:
    """Return a copy of ``variables`` with the dict at '/'-path replaced.

    Convenience for installing converted backbone weights, e.g.
    ``graft_subtree(vars, "params/encoder/feature_extractor/backbone", w)``.
    Every node along the path must already exist (shapes are the caller's
    responsibility; model.apply will reject mismatches).
    """
    parts = path.split("/")
    out = dict(variables)
    node = out
    for part in parts[:-1]:
        if part not in node:
            raise KeyError(
                f"graft path component {part!r} not found "
                f"(available: {sorted(node)})"
            )
        node[part] = dict(node[part])
        node = node[part]
    if parts[-1] not in node:
        raise KeyError(
            f"graft target {parts[-1]!r} not found (available: {sorted(node)})"
        )
    node[parts[-1]] = subtree
    return out
