"""Pretrained-backbone loading: one call from .npz to wired-in weights.

The reference downloads RADIO / CLIP / DINO checkpoints at startup
(mindmap/image_processing/feature_extraction.py:290-300 rank-0-first download,
:360-370 RADIO torch.hub, :425-444 FPN from fpn_path). This TPU build keeps
the conversion offline (docs/pages/pretrained_weights.md) and loads the
converted ``.npz`` here, in every app that runs a backbone forward:

- training / open-loop / closed-loop model side: grafted into
  ``params/encoder/feature_extractor`` after ``model.init``.
- datagen / live-policy mapping side: ``make_feature_fn`` builds the jitted
  RGB -> upscaled-feature-image extractor with the loaded params.

Running a non-RGB extractor with randomly initialized weights produces noise
features, so ``require_backbone_weights`` fails fast when a backbone forward
would run without a checkpoint.
"""
from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import numpy as np

from nvblox_mindmap_tpu.models.feature_extractors import (
    FeatureExtractorType,
    make_feature_extractor,
)
from nvblox_mindmap_tpu.models.weight_conversion import (
    graft_subtree,
    load_variables_npz,
)

logger = logging.getLogger(__name__)


def require_backbone_weights(
    feature_type: FeatureExtractorType,
    backbone_weights: Optional[str],
    context: str,
) -> None:
    """Fail fast when a non-RGB backbone would run with random weights."""
    feature_type = FeatureExtractorType(feature_type)
    if feature_type == FeatureExtractorType.RGB or backbone_weights:
        return
    raise ValueError(
        f"{context} runs the {feature_type.value!r} feature extractor, which "
        "needs pretrained weights: pass --backbone_weights <converted.npz> "
        "(see docs/pages/pretrained_weights.md for the offline conversion). "
        "Running a randomly initialized frozen backbone would produce noise "
        "features. Use --feature_type rgb for a weight-free extractor."
    )


def load_backbone_npz(path: str) -> Dict:
    """Load a converted backbone .npz: {"params": ..., norm_mean/std?: ...}.

    Accepts both layouts the converters emit: a top-level ``params`` tree, or
    a bare params tree (wrapped on the fly).
    """
    loaded = load_variables_npz(path)
    if "params" not in loaded:
        loaded = {"params": loaded}
    return loaded


def _mean_std_from(loaded: Dict) -> Optional[Tuple]:
    if "norm_mean" in loaded and "norm_std" in loaded:
        return (
            tuple(float(x) for x in np.asarray(loaded["norm_mean"]).reshape(-1)),
            tuple(float(x) for x in np.asarray(loaded["norm_std"]).reshape(-1)),
        )
    return None


def _num_prefix_tokens_from(params: Dict) -> Optional[int]:
    if "prefix_tokens" in params:
        return int(np.asarray(params["prefix_tokens"]).shape[1])
    return 0 if "pos_embed" in params else None


def build_backbone(
    feature_type: FeatureExtractorType,
    backbone_weights: str,
    feature_image_size: Tuple[int, int] = (32, 32),
):
    """(module, params) for a converted checkpoint. Input normalization and
    the CLS/register token count come from the checkpoint itself."""
    loaded = load_backbone_npz(backbone_weights)
    module = make_feature_extractor(
        FeatureExtractorType(feature_type),
        feature_image_size=feature_image_size,
        mean_std=_mean_std_from(loaded),
        num_prefix_tokens=_num_prefix_tokens_from(loaded["params"]),
    )
    params = loaded["params"]
    if FeatureExtractorType(feature_type) == FeatureExtractorType.CLIP_RESNET50_FPN:
        # CLIP checkpoints may carry only the frozen trunk ('backbone'); the
        # module also needs FPN params - init fresh ones and graft the trunk
        # (same behavior as graft_backbone_into_model_params; reference
        # feature_extraction.py:434-442 trains the FPN when no fpn_path).
        if "fpn" not in params:
            import jax

            # For a *mapping/datagen* export a random neck means the 120-d
            # features written to disk are a random projection of trunk
            # activations - valid for training (the policy's own FPN trains
            # against them in the reference) but surprising for map exports,
            # so say it loudly.
            logger.warning(
                "CLIP checkpoint %r has no 'fpn' subtree: the FPN neck is "
                "freshly initialized, so extracted 120-d features are a "
                "random projection of the frozen trunk. This matches the "
                "reference's training semantics (feature_extraction.py:"
                "434-442, FPN trains when no fpn_path) but for mapping/"
                "datagen exports you likely want a converted FPN: re-run the "
                "converter with an fpn checkpoint to embed one.",
                backbone_weights,
            )
            H = feature_image_size[0] * 16
            # jitted: eager flax init of the ResNet50 trunk is ~10 s of
            # op-by-op dispatch on CPU (worse through the TPU tunnel).
            fresh = jax.jit(module.init)(
                jax.random.PRNGKey(0), np.zeros((1, H, H, 3), np.float32)
            )["params"]
            fresh = dict(fresh)
            fresh["backbone"] = params["backbone"]
            params = fresh
    return module, params


def graft_backbone_into_model_params(
    params: Dict,
    feature_type: FeatureExtractorType,
    backbone_weights: str,
) -> Dict:
    """Install converted weights at ``encoder/feature_extractor``.

    For CLIP only the frozen trunk is replaced (``.../backbone``); the FPN
    neck stays at its fresh initialization and trains, unless the checkpoint
    also carries an ``fpn`` subtree (reference: fpn_path,
    feature_extraction.py:425-444).
    """
    loaded = load_backbone_npz(backbone_weights)
    pretrained = loaded["params"]
    feature_type = FeatureExtractorType(feature_type)
    if feature_type in (
        FeatureExtractorType.RADIO_V25_B, FeatureExtractorType.DINO_V2_VITS14,
    ):
        ckpt_n = _num_prefix_tokens_from(pretrained) or 0
        model_fx = params["encoder"]["feature_extractor"]
        model_n = (
            int(np.asarray(model_fx["prefix_tokens"]).shape[1])
            if "prefix_tokens" in model_fx else 0
        )
        if ckpt_n != model_n:
            raise ValueError(
                f"checkpoint has {ckpt_n} CLS/register prefix tokens but the "
                f"model was built with {model_n}; pass "
                f"--feature_num_prefix_tokens {ckpt_n} so the architecture "
                "matches the converted weights"
            )
    if feature_type == FeatureExtractorType.CLIP_RESNET50_FPN:
        trunk = pretrained.get("backbone", pretrained)
        if "params" in trunk:  # converter wraps the trunk once more
            trunk = trunk["params"]
        params = graft_subtree(
            params, "encoder/feature_extractor/backbone", trunk
        )
        if "fpn" in pretrained:
            params = graft_subtree(
                params, "encoder/feature_extractor/fpn", pretrained["fpn"]
            )
        return params
    return graft_subtree(params, "encoder/feature_extractor", pretrained)


def make_feature_fn(
    feature_type: FeatureExtractorType,
    output_size: Tuple[int, int],
    backbone_weights: Optional[str] = None,
    feature_image_size: Tuple[int, int] = (32, 32),
):
    """Jitted (H, W, 3) [0,1] -> (output_size, F) extractor for mapping.

    The mapping pipeline upscales features to the nvblox integration
    resolution (reference: nvblox_mapper_constants.py:37 512x512;
    feature_extractor desired_output_size). RGB needs no weights; every other
    type requires a converted checkpoint.
    """
    import jax
    import jax.numpy as jnp

    feature_type = FeatureExtractorType(feature_type)
    if feature_type == FeatureExtractorType.RGB:

        @jax.jit
        def rgb_fn(rgb):
            return jax.image.resize(
                jnp.asarray(rgb)[None], (1, *output_size, 3), method="bilinear"
            )[0]

        return rgb_fn

    require_backbone_weights(feature_type, backbone_weights, "feature mapping")
    module, params = build_backbone(
        feature_type, backbone_weights, feature_image_size
    )
    # Params stay a traced argument (not closure constants) so the ~100M
    # frozen weights live once in HBM instead of being baked into the
    # executable.
    params = jax.device_put(jax.tree_util.tree_map(jnp.asarray, params))

    @jax.jit
    def apply_fn(p, rgb):
        feats = module.apply({"params": p}, jnp.asarray(rgb)[None])
        return jax.image.resize(
            feats, (1, *output_size, feats.shape[-1]), method="bilinear"
        )[0]

    return lambda rgb: apply_fn(params, rgb)
