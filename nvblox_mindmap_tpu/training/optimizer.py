"""Optimizer and LR schedule (optax).

Mirrors the reference's training recipe (reference: run_training.py:140-153,
634-645): AdamW with weight decay 5e-4 applied to everything except biases
and LayerNorm scales/offsets, and a LinearLR schedule from 1.0x to
``end_factor``x over ``convergence_percentage`` of the run, constant after.
"""
from __future__ import annotations

from typing import Any

import jax
import optax


def _decay_mask(params: Any) -> Any:
    """True where weight decay applies: exclude biases and LayerNorm params."""

    def mask_fn(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        is_bias = names[-1] == "bias"
        is_layernorm = any("LayerNorm" in n for n in names) or names[-1] in (
            "scale",
            "offset",
        )
        return not (is_bias or is_layernorm)

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def linear_lr_schedule(
    initial_learning_rate: float,
    end_factor: float,
    total_iters: int,
    convergence_percentage: float = 0.75,
) -> optax.Schedule:
    convergence_iter = max(int(total_iters * convergence_percentage), 1)

    def schedule(step):
        frac = jax.numpy.minimum(step / convergence_iter, 1.0)
        factor = 1.0 + (end_factor - 1.0) * frac
        return initial_learning_rate * factor

    return schedule


def frozen_feature_extractor_mask(params: Any, fpn_trainable: bool = True) -> Any:
    """True where a parameter is TRAINABLE.

    The vision backbone is frozen (reference: feature_extraction.py freezes
    all extractor weights); only the CLIP FPN trains when no pretrained FPN
    is given (reference: ClipResNet50FpnFeatureExtractor.load_fpn).
    """

    def mask_fn(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        if "feature_extractor" not in names:
            return True
        if fpn_trainable and "fpn" in names:
            return True
        return False

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(
    params: Any,
    initial_learning_rate: float = 1e-4,
    weight_decay: float = 5e-4,
    end_factor: float = 0.5,
    total_iters: int = 100_000,
    convergence_percentage: float = 0.75,
    accumulate_grad_batches: int = 1,
    trainable_mask: Any = None,
) -> optax.GradientTransformation:
    schedule = linear_lr_schedule(
        initial_learning_rate, end_factor, total_iters, convergence_percentage
    )
    tx = optax.adamw(
        learning_rate=schedule,
        weight_decay=weight_decay,
        mask=_decay_mask(params),
    )
    if trainable_mask is not None:
        tx = optax.chain(
            tx,
            optax.masked(
                optax.set_to_zero(),
                jax.tree_util.tree_map(lambda t: not t, trainable_mask),
            ),
        )
    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
    return tx
