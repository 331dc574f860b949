"""Training losses and evaluation metrics for the diffusion policy.

Matches the reference (mindmap/model_utils/loss.py): weighted L1 position +
L1 rotation + BCE-with-logits openness + optional MSE head yaw (weights
30/10/1/1 by default), and the 18-metric evaluation suite (per-axis distance
error/std, bias, quaternion geodesic error in degrees, openness L1).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nvblox_mindmap_tpu.geometry.rotations import (
    quaternion_invert,
    quaternion_multiply,
    quaternion_to_axis_angle,
)

TRANS_LENGTH = 3


@dataclasses.dataclass(frozen=True)
class LossWeights:
    pos_loss: float = 30.0
    rot_loss: float = 10.0
    gripper_loss: float = 1.0
    head_yaw_loss: float = 1.0


def destructure_action(
    action: jnp.ndarray, rotation_form: str
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Split action into (position, rotation, openness-or-None)."""
    rot_length = {"quaternion": 4, "6D": 6}[rotation_form]
    assert action.shape[-1] >= TRANS_LENGTH + rot_length
    assert action.shape[-1] <= TRANS_LENGTH + rot_length + 1
    openness = (
        action[..., TRANS_LENGTH + rot_length:]
        if action.shape[-1] > TRANS_LENGTH + rot_length
        else None
    )
    return (
        action[..., :TRANS_LENGTH],
        action[..., TRANS_LENGTH : TRANS_LENGTH + rot_length],
        openness,
    )


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable binary cross-entropy with logits (mean)."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def compute_loss(
    pred: jnp.ndarray,
    head_yaw_pred: Optional[jnp.ndarray],
    target: jnp.ndarray,
    gt_openness: Optional[jnp.ndarray],
    gt_head_yaw: Optional[jnp.ndarray],
    loss_weights: LossWeights = LossWeights(),
    predict_head_yaw: bool = False,
    rotation_form: str = "6D",
) -> Dict[str, jnp.ndarray]:
    """Weighted diffusion loss.

    Args:
        pred: (B, L, G, pos+rot+1) prediction (openness as logits).
        target: (B, L, G, pos+rot) noise / trajectory target.
        gt_openness: (B, L, G, 1) binary openness target.
        gt_head_yaw: (B, L, 1) head yaw target in [-pi, pi).

    Returns:
        dict with "total", "pos", "rot", "gripper" and optional "head_yaw".
    """
    assert pred.shape[:-1] == target.shape[:-1]
    pred_trans, pred_rot, pred_openness = destructure_action(pred, rotation_form)
    gt_trans, gt_rot, _ = destructure_action(target, rotation_form)

    pos_loss = jnp.mean(jnp.abs(pred_trans - gt_trans))
    rot_loss = jnp.mean(jnp.abs(pred_rot - gt_rot))
    gripper_loss = jnp.asarray(0.0, dtype=pred.dtype)
    if gt_openness is not None and gt_openness.size > 0:
        gripper_loss = bce_with_logits(pred_openness, gt_openness)

    total = (
        loss_weights.pos_loss * pos_loss
        + loss_weights.rot_loss * rot_loss
        + loss_weights.gripper_loss * gripper_loss
    )
    losses = {"pos": pos_loss, "rot": rot_loss, "gripper": gripper_loss}
    if predict_head_yaw:
        head_yaw_loss = jnp.mean(jnp.square(head_yaw_pred - gt_head_yaw))
        total = total + loss_weights.head_yaw_loss * head_yaw_loss
        losses["head_yaw"] = head_yaw_loss
    losses["total"] = total
    return losses


def compute_metrics(
    pred: jnp.ndarray,
    head_yaw_pred: Optional[jnp.ndarray],
    target: jnp.ndarray,
    gt_head_yaw: Optional[jnp.ndarray],
    predict_head_yaw: bool = False,
    rotation_form: str = "quaternion",
) -> Dict[str, jnp.ndarray]:
    """Checkpoint-evaluation metrics on unnormalized (quaternion) actions."""
    assert pred.shape[:-1] == target.shape[:-1]
    pred_trans, pred_rot, pred_openness = destructure_action(pred, rotation_form)
    gt_trans, gt_rot, gt_openness = destructure_action(target, rotation_form)

    metrics: Dict[str, jnp.ndarray] = {}
    d2 = jnp.square(pred_trans - gt_trans)
    d_axis = jnp.sqrt(d2)
    d_norm = jnp.sqrt(jnp.sum(d2, axis=-1))
    metrics["distance_m"] = jnp.mean(d_norm)
    metrics["distance_m_x"] = jnp.mean(d_axis[..., 0])
    metrics["distance_m_y"] = jnp.mean(d_axis[..., 1])
    metrics["distance_m_z"] = jnp.mean(d_axis[..., 2])
    # ddof=1 (reference torch.std unbiased) NaNs on a single sample (the
    # reference does too, batch-size-1 open loop); report 0 instead so the
    # metrics stay finite and JSON-serializable. Documented divergence.
    std_ddof = 1 if d_norm.size > 1 else 0
    metrics["distance_m_std"] = jnp.std(d_norm, ddof=std_ddof)
    metrics["distance_m_std_x"] = jnp.std(d_axis[..., 0], ddof=std_ddof)
    metrics["distance_m_std_y"] = jnp.std(d_axis[..., 1], ddof=std_ddof)
    metrics["distance_m_std_z"] = jnp.std(d_axis[..., 2], ddof=std_ddof)
    metrics["bias"] = jnp.mean(pred_trans - gt_trans, axis=(0, 1, 2))

    metrics["rot_l1"] = jnp.mean(jnp.sum(jnp.abs(pred_rot - gt_rot), axis=-1))

    q_delta = quaternion_multiply(pred_rot, quaternion_invert(gt_rot))
    angle = jnp.linalg.norm(quaternion_to_axis_angle(q_delta), axis=-1)
    metrics["rot_error_deg"] = jnp.mean(angle * 180.0 / jnp.pi)

    if pred_openness is not None and gt_openness is not None:
        metrics["openness_l1"] = jnp.mean(
            jnp.sum(jnp.abs(pred_openness - gt_openness), axis=-1)
        )
    if predict_head_yaw and head_yaw_pred is not None:
        metrics["head_yaw_error_deg"] = (
            jnp.mean(jnp.abs(head_yaw_pred - gt_head_yaw)) * 180.0 / jnp.pi
        )
    return metrics
