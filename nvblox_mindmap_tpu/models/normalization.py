"""Workspace normalization and rotation re-parametrization.

Semantics match the reference (mindmap/model_utils/normalization.py):

- Positions are affinely mapped from workspace AABB to [-1, 1]; a validity
  mask marks points inside the bounds.
- Trajectory rotations arrive as quaternions (wxyz or xyzw per config) and are
  converted to the continuous 6D representation (first two rotation-matrix
  columns) for diffusion; openness logits get a sigmoid on unnormalize.

All functions are pure jnp and shape-polymorphic over leading dims.
Trajectory layout: (..., 3 pos + 4 quat [+ extras]) in, (..., 3 + 6 [+ extras])
out.

Intentional divergence: the reference's unnormalize_trajectory, when called
with its production default rotation_parametrization "6D_from_query"
(cli/args.py:64), L2-normalizes dims 3:7 - the first FOUR of the six 6D
coords - before Gram-Schmidt (normalization.py:102, an area its own comments
flag as buggy), skewing the second basis vector. Here every "6D*" string gets
the clean "6D" semantics; tests/test_reference_semantics_parity.py pins both
the parity and this divergence.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from nvblox_mindmap_tpu.geometry.rotations import (
    matrix_to_quaternion,
    matrix_to_rotation_6d,
    normalise_quat,
    quaternion_to_matrix,
    rotation_6d_to_matrix,
)


def normalize_pos(
    pos: jnp.ndarray, workspace_bounds: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scale positions into [-1, 1] over the workspace AABB.

    Args:
        pos: (..., 3).
        workspace_bounds: (2, 3) [min; max].

    Returns:
        (scaled positions, (...,) bool in-bounds mask).
    """
    pos_min = workspace_bounds[0].astype(pos.dtype)
    pos_max = workspace_bounds[1].astype(pos.dtype)
    valid = jnp.all((pos >= pos_min) & (pos <= pos_max), axis=-1)
    return (pos - pos_min) / (pos_max - pos_min) * 2.0 - 1.0, valid


def unnormalize_pos(pos: jnp.ndarray, workspace_bounds: jnp.ndarray) -> jnp.ndarray:
    pos_min = workspace_bounds[0].astype(pos.dtype)
    pos_max = workspace_bounds[1].astype(pos.dtype)
    return (pos + 1.0) / 2.0 * (pos_max - pos_min) + pos_min


def normalize_pointcloud(
    pcd: jnp.ndarray, workspace_bounds: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Channel-last point clouds (..., H, W, 3) -> normalized + validity mask."""
    return normalize_pos(pcd, workspace_bounds)


def convert_rot(
    signal: jnp.ndarray, rotation_parametrization: str = "6D", quaternion_format: str = "wxyz"
) -> jnp.ndarray:
    """Quaternion pose signal -> 6D rotation signal.

    signal: (..., 3 + 4 [+ extras]). Output: (..., 3 + 6 [+ extras]).
    """
    quat = normalise_quat(signal[..., 3:7])
    if "6D" not in rotation_parametrization:
        return jnp.concatenate([signal[..., :3], quat, signal[..., 7:]], axis=-1)
    if quaternion_format == "xyzw":
        quat = quat[..., (3, 0, 1, 2)]
    rot_6d = matrix_to_rotation_6d(quaternion_to_matrix(quat))
    return jnp.concatenate([signal[..., :3], rot_6d, signal[..., 7:]], axis=-1)


def unconvert_rot(
    signal: jnp.ndarray, rotation_parametrization: str = "6D", quaternion_format: str = "wxyz"
) -> jnp.ndarray:
    """6D rotation signal -> quaternion pose signal (inverse of convert_rot)."""
    if "6D" not in rotation_parametrization:
        return signal
    quat = matrix_to_quaternion(rotation_6d_to_matrix(signal[..., 3:9]))
    if quaternion_format == "xyzw":
        quat = quat[..., (1, 2, 3, 0)]
    return jnp.concatenate([signal[..., :3], quat, signal[..., 9:]], axis=-1)


def normalize_trajectory(
    trajectory: jnp.ndarray,
    workspace_bounds: jnp.ndarray,
    rotation_parametrization: str = "6D",
    quaternion_format: str = "wxyz",
) -> jnp.ndarray:
    """Pose trajectory (..., 7) -> normalized (..., 9)."""
    assert trajectory.shape[-1] == 7
    pos, _ = normalize_pos(trajectory[..., :3], workspace_bounds)
    out = convert_rot(
        jnp.concatenate([pos, trajectory[..., 3:]], axis=-1),
        rotation_parametrization,
        quaternion_format,
    )
    assert out.shape[-1] == 9
    return out


def unnormalize_trajectory(
    trajectory: jnp.ndarray,
    workspace_bounds: jnp.ndarray,
    rotation_parametrization: str = "6D",
    quaternion_format: str = "wxyz",
) -> jnp.ndarray:
    """Normalized (..., 9 [+ openness]) -> pose (..., 7 [+ openness prob])."""
    if "6D" not in rotation_parametrization:
        quat = normalise_quat(trajectory[..., 3:7])
        trajectory = jnp.concatenate(
            [trajectory[..., :3], quat, trajectory[..., 7:]], axis=-1
        )
    out = unconvert_rot(trajectory, rotation_parametrization, quaternion_format)
    pos = unnormalize_pos(out[..., :3], workspace_bounds)
    rest = out[..., 3:]
    if rest.shape[-1] > 4:
        # Openness logits -> probability.
        openness = jax.nn.sigmoid(rest[..., 4:5])
        rest = jnp.concatenate([rest[..., :4], openness, rest[..., 5:]], axis=-1)
    return jnp.concatenate([pos, rest], axis=-1)
