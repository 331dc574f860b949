"""Rotation conversions in JAX.

Numerically matches the semantics of the reference's vendored PyTorch3D
conversions (reference: mindmap/geometry/pytorch3d_transforms.py) and its
continuous-6D utilities (reference: mindmap/geometry/utils.py:82-127), since
losses, metrics and the normalization pipeline depend on these exact
conventions:

- Quaternions are real-part-first (wxyz) unless stated otherwise.
- The 6D rotation representation packs the first two *columns* of the
  rotation matrix: ``[a1; a2]`` for ``R = [a1 a2 a3]``.
- Reconstruction from 6D uses the cross-product Gram-Schmidt of
  "On the Continuity of Rotation Representations in Neural Networks"
  (x = norm(b1), z = norm(x x b2), y = z x x; columns (x, y, z)).

All functions are pure, broadcast over leading dims, and safe under jit/vmap.
"""
from __future__ import annotations

import jax.numpy as jnp


def normalise_quat(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize quaternions with a 1e-10 clamp on the norm."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.clip(norm, min=1e-10)


def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so the real part is non-negative."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quaternion_raw_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    ow = aw * bw - ax * bx - ay * by - az * bz
    ox = aw * bx + ax * bw + ay * bz - az * by
    oy = aw * by - ax * bz + ay * bw + az * bx
    oz = aw * bz + ax * by - ay * bx + az * bw
    return jnp.stack((ow, ox, oy, oz), axis=-1)


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose two rotations; result has non-negative real part."""
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a unit quaternion (conjugate)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quaternion_apply(q: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3D points by quaternions (broadcasting)."""
    if point.shape[-1] != 3:
        raise ValueError(f"Points are not 3D: {point.shape}")
    real = jnp.zeros(point.shape[:-1] + (1,), dtype=point.dtype)
    pq = jnp.concatenate([real, point], axis=-1)
    out = quaternion_raw_multiply(quaternion_raw_multiply(q, pq), quaternion_invert(q))
    return out[..., 1:]


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (wxyz) to rotation matrix, shape (..., 3, 3)."""
    r, i, j, k = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with zero subgradient at x == 0."""
    return jnp.where(x > 0, jnp.sqrt(jnp.where(x > 0, x, 1.0)), jnp.zeros_like(x))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix to quaternion (wxyz).

    Picks the best-conditioned of four algebraically equivalent candidates,
    mirroring the reference's behavior (mindmap/geometry/utils.py:207-266) so
    sign conventions agree for metric computation.
    """
    if matrix.shape[-1] != 3 or matrix.shape[-2] != 3:
        raise ValueError(f"Invalid rotation matrix shape {matrix.shape}")
    batch_dim = matrix.shape[:-2]
    m = matrix.reshape(batch_dim + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    flr = jnp.asarray(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    one_hot = jnp.eye(4, dtype=bool)[best]  # (..., 4)
    return jnp.sum(jnp.where(one_hot[..., None], quat_candidates, 0.0), axis=-2)


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    safe_angles = jnp.where(small, 1.0, angles)
    ratio = jnp.where(small, 0.5 - (angles * angles) / 48, jnp.sin(half) / safe_angles)
    return jnp.concatenate([jnp.cos(half), axis_angle * ratio], axis=-1)


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    norms = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norms, q[..., :1])
    angles = 2 * half
    eps = 1e-6
    small = jnp.abs(angles) < eps
    safe_angles = jnp.where(small, 1.0, angles)
    ratio = jnp.where(small, 0.5 - (angles * angles) / 48, jnp.sin(half) / safe_angles)
    return q[..., 1:] / ratio


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def _axis_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError("axis must be X, Y or Z")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jnp.ndarray, convention: str) -> jnp.ndarray:
    """Euler angles (..., 3) to rotation matrices with an intrinsic convention
    string like "XYZ" (matches PyTorch3D: R = R0 @ R1 @ R2)."""
    if euler_angles.shape[-1] != 3:
        raise ValueError("euler_angles must have last dim 3")
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"Invalid convention {convention}")
    mats = [
        _axis_rotation(axis, euler_angles[..., i]) for i, axis in enumerate(convention)
    ]
    return mats[0] @ mats[1] @ mats[2]


def _angle_from_tan(
    axis: str, other_axis: str, data: jnp.ndarray, horizontal: bool, tait_bryan: bool
) -> jnp.ndarray:
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ["XY", "YZ", "ZX"]
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str) -> jnp.ndarray:
    """Inverse of euler_angles_to_matrix (same convention semantics)."""
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"Invalid convention {convention}")
    i0 = "XYZ".index(convention[0])
    i2 = "XYZ".index(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(matrix[..., i0, i2] * (-1.0 if i0 - i2 in [-1, 2] else 1.0), -1, 1)
        )
    else:
        central = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1, 1))
    o = (
        _angle_from_tan(convention[0], convention[1], matrix[..., i2], False, tait_bryan),
        central,
        _angle_from_tan(convention[2], convention[1], matrix[..., i0, :], True, tait_bryan),
    )
    return jnp.stack(o, axis=-1)


def _normalize_vector(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    mag = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(mag, eps)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """6D (first two matrix columns) to rotation matrix.

    Matches the reference's compute_rotation_matrix_from_ortho6d
    (mindmap/geometry/utils.py:82-95): x = norm(b1), z = norm(x cross b2),
    y = z cross x, result columns are (x, y, z).
    """
    x_raw, y_raw = d6[..., 0:3], d6[..., 3:6]
    x = _normalize_vector(x_raw)
    z = _normalize_vector(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix to 6D: the first two columns, flattened column-major.

    Matches get_ortho6d_from_rotation_matrix (mindmap/geometry/utils.py:98-104).
    """
    return jnp.swapaxes(matrix[..., :, :2], -1, -2).reshape(matrix.shape[:-2] + (6,))
