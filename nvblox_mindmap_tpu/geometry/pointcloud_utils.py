"""Geometry utilities: orthonormalization, SVD rotation fitting, ghost points.

(reference: mindmap/geometry/utils.py:24-161) jnp implementations of the
remaining geometry helpers used by analysis and augmentation code.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def orthonormalize_by_gram_schmidt(matrix: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt over the columns of (..., 3, 3) matrices."""
    a1, a2, a3 = matrix[..., :, 0], matrix[..., :, 1], matrix[..., :, 2]

    def normalize(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    b1 = normalize(a1)
    b2 = normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = a3 - jnp.sum(b1 * a3, axis=-1, keepdims=True) * b1
    b3 = normalize(b3 - jnp.sum(b2 * a3, axis=-1, keepdims=True) * b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotation_from_svd(
    points1: jnp.ndarray,
    points2: jnp.ndarray,
    center1: Optional[jnp.ndarray] = None,
    center2: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Best-fit rotation R with points1 ~ R @ points2 (Kabsch).

    Args:
        points1, points2: (..., N, 3) corresponding point sets.
        center1/center2: optional centers; default = centroids.

    Returns:
        (..., 3, 3) rotation matrices (det +1 enforced).
    """
    p1 = points1 - (
        points1.mean(axis=-2, keepdims=True) if center1 is None else center1[..., None, :]
    )
    p2 = points2 - (
        points2.mean(axis=-2, keepdims=True) if center2 is None else center2[..., None, :]
    )
    H = jnp.swapaxes(p2, -2, -1) @ p1
    U, _, Vh = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vh, -2, -1)
    R = V @ jnp.swapaxes(U, -2, -1)
    det = jnp.linalg.det(R)
    V_fixed = jnp.concatenate(
        [V[..., :2], (jnp.sign(det)[..., None, None] * V[..., 2:])], axis=-1
    )
    return V_fixed @ jnp.swapaxes(U, -2, -1)


def sample_ghost_points_grid(bounds, num_points_per_dim: int = 10) -> np.ndarray:
    """Regular grid of points over a (2, 3) AABB -> (n^3, 3)."""
    axes = [
        np.linspace(bounds[0][i], bounds[1][i], num_points_per_dim)
        for i in range(3)
    ]
    grid = np.meshgrid(*axes, indexing="ij")
    return np.stack(grid, axis=-1).reshape(-1, 3)


def sample_ghost_points_uniform_cube(
    bounds, num_points: int = 1000, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    rng = rng or np.random.default_rng()
    return rng.uniform(bounds[0], bounds[1], size=(num_points, 3))


def sample_ghost_points_uniform_sphere(
    center,
    radius: float,
    bounds,
    num_points: int = 1000,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Rejection-sample uniform points within a sphere intersected with bounds."""
    rng = rng or np.random.default_rng()
    out = np.empty((0, 3))
    center = np.asarray(center)
    while out.shape[0] < num_points:
        pts = sample_ghost_points_uniform_cube(bounds, num_points, rng)
        keep = np.linalg.norm(pts - center, axis=1) < radius
        out = np.concatenate([out, pts[keep]])
    return out[:num_points]
