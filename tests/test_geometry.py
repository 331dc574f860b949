"""Geometry conversions: round-trips and cross-checks against the reference
conventions (quaternion wxyz, 6D = first two rotation-matrix columns)."""
import numpy as np
import pytest

import jax.numpy as jnp

from nvblox_mindmap_tpu.geometry import (
    euler_angles_to_matrix,
    matrix_to_quaternion,
    matrix_to_rotation_6d,
    normalise_quat,
    quaternion_apply,
    quaternion_invert,
    quaternion_multiply,
    quaternion_to_axis_angle,
    quaternion_to_matrix,
    rotation_6d_to_matrix,
)


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_matrix_roundtrip():
    q = jnp.asarray(random_quats(64))
    m = quaternion_to_matrix(q)
    # Orthonormality.
    eye = jnp.broadcast_to(jnp.eye(3), m.shape)
    np.testing.assert_allclose(m @ jnp.swapaxes(m, -1, -2), eye, atol=1e-5)
    q2 = matrix_to_quaternion(m)
    # Same rotation up to sign.
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_rotation_6d_roundtrip():
    q = jnp.asarray(random_quats(64, seed=1))
    m = quaternion_to_matrix(q)
    d6 = matrix_to_rotation_6d(m)
    m2 = rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(m, m2, atol=1e-5)


def test_rotation_6d_layout_is_columns():
    # 90 deg about z: columns are (0,1,0), (-1,0,0), (0,0,1).
    m = jnp.asarray(
        [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
    )
    d6 = matrix_to_rotation_6d(m)
    np.testing.assert_allclose(d6, [0, 1, 0, -1, 0, 0], atol=1e-6)


def test_quaternion_apply_matches_matrix():
    q = jnp.asarray(random_quats(16, seed=2))
    pts = jnp.asarray(np.random.default_rng(3).normal(size=(16, 3)))
    via_quat = quaternion_apply(q, pts)
    via_mat = jnp.einsum("nij,nj->ni", quaternion_to_matrix(q), pts)
    np.testing.assert_allclose(via_quat, via_mat, atol=1e-5)


def test_quaternion_multiply_invert():
    q = jnp.asarray(random_quats(16, seed=4))
    prod = quaternion_multiply(q, quaternion_invert(q))
    identity = jnp.zeros_like(prod).at[..., 0].set(1.0)
    np.testing.assert_allclose(prod, identity, atol=1e-5)


def test_quaternion_to_axis_angle_magnitude():
    angle = 0.7
    q = jnp.asarray([[np.cos(angle / 2), np.sin(angle / 2), 0.0, 0.0]])
    aa = quaternion_to_axis_angle(q)
    np.testing.assert_allclose(jnp.linalg.norm(aa, axis=-1), [angle], atol=1e-6)


def test_euler_angles_to_matrix_xyz():
    # 90 deg about Z only.
    e = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    m = euler_angles_to_matrix(e, "XYZ")
    expected = np.array([[[0, -1, 0], [1, 0, 0], [0, 0, 1]]], dtype=np.float32)
    np.testing.assert_allclose(m, expected, atol=1e-6)


def test_normalise_quat_zero_safe():
    q = jnp.zeros((2, 4))
    out = normalise_quat(q)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("seed", [0, 1])
def test_matrix_to_quaternion_vs_torch_reference(seed):
    """Cross-check against an independent (scipy-free) construction."""
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    theta = rng.uniform(0, np.pi)
    q_ref = np.concatenate([[np.cos(theta / 2)], np.sin(theta / 2) * axis])
    m = quaternion_to_matrix(jnp.asarray(q_ref))
    q_back = np.asarray(matrix_to_quaternion(m))
    np.testing.assert_allclose(np.abs(np.dot(q_ref, q_back)), 1.0, atol=1e-6)


def test_gram_schmidt_orthonormalizes():
    from nvblox_mindmap_tpu.geometry.pointcloud_utils import (
        orthonormalize_by_gram_schmidt,
    )

    rng = np.random.default_rng(5)
    m = jnp.asarray(rng.normal(size=(4, 3, 3)) + np.eye(3) * 2)
    out = orthonormalize_by_gram_schmidt(m)
    eye = jnp.broadcast_to(jnp.eye(3), out.shape)
    np.testing.assert_allclose(
        jnp.swapaxes(out, -1, -2) @ out, eye, atol=1e-5
    )


def test_rotation_from_svd_recovers_rotation():
    from nvblox_mindmap_tpu.geometry.pointcloud_utils import rotation_from_svd

    q = jnp.asarray(random_quats(1, seed=6))
    R_true = quaternion_to_matrix(q)[0]
    rng = np.random.default_rng(7)
    pts2 = jnp.asarray(rng.normal(size=(50, 3)))
    pts1 = pts2 @ R_true.T
    R = rotation_from_svd(pts1, pts2)
    np.testing.assert_allclose(R, R_true, atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)


def test_ghost_point_samplers():
    from nvblox_mindmap_tpu.geometry.pointcloud_utils import (
        sample_ghost_points_grid,
        sample_ghost_points_uniform_cube,
        sample_ghost_points_uniform_sphere,
    )

    bounds = ([0, 0, 0], [1, 2, 3])
    grid = sample_ghost_points_grid(bounds, 5)
    assert grid.shape == (125, 3)
    assert grid.min() >= 0 and grid[:, 2].max() <= 3

    rng = np.random.default_rng(8)
    cube = sample_ghost_points_uniform_cube(bounds, 100, rng)
    assert cube.shape == (100, 3)
    sphere = sample_ghost_points_uniform_sphere(
        [0.5, 1.0, 1.5], 0.5, bounds, 50, rng
    )
    assert sphere.shape == (50, 3)
    assert np.all(np.linalg.norm(sphere - [0.5, 1.0, 1.5], axis=1) < 0.5)
