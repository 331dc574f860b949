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
