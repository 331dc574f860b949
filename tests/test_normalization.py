"""Normalization round-trips (reference: mindmap/tests/test_normalization.py)."""
import numpy as np

import jax.numpy as jnp

from nvblox_mindmap_tpu.models.normalization import (
    convert_rot,
    normalize_pos,
    normalize_trajectory,
    unconvert_rot,
    unnormalize_pos,
    unnormalize_trajectory,
)

BOUNDS = jnp.asarray([[-0.5, -1.0, 0.0], [1.5, 1.0, 2.0]])


def random_pose_trajectory(shape, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform([-0.4, -0.9, 0.1], [1.4, 0.9, 1.9], size=shape + (3,))
    quat = rng.normal(size=shape + (4,))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    # Standardize sign for comparison.
    quat = np.where(quat[..., :1] < 0, -quat, quat)
    return jnp.asarray(np.concatenate([pos, quat], axis=-1), dtype=jnp.float32)


def test_normalize_pos_roundtrip_and_mask():
    pos = jnp.asarray([[0.0, 0.0, 1.0], [99.0, 0.0, 0.0]])
    scaled, valid = normalize_pos(pos, BOUNDS)
    assert bool(valid[0]) and not bool(valid[1])
    back = unnormalize_pos(scaled, BOUNDS)
    np.testing.assert_allclose(back, pos, atol=1e-5)
    # Bounds map to [-1, 1].
    lo, _ = normalize_pos(BOUNDS[0], BOUNDS)
    hi, _ = normalize_pos(BOUNDS[1], BOUNDS)
    np.testing.assert_allclose(lo, -1.0, atol=1e-6)
    np.testing.assert_allclose(hi, 1.0, atol=1e-6)


def assert_quats_equivalent(a, b, atol=1e-4):
    dot = jnp.abs(jnp.sum(a * b, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=atol)


def test_convert_rot_roundtrip_wxyz():
    traj = random_pose_trajectory((4, 2, 1))
    sig6 = convert_rot(traj, "6D", "wxyz")
    assert sig6.shape[-1] == 9
    back = unconvert_rot(sig6, "6D", "wxyz")
    np.testing.assert_allclose(back[..., :3], traj[..., :3], atol=1e-5)
    assert_quats_equivalent(back[..., 3:7], traj[..., 3:7])


def test_convert_rot_roundtrip_xyzw():
    traj = random_pose_trajectory((4, 2, 1), seed=1)
    # Convert to xyzw input layout.
    xyzw = jnp.concatenate(
        [traj[..., :3], traj[..., (4, 5, 6, 3)]], axis=-1
    )
    sig6 = convert_rot(xyzw, "6D", "xyzw")
    back = unconvert_rot(sig6, "6D", "xyzw")
    np.testing.assert_allclose(back[..., :3], xyzw[..., :3], atol=1e-5)
    assert_quats_equivalent(back[..., 3:7], xyzw[..., 3:7])


def test_trajectory_roundtrip():
    traj = random_pose_trajectory((2, 3, 1), seed=2)
    norm = normalize_trajectory(traj, BOUNDS, "6D", "wxyz")
    assert norm.shape[-1] == 9
    back = unnormalize_trajectory(norm, BOUNDS, "6D", "wxyz")
    np.testing.assert_allclose(back[..., :3], traj[..., :3], atol=1e-4)
    # Quaternions agree up to sign.
    dot = jnp.abs(jnp.sum(back[..., 3:7] * traj[..., 3:7], axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_unnormalize_applies_sigmoid_to_openness():
    traj9 = jnp.zeros((1, 1, 1, 10))  # 9 + openness logit 0
    out = unnormalize_trajectory(traj9, BOUNDS, "6D", "wxyz")
    assert out.shape[-1] == 8
    np.testing.assert_allclose(out[..., 7], 0.5, atol=1e-6)
