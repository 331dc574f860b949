"""Relative-pose conversions and SE3 augmentation invariants
(reference: tests/test_relative_conversions.py,
test_random_transform_augmentation.py)."""
import numpy as np

import jax.numpy as jnp

from nvblox_mindmap_tpu.data.transforms import (
    GeometryAugmentor,
    GeometryNoiser,
    apply_transform_to_sample,
)
from nvblox_mindmap_tpu.geometry.np_rotations import quat_apply, quat_multiply
from nvblox_mindmap_tpu.models.diffuser_actor import (
    DiffuserActorConfig,
    prepare_inputs,
)

BOUNDS = jnp.asarray([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])


def random_pose8(rng, shape):
    pos = rng.uniform(-0.5, 0.5, size=shape + (3,))
    quat = rng.normal(size=shape + (4,))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    close = rng.integers(0, 2, size=shape + (1,)).astype(float)
    return np.concatenate([pos, quat, close], -1).astype(np.float32)


def test_relative_mode_translates_history_and_gt():
    rng = np.random.default_rng(0)
    cfg = DiffuserActorConfig(data_type="mesh", relative=True,
                              diffusion_timesteps=4)
    batch = {
        "gripper_history": jnp.asarray(random_pose8(rng, (2, 3, 1))),
        "gt_gripper_pred": jnp.asarray(random_pose8(rng, (2, 1, 1))),
        "vertices": jnp.asarray(rng.uniform(-0.5, 0.5, (2, 16, 3)),
                                jnp.float32),
        "vertex_features": jnp.asarray(rng.normal(size=(2, 16, 8)), jnp.float32),
        "vertices_valid_mask": jnp.ones((2, 16), dtype=bool),
    }
    prepared = prepare_inputs(batch, BOUNDS, cfg)
    # The current (last) history pose normalizes to the workspace center
    # after relative translation: position becomes 0 -> normalized 0.
    hist = np.asarray(prepared["gripper_history"])
    np.testing.assert_allclose(hist[:, -1, :, :3], 0.0, atol=1e-5)
    # current_pose is preserved for the inverse transform.
    np.testing.assert_allclose(
        np.asarray(prepared["current_pose"]),
        np.asarray(batch["gripper_history"])[:, -1, :, :7],
        atol=1e-6,
    )


def test_augmentor_shared_transform_preserves_relative_geometry():
    """One SE3 draw applies to all items: relative distances are invariant."""
    rng_np = np.random.default_rng(1)
    augmentor = GeometryAugmentor(
        ([-0.1, -0.1, 0.0], [0.1, 0.1, 0.0]),
        ([0.0, 0.0, -90.0], [0.0, 0.0, 90.0]),
        np.random.default_rng(7),
    )
    poses = random_pose8(rng_np, (5,))
    vertices = rng_np.uniform(-0.5, 0.5, (20, 3)).astype(np.float32)

    augmentor.reset()
    poses_t = augmentor(poses.copy())
    verts_t = augmentor({"vertices": vertices.copy()})["vertices"]

    # Pairwise pose-pose and pose-vertex distances unchanged (rigid motion).
    d_before = np.linalg.norm(poses[:, None, :3] - vertices[None, :, :], axis=-1)
    d_after = np.linalg.norm(poses_t[:, None, :3] - verts_t[None, :, :], axis=-1)
    np.testing.assert_allclose(d_after, d_before, atol=1e-5)
    # Gripper state untouched.
    np.testing.assert_array_equal(poses_t[:, 7], poses[:, 7])
    # Quaternions stay unit.
    np.testing.assert_allclose(
        np.linalg.norm(poses_t[:, 3:7], axis=-1), 1.0, atol=1e-5
    )
    # A reset draws a different transform.
    augmentor.reset()
    poses_t2 = augmentor(poses.copy())
    assert not np.allclose(poses_t2, poses_t)


def test_apply_transform_matches_manual():
    rng = np.random.default_rng(2)
    pose = random_pose8(rng, (1,))
    t = np.asarray([0.1, -0.2, 0.3])
    q = np.asarray([np.cos(0.2), 0, 0, np.sin(0.2)])
    out = apply_transform_to_sample(pose, t, q)
    np.testing.assert_allclose(
        out[0, :3], quat_apply(q, pose[0, :3]) + t, atol=1e-6
    )
    from nvblox_mindmap_tpu.geometry.np_rotations import quat_standardize

    np.testing.assert_allclose(
        out[0, 3:7],
        quat_standardize(quat_multiply(q, pose[0, 3:7])),
        atol=1e-6,
    )


def test_noiser_perturbs_per_element():
    rng = np.random.default_rng(3)
    noiser = GeometryNoiser(0.01, 1.0, np.random.default_rng(11))
    vertices = rng.uniform(-0.5, 0.5, (100, 3)).astype(np.float32)
    out = noiser({"vertices": vertices.copy()})["vertices"]
    deltas = np.linalg.norm(out - vertices, axis=-1)
    assert deltas.std() > 0  # element-wise independent noise
    assert deltas.mean() < 0.05


def test_encode_goal_gripper_shape():
    import jax

    from nvblox_mindmap_tpu.models.encoder import Encoder

    enc = Encoder(embedding_dim=24, num_attn_heads=4, data_type="mesh",
                  feature_type="rgb")
    rng = np.random.default_rng(4)
    context_feats = jnp.asarray(rng.normal(size=(2, 16, 24)), jnp.float32)
    context = jnp.asarray(rng.uniform(-1, 1, (2, 16, 3)), jnp.float32)
    goal = jnp.asarray(rng.uniform(-1, 1, (2, 7)), jnp.float32)
    variables = enc.init(
        jax.random.PRNGKey(0), goal, context_feats, context,
        method=Encoder.encode_goal_gripper,
    )
    feats, pos = enc.apply(
        variables, goal, context_feats, context,
        method=Encoder.encode_goal_gripper,
    )
    assert feats.shape == (2, 1, 24)
    assert pos.shape == (2, 1, 24, 2)
