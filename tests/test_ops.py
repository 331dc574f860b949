"""Ops: rotary PE, attention masking, FPS, masks, backprojection."""
import numpy as np

import jax
import jax.numpy as jnp

from nvblox_mindmap_tpu.ops.attention import multi_head_attention
from nvblox_mindmap_tpu.ops.backprojection import get_camera_pointcloud, pose_to_homo
from nvblox_mindmap_tpu.ops.fps import farthest_point_sampling, gather_points
from nvblox_mindmap_tpu.ops.masks import downscale_mask, erode_mask, get_border_mask
from nvblox_mindmap_tpu.ops.positional import (
    apply_rotary_code,
    rotary_pe_3d,
    sinusoidal_pos_emb,
)


def test_sinusoidal_shape_and_values():
    emb = sinusoidal_pos_emb(jnp.asarray([0.0, 1.0]), 60)
    assert emb.shape == (2, 60)
    # At position 0: sin part 0, cos part 1.
    np.testing.assert_allclose(emb[0, :30], 0.0, atol=1e-7)
    np.testing.assert_allclose(emb[0, 30:], 1.0, atol=1e-7)


def test_rotary_3d_shape_and_identity_at_origin():
    xyz = jnp.zeros((2, 5, 3))
    code = rotary_pe_3d(xyz, 120)
    assert code.shape == (2, 5, 120, 2)
    np.testing.assert_allclose(code[..., 0], 1.0, atol=1e-7)  # cos(0)
    np.testing.assert_allclose(code[..., 1], 0.0, atol=1e-7)  # sin(0)
    # Identity rotation at origin.
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 120)), jnp.float32)
    np.testing.assert_allclose(apply_rotary_code(x, code), x, atol=1e-6)


def test_rotary_relative_property():
    """Rotary attention scores depend only on relative positions."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 1, 12)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1, 12)), jnp.float32)

    def score(pos_q, pos_k):
        cq = rotary_pe_3d(jnp.asarray(pos_q, jnp.float32).reshape(1, 1, 3), 12)
        ck = rotary_pe_3d(jnp.asarray(pos_k, jnp.float32).reshape(1, 1, 3), 12)
        qr = apply_rotary_code(q, cq)
        kr = apply_rotary_code(k, ck)
        return float(jnp.sum(qr * kr))

    s1 = score([0.1, 0.2, 0.3], [0.4, 0.1, 0.0])
    offset = [0.5, -0.2, 0.7]
    s2 = score(
        [0.1 + offset[0], 0.2 + offset[1], 0.3 + offset[2]],
        [0.4 + offset[0], 0.1 + offset[1], 0.0 + offset[2]],
    )
    assert abs(s1 - s2) < 1e-4


def test_attention_key_padding_mask():
    """Masked keys receive ~zero attention (reference test_attention_masking)."""
    rng = np.random.default_rng(2)
    B, L, S, E, H = 2, 3, 6, 16, 4
    q = jnp.asarray(rng.normal(size=(B, L, E)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, E)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, E)), jnp.float32)
    mask = jnp.zeros((B, S), dtype=bool).at[:, -2:].set(True)  # exclude last 2
    _, w = multi_head_attention(q, k, v, H, key_padding_mask=mask)
    assert w.shape == (B, H, L, S)
    np.testing.assert_allclose(w[..., -2:], 0.0, atol=1e-6)
    np.testing.assert_allclose(jnp.sum(w, axis=-1), 1.0, atol=1e-5)


def test_attention_all_masked_is_finite():
    q = jnp.ones((1, 2, 8))
    k = jnp.ones((1, 3, 8))
    v = jnp.ones((1, 3, 8))
    mask = jnp.ones((1, 3), dtype=bool)
    out, w = multi_head_attention(q, k, v, 2, key_padding_mask=mask)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.isfinite(np.asarray(w)))


def test_fps_spreads_points():
    """FPS on a line picks the extremes first."""
    pts = jnp.asarray(np.linspace(0, 1, 100)[:, None] * np.ones((1, 3)))[None]
    idx = farthest_point_sampling(pts, 3, start_idx=0)
    chosen = sorted(np.asarray(idx[0]).tolist())
    assert chosen[0] == 0 and chosen[-1] == 99  # endpoints
    assert abs(chosen[1] - 50) <= 1  # midpoint next


def test_fps_gather():
    vals = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    idx = jnp.asarray([[0, 2], [4, 1]], dtype=jnp.int32)
    out = gather_points(vals, idx)
    np.testing.assert_allclose(out[0, 1], vals[0, 2])
    np.testing.assert_allclose(out[1, 0], vals[1, 4])


def test_erode_mask():
    mask = jnp.ones((7, 7), dtype=bool).at[3, 3].set(False)
    eroded = erode_mask(mask, kernel_size=3, iterations=1)
    # The False expands to a 3x3 region.
    assert not bool(eroded[2, 2]) and not bool(eroded[4, 4])
    assert bool(eroded[0, 0])


def test_border_mask():
    mask = get_border_mask((100, 100), 5)
    assert not bool(mask[0, 50]) and not bool(mask[50, 0])
    assert bool(mask[50, 50])


def test_downscale_mask_and_semantics():
    mask = jnp.ones((1, 1, 4, 4), dtype=bool).at[0, 0, 0, 0].set(False)
    down = downscale_mask(mask, 2)
    assert down.shape == (1, 1, 2, 2)
    assert not bool(down[0, 0, 0, 0])  # any False in block -> False
    assert bool(down[0, 0, 1, 1])


def test_backprojection_identity_pose():
    H = W = 4
    f = 2.0
    intr = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    depth = jnp.full((H, W), 2.0)
    pos = jnp.zeros(3)
    quat = jnp.asarray([1.0, 0, 0, 0])  # identity, wxyz
    pcd = get_camera_pointcloud(intr, depth, pos, quat)
    assert pcd.shape == (H, W, 3)
    # Center pixel at (2,2): x = (2 - 2)/2 * 2 = 0.
    np.testing.assert_allclose(pcd[2, 2], [0.0, 0.0, 2.0], atol=1e-6)
    # Pixel (0,0): x = (0-2)/2*2 = -2, y = -2.
    np.testing.assert_allclose(pcd[0, 0], [-2.0, -2.0, 2.0], atol=1e-6)


def test_pose_to_homo_translation_rotation():
    pos = jnp.asarray([[1.0, 2.0, 3.0]])
    quat = jnp.asarray([[np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]])  # 90deg z
    T = pose_to_homo(pos, quat)
    assert T.shape == (1, 4, 4)
    np.testing.assert_allclose(T[0, :3, 3], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(T[0, 3], [0, 0, 0, 1], atol=1e-6)
    # Rotation of x-axis by 90deg about z -> y-axis.
    np.testing.assert_allclose(T[0, :3, 0], [0, 1, 0], atol=1e-6)


def test_slot_competition_mask_excludes_padded_keys():
    """Masked keys carry zero weight under slot competition (the reference
    NaNs on this combination; we zero the masked columns before the key-axis
    renormalization)."""
    import jax.numpy as jnp

    from nvblox_mindmap_tpu.ops.attention import multi_head_attention

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(2, 4, 8)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(2, 6, 8)), jnp.float32)
    mask = np.zeros((2, 6), bool)
    mask[:, -2:] = True
    out, w = multi_head_attention(
        q, kv, kv, 2, key_padding_mask=jnp.asarray(mask), slot_competition=True
    )
    w = np.asarray(w)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(w[..., -2:], 0.0, atol=1e-12)
    np.testing.assert_allclose(w.sum(axis=-1), 1.0, atol=1e-5)


def test_memory_without_gate_is_loud():
    import jax.numpy as jnp
    import pytest

    from nvblox_mindmap_tpu.ops.attention import multi_head_attention

    x = jnp.zeros((1, 2, 8))
    with pytest.raises(ValueError, match="gate_logits"):
        multi_head_attention(x, x, x, 2, k_mem=x, v_mem=x)
    with pytest.raises(ValueError, match="gate_logits"):
        multi_head_attention(x, x, x, 2, k_mem=x, gate_logits=jnp.zeros(2))
