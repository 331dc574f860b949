"""Flash attention kernel vs the XLA reference path (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvblox_mindmap_tpu.ops.attention import multi_head_attention
from nvblox_mindmap_tpu.ops.flash_attention import flash_attention


def reference_attention(q, k, v, inclusion_mask=None):
    s = jnp.einsum("bhld,bhsd->bhls", q, k)
    if inclusion_mask is not None:
        s = jnp.where(inclusion_mask[:, None, None, :], s, -1e9)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhls,bhsd->bhld", w, v)


@pytest.mark.parametrize("L,S,D", [(16, 64, 32), (100, 130, 15)])
def test_flash_matches_reference(L, S, D):
    rng = np.random.default_rng(0)
    B, H = 2, 3
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, S)) > 0.3)

    ref = reference_attention(q, k, v, mask)
    out = flash_attention(q, k, v, key_padding_mask=mask, block_q=32,
                          block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_no_mask():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 32, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 32, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 32, 16)), jnp.float32)
    ref = reference_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_mha_flash_impl_matches_xla():
    """The model-level entry point: flash vs xla implementations agree."""
    rng = np.random.default_rng(2)
    B, L, S, E, H = 2, 8, 24, 32, 4
    q = jnp.asarray(rng.normal(size=(B, L, E)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, E)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, E)), jnp.float32)
    mask = jnp.zeros((B, S), dtype=bool).at[:, -4:].set(True)  # exclusion

    # Note: the pallas path on CPU requires interpret mode; route through the
    # kernel directly with the inclusion mask to emulate impl="flash".
    xla_out, _ = multi_head_attention(q, k, v, H, key_padding_mask=mask,
                                      need_weights=False)
    scaling = (E // H) ** -0.5
    qh = (q * scaling).reshape(B, L, H, E // H).transpose(0, 2, 1, 3)
    kh = k.reshape(B, S, H, E // H).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, H, E // H).transpose(0, 2, 1, 3)
    flash_out = flash_attention(qh, kh, vh, key_padding_mask=~mask,
                                block_q=8, block_k=8, interpret=True)
    flash_out = flash_out.transpose(0, 2, 1, 3).reshape(B, L, E)
    np.testing.assert_allclose(np.asarray(flash_out), np.asarray(xla_out),
                               atol=2e-5)


def test_fully_masked_rows_are_zero():
    """A batch element with NO valid keys outputs exact zeros - independent
    of block/padding sizes (the p*mask form keeps the denominator at 0)."""
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(2, 2, 4, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, 6, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 2, 6, 8)), jnp.float32)
    mask = np.ones((2, 6), bool)
    mask[0] = False
    out = flash_attention(
        q, k, v, key_padding_mask=jnp.asarray(mask), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)
    assert np.abs(np.asarray(out[1])).max() > 0
