"""Numerical parity against the reference's torch modules.

Executes the reference's standalone attention/positional-encoding modules
(from the read-only checkout at /root/reference, skipped when unavailable)
and cross-checks this framework's ops with identical weights. This pins the
exact rotary-3D layout and custom-attention semantics the trained policies
depend on.
"""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "mindmap")),
    reason="reference checkout not available",
)
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def reference_modules():
    import importlib.util

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        module = importlib.util.module_from_spec(spec)
        sys.modules[name] = module
        spec.loader.exec_module(module)
        return module

    # position_encodings has no mindmap-internal imports; the attention module
    # imports it under the package name.
    pe = load(
        "mindmap.diffuser_actor.position_encodings",
        os.path.join(REFERENCE, "mindmap/diffuser_actor/position_encodings.py"),
    )
    sys.modules.setdefault("mindmap", type(sys)("mindmap"))
    sys.modules.setdefault(
        "mindmap.diffuser_actor", type(sys)("mindmap.diffuser_actor")
    )
    sys.modules["mindmap.diffuser_actor.position_encodings"] = pe
    mha = load(
        "ref_mha",
        os.path.join(
            REFERENCE, "mindmap/diffuser_actor/multihead_custom_attention.py"
        ),
    )
    return pe, mha


def test_rotary_3d_matches_reference(reference_modules):
    pe, _ = reference_modules
    from nvblox_mindmap_tpu.ops.positional import rotary_pe_3d

    feature_dim = 120
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1, 1, size=(2, 7, 3)).astype(np.float32)

    ref_layer = pe.RotaryPositionEncoding3D(feature_dim)
    ref = ref_layer(torch.from_numpy(xyz)).numpy()  # (B, N, F, 2)
    ours = np.asarray(rotary_pe_3d(jnp.asarray(xyz), feature_dim))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_embed_rotary_matches_reference(reference_modules):
    pe, _ = reference_modules
    from nvblox_mindmap_tpu.ops.positional import apply_rotary_code, rotary_pe_3d

    feature_dim = 24
    rng = np.random.default_rng(1)
    xyz = rng.uniform(-1, 1, size=(1, 5, 3)).astype(np.float32)
    x = rng.normal(size=(1, 5, feature_dim)).astype(np.float32)

    code_ref = pe.RotaryPositionEncoding3D(feature_dim)(torch.from_numpy(xyz))
    ref = pe.RotaryPositionEncoding.embed_rotary(
        torch.from_numpy(x), code_ref[..., 0], code_ref[..., 1]
    ).numpy()
    code = rotary_pe_3d(jnp.asarray(xyz), feature_dim)
    ours = np.asarray(apply_rotary_code(jnp.asarray(x), code))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_custom_attention_matches_reference(reference_modules):
    """Same weights + rotary + key padding mask => same outputs & weights."""
    pe, mha_mod = reference_modules
    from nvblox_mindmap_tpu.ops.attention import multi_head_attention
    from nvblox_mindmap_tpu.ops.positional import rotary_pe_3d

    E, H, L, S, B = 24, 4, 3, 10, 2
    torch.manual_seed(0)
    ref_attn = mha_mod.MultiheadCustomAttention(E, H).eval()

    rng = np.random.default_rng(2)
    q = rng.normal(size=(L, B, E)).astype(np.float32)
    kv = rng.normal(size=(S, B, E)).astype(np.float32)
    q_xyz = rng.uniform(-1, 1, size=(B, L, 3)).astype(np.float32)
    k_xyz = rng.uniform(-1, 1, size=(B, S, 3)).astype(np.float32)
    mask = np.zeros((B, S), dtype=bool)
    mask[:, -3:] = True  # exclude last 3 keys

    rot_layer = pe.RotaryPositionEncoding3D(E)
    q_code_t = rot_layer(torch.from_numpy(q_xyz))
    k_code_t = rot_layer(torch.from_numpy(k_xyz))
    with torch.no_grad():
        ref_out, ref_w = ref_attn(
            torch.from_numpy(q),
            torch.from_numpy(kv),
            torch.from_numpy(kv),
            key_padding_mask=torch.from_numpy(mask),
            rotary_pe=(q_code_t, k_code_t),
        )
    ref_out = ref_out.numpy()  # (L, B, E)
    ref_w = ref_w.numpy()  # (B, H, L, S)

    # Map the torch weights onto our projections. in_proj rows: [Wq; Wk; Wv];
    # torch Linear computes x @ W.T, flax kernel is W.T.
    in_w = ref_attn.in_proj_weight.detach().numpy()
    in_b = ref_attn.in_proj_bias.detach().numpy()
    Wq, Wk, Wv = np.split(in_w, 3, axis=0)
    bq, bk, bv = np.split(in_b, 3, axis=0)
    out_w = ref_attn.out_proj.weight.detach().numpy()
    out_b = ref_attn.out_proj.bias.detach().numpy()

    q_b = jnp.asarray(np.transpose(q, (1, 0, 2)))  # (B, L, E)
    kv_b = jnp.asarray(np.transpose(kv, (1, 0, 2)))
    qp = q_b @ jnp.asarray(Wq.T) + jnp.asarray(bq)
    kp = kv_b @ jnp.asarray(Wk.T) + jnp.asarray(bk)
    vp = kv_b @ jnp.asarray(Wv.T) + jnp.asarray(bv)
    q_code = rotary_pe_3d(jnp.asarray(q_xyz), E)
    k_code = rotary_pe_3d(jnp.asarray(k_xyz), E)
    attn_out, weights = multi_head_attention(
        qp, kp, vp, H,
        key_padding_mask=jnp.asarray(mask),
        rotary_codes=(q_code, k_code),
    )
    ours = np.asarray(attn_out @ jnp.asarray(out_w.T) + jnp.asarray(out_b))

    np.testing.assert_allclose(
        ours, np.transpose(ref_out, (1, 0, 2)), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(weights), ref_w, atol=2e-5)
