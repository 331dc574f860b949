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


def _map_attn_weights(ref_attn):
    """torch in_proj/out_proj -> (Wq, bq, Wk, bk, Wv, bv, out_w, out_b)."""
    in_w = ref_attn.in_proj_weight.detach().numpy()
    in_b = ref_attn.in_proj_bias.detach().numpy()
    Wq, Wk, Wv = np.split(in_w, 3, axis=0)
    bq, bk, bv = np.split(in_b, 3, axis=0)
    out_w = ref_attn.out_proj.weight.detach().numpy()
    out_b = ref_attn.out_proj.bias.detach().numpy()
    return Wq, bq, Wk, bk, Wv, bv, out_w, out_b


def test_slot_competition_matches_reference(reference_modules):
    """slot_competition=True: softmax over queries, renormalized over keys
    (reference multihead_custom_attention.py:495-497).

    Intentional divergence: the reference NaNs when slot_competition is
    combined with a key_padding_mask (a fully -inf key *column* makes the
    query-axis softmax 0/0); it never combines the two in shipped configs.
    Our finite masked logit (-1e9) stays NaN-free, so parity is checked
    unmasked.
    """
    _, mha_mod = reference_modules
    from nvblox_mindmap_tpu.ops.attention import multi_head_attention

    E, H, L, S, B = 24, 4, 5, 9, 2
    torch.manual_seed(1)
    ref_attn = mha_mod.MultiheadCustomAttention(E, H, slot_competition=True).eval()

    rng = np.random.default_rng(7)
    q = rng.normal(size=(L, B, E)).astype(np.float32)
    kv = rng.normal(size=(S, B, E)).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_w = ref_attn(
            torch.from_numpy(q),
            torch.from_numpy(kv),
            torch.from_numpy(kv),
        )
    Wq, bq, Wk, bk, Wv, bv, out_w, out_b = _map_attn_weights(ref_attn)
    q_b = jnp.asarray(np.transpose(q, (1, 0, 2)))
    kv_b = jnp.asarray(np.transpose(kv, (1, 0, 2)))
    attn_out, weights = multi_head_attention(
        q_b @ jnp.asarray(Wq.T) + jnp.asarray(bq),
        kv_b @ jnp.asarray(Wk.T) + jnp.asarray(bk),
        kv_b @ jnp.asarray(Wv.T) + jnp.asarray(bv),
        H,
        slot_competition=True,
    )
    ours = np.asarray(attn_out @ jnp.asarray(out_w.T) + jnp.asarray(out_b))
    np.testing.assert_allclose(
        ours, np.transpose(ref_out.numpy(), (1, 0, 2)), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(weights), ref_w.numpy(), atol=2e-5)


def test_memory_gated_attention_matches_reference(reference_modules):
    """gate_attn + k_mem/v_mem/mem_mask memorizing-transformers path
    (reference multihead_custom_attention.py:507-545)."""
    _, mha_mod = reference_modules
    from nvblox_mindmap_tpu.ops.attention import multi_head_attention

    E, H, L, S, SM, B = 24, 4, 3, 8, 6, 2
    torch.manual_seed(2)
    ref_attn = mha_mod.MultiheadCustomAttention(E, H, gate_attn=True).eval()

    rng = np.random.default_rng(11)
    q = rng.normal(size=(L, B, E)).astype(np.float32)
    kv = rng.normal(size=(S, B, E)).astype(np.float32)
    # Reference memory layout: (B, E, S_mem); already per-head projected.
    k_mem = rng.normal(size=(B, E, SM)).astype(np.float32)
    v_mem = rng.normal(size=(B, E, SM)).astype(np.float32)
    mem_mask = rng.integers(0, 2, size=(B, SM)).astype(np.float32)
    mask = np.zeros((B, S), dtype=bool)
    mask[1, -3:] = True
    with torch.no_grad():
        ref_out, _ = ref_attn(
            torch.from_numpy(q),
            torch.from_numpy(kv),
            torch.from_numpy(kv),
            key_padding_mask=torch.from_numpy(mask),
            k_mem=torch.from_numpy(k_mem),
            v_mem=torch.from_numpy(v_mem),
            mem_mask=torch.from_numpy(mem_mask),
        )
    gate = ref_attn.gate_attn.detach().numpy()
    Wq, bq, Wk, bk, Wv, bv, out_w, out_b = _map_attn_weights(ref_attn)
    q_b = jnp.asarray(np.transpose(q, (1, 0, 2)))
    kv_b = jnp.asarray(np.transpose(kv, (1, 0, 2)))
    attn_out, _ = multi_head_attention(
        q_b @ jnp.asarray(Wq.T) + jnp.asarray(bq),
        kv_b @ jnp.asarray(Wk.T) + jnp.asarray(bk),
        kv_b @ jnp.asarray(Wv.T) + jnp.asarray(bv),
        H,
        key_padding_mask=jnp.asarray(mask),
        k_mem=jnp.asarray(np.transpose(k_mem, (0, 2, 1))),
        v_mem=jnp.asarray(np.transpose(v_mem, (0, 2, 1))),
        mem_mask=jnp.asarray(mem_mask),
        gate_logits=jnp.asarray(gate),
    )
    ours = np.asarray(attn_out @ jnp.asarray(out_w.T) + jnp.asarray(out_b))
    np.testing.assert_allclose(
        ours, np.transpose(ref_out.numpy(), (1, 0, 2)), atol=2e-5
    )


def test_return_kv_matches_reference(reference_modules):
    """return_kv surfaces the post-rotary per-head q/k/v (reference :550-551)."""
    _, mha_mod = reference_modules
    from nvblox_mindmap_tpu.ops.attention import multi_head_attention

    E, H, L, S, B = 24, 4, 3, 7, 2
    torch.manual_seed(3)
    ref_attn = mha_mod.MultiheadCustomAttention(E, H, return_kv=True).eval()

    rng = np.random.default_rng(13)
    q = rng.normal(size=(L, B, E)).astype(np.float32)
    kv = rng.normal(size=(S, B, E)).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_q, ref_k, ref_v = ref_attn(
            torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv)
        )
    Wq, bq, Wk, bk, Wv, bv, out_w, out_b = _map_attn_weights(ref_attn)
    q_b = jnp.asarray(np.transpose(q, (1, 0, 2)))
    kv_b = jnp.asarray(np.transpose(kv, (1, 0, 2)))
    attn_out, qh, kh, vh = multi_head_attention(
        q_b @ jnp.asarray(Wq.T) + jnp.asarray(bq),
        kv_b @ jnp.asarray(Wk.T) + jnp.asarray(bk),
        kv_b @ jnp.asarray(Wv.T) + jnp.asarray(bv),
        H,
        return_kv=True,
    )
    ours = np.asarray(attn_out @ jnp.asarray(out_w.T) + jnp.asarray(out_b))
    np.testing.assert_allclose(
        ours, np.transpose(ref_out.numpy(), (1, 0, 2)), atol=2e-5
    )
    # Reference q/k/v: (B*H, T, head_dim); ours: (B, T, H, head_dim).
    hd = E // H
    for ref_t, ours_h, T in ((ref_q, qh, L), (ref_k, kh, S), (ref_v, vh, S)):
        ref_arr = ref_t.numpy().reshape(B, H, T, hd)
        np.testing.assert_allclose(
            np.asarray(ours_h).transpose(0, 2, 1, 3), ref_arr, atol=2e-5
        )
