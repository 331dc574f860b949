"""DiffuserActor end-to-end: init, train loss, sampling (tiny shapes, CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvblox_mindmap_tpu.models.diffuser_actor import (
    DiffuserActor,
    DiffuserActorConfig,
    diffusion_train_loss,
    prepare_inputs,
    sample_trajectory,
)
from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType
from tests.jit_helpers import jit_sample

BOUNDS = jnp.asarray([[-0.5, -1.0, 0.0], [1.5, 1.0, 2.0]])


def make_batch(data_type, B=2, nhist=3, L=1, G=1, n_vertices=32, ncam=2, img=16,
               seed=0):
    rng = np.random.default_rng(seed)

    def pose8(shape):
        pos = rng.uniform([-0.4, -0.9, 0.1], [1.4, 0.9, 1.9], size=shape + (3,))
        quat = rng.normal(size=shape + (4,))
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        close = rng.integers(0, 2, size=shape + (1,)).astype(np.float64)
        return jnp.asarray(np.concatenate([pos, quat, close], -1), jnp.float32)

    batch = {
        "gripper_history": pose8((B, nhist, G)),
        "gt_gripper_pred": pose8((B, L, G)),
        "gt_head_yaw": None,
        "instruction": None,
    }
    if data_type in ("mesh", "rgbd_and_mesh"):
        batch["vertices"] = jnp.asarray(
            rng.uniform(-0.4, 0.9, size=(B, n_vertices, 3)), jnp.float32
        )
        batch["vertex_features"] = jnp.asarray(
            rng.normal(size=(B, n_vertices, 3)), jnp.float32
        )
        mask = np.ones((B, n_vertices), dtype=bool)
        mask[:, -4:] = False
        batch["vertices_valid_mask"] = jnp.asarray(mask)
    if data_type in ("rgbd", "rgbd_and_mesh"):
        batch["rgbs"] = jnp.asarray(
            rng.uniform(0, 1, size=(B, ncam, img, img, 3)), jnp.float32
        )
        batch["pcds"] = jnp.asarray(
            rng.uniform(-0.4, 0.9, size=(B, ncam, img, img, 3)), jnp.float32
        )
        batch["pcd_valid_mask"] = jnp.ones((B, ncam, img, img), dtype=bool)
    return batch


def small_config(data_type):
    return DiffuserActorConfig(
        embedding_dim=24,
        num_attn_heads=4,
        data_type=data_type,
        feature_type=FeatureExtractorType.RGB,
        feature_image_size=(8, 8),
        diffusion_timesteps=10,
        fps_subsampling_factor=4,
    )


@pytest.mark.parametrize("data_type", ["mesh", "rgbd", "rgbd_and_mesh"])
def test_train_loss_finite(data_type):
    cfg = small_config(data_type)
    model = DiffuserActor(cfg)
    batch = make_batch(data_type)
    prepared = prepare_inputs(batch, BOUNDS, cfg)
    noisy = jnp.zeros((2, 1, 1, 9))
    ts = jnp.zeros((2,), dtype=jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), prepared, noisy, ts)
    losses = diffusion_train_loss(
        model, variables, prepared, jax.random.PRNGKey(1)
    )
    for name in ("total", "pos", "rot", "gripper"):
        assert np.isfinite(float(losses[name])), name
    assert float(losses["total"]) > 0


def test_sample_trajectory_shapes_and_bounds():
    cfg = small_config("mesh")
    model = DiffuserActor(cfg)
    batch = make_batch("mesh")
    prepared = prepare_inputs(batch, BOUNDS, cfg)
    noisy = jnp.zeros((2, 1, 1, 9))
    ts = jnp.zeros((2,), dtype=jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), prepared, noisy, ts)
    traj, head_yaw, weights = jit_sample(
        model, variables, prepared, jax.random.PRNGKey(2), BOUNDS
    )
    assert traj.shape == (2, 1, 1, 8)
    assert head_yaw is None
    arr = np.asarray(traj)
    assert np.all(np.isfinite(arr))
    # Quaternion part is unit-norm.
    np.testing.assert_allclose(
        np.linalg.norm(arr[..., 3:7], axis=-1), 1.0, atol=1e-4
    )
    # Openness is a probability.
    assert np.all(arr[..., 7] >= 0) and np.all(arr[..., 7] <= 1)
    # Weights over context tokens.
    assert weights.shape[1] == 1


def test_gradients_flow():
    cfg = small_config("mesh")
    model = DiffuserActor(cfg)
    batch = make_batch("mesh")
    prepared = prepare_inputs(batch, BOUNDS, cfg)
    noisy = jnp.zeros((2, 1, 1, 9))
    ts = jnp.zeros((2,), dtype=jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), prepared, noisy, ts)

    def loss_fn(params):
        return diffusion_train_loss(
            model, {"params": params}, prepared, jax.random.PRNGKey(1)
        )["total"]

    # jitted: the eager grad pass is ~45 s of op-by-op dispatch on one CPU
    # core; compiled it runs in seconds and persists in the compile cache.
    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.linalg.norm(g)) for g in leaves]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.5


def test_default_config_param_count():
    """Default config trainable param count is ~3M (reference model card)."""
    cfg = DiffuserActorConfig(data_type="mesh")
    model = DiffuserActor(cfg)
    batch = make_batch("mesh", n_vertices=64)
    # 768-d mesh features for the default RGB feature type? The reconstruction
    # encoder maps whatever dim arrives; use 768 like RADIO.
    rng = np.random.default_rng(1)
    batch["vertex_features"] = jnp.asarray(
        rng.normal(size=(2, 64, 768)), jnp.float32
    )
    prepared = prepare_inputs(batch, BOUNDS, cfg)
    noisy = jnp.zeros((2, 1, 1, 9))
    ts = jnp.zeros((2,), dtype=jnp.int32)
    # Param counting only needs shapes: eval_shape traces without compiling
    # or executing the full-width model (which takes ~20 s on one CPU core).
    variables = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), prepared, noisy, ts
    )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 1_500_000 < n_params < 6_000_000, n_params


def test_instruction_and_lang_enhanced_path():
    """Language conditioning: vision-language attention + lang_enhanced head."""
    cfg = DiffuserActorConfig(
        embedding_dim=24,
        num_attn_heads=4,
        data_type="mesh",
        feature_type=FeatureExtractorType.RGB,
        diffusion_timesteps=4,
        fps_subsampling_factor=4,
        use_instruction=True,
        lang_enhanced=True,
    )
    model = DiffuserActor(cfg)
    batch = make_batch("mesh")
    rng = np.random.default_rng(9)
    batch["instruction"] = jnp.asarray(
        rng.normal(size=(2, 5, 512)), jnp.float32
    )
    prepared = prepare_inputs(batch, BOUNDS, cfg)
    noisy = jnp.zeros((2, 1, 1, 9))
    ts = jnp.zeros((2,), dtype=jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), prepared, noisy, ts)
    losses = diffusion_train_loss(model, variables, prepared, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total"]))
    traj, _, _ = jit_sample(
        model, variables, prepared, jax.random.PRNGKey(2), BOUNDS
    )
    assert traj.shape == (2, 1, 1, 8)
    assert np.all(np.isfinite(np.asarray(traj)))


def test_backbone_chunked_forward_matches_unchunked():
    """backbone_chunk_images is a pure memory lever: the frozen-backbone
    forward over (B*ncam) images in nn.scan chunks must produce the same
    features AND the same param tree as the single full-width forward
    (checkpoints interchange freely between the two settings)."""
    base = DiffuserActorConfig(
        embedding_dim=24,
        num_attn_heads=4,
        data_type="rgbd",
        feature_type=FeatureExtractorType.RADIO_V25_B,
        feature_image_size=(2, 2),
        diffusion_timesteps=10,
        fps_subsampling_factor=4,
    )
    import dataclasses

    chunked_cfg = dataclasses.replace(base, backbone_chunk_images=2)
    batch = make_batch("rgbd", B=2, ncam=2, img=32)
    noisy = jnp.zeros((2, 1, 1, 9))
    ts = jnp.zeros((2,), dtype=jnp.int32)

    prepared = prepare_inputs(batch, BOUNDS, base)
    model = DiffuserActor(base)
    model_chunked = DiffuserActor(chunked_cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), prepared, noisy, ts)
    variables_chunked = jax.jit(model_chunked.init)(
        jax.random.PRNGKey(0), prepared, noisy, ts
    )
    # Identical param trees (paths and shapes) => checkpoint-compatible.
    flat = jax.tree_util.tree_map(jnp.shape, variables["params"])
    flat_chunked = jax.tree_util.tree_map(jnp.shape, variables_chunked["params"])
    assert flat == flat_chunked
    # Same params -> same encoding, chunked or not.
    fixed = model.apply(
        variables,
        prepared.get("rgbs"), prepared.get("pcds"),
        prepared.get("pcd_valid_mask"),
        prepared.get("vertex_features"), prepared.get("vertices"),
        prepared.get("vertices_valid_mask"), prepared.get("instruction"),
        prepared["gripper_history"], prepared["curr_closedness"],
        method=DiffuserActor.encode,
    )
    fixed_chunked = model_chunked.apply(
        variables,  # the UNCHUNKED init's params, applied chunked
        prepared.get("rgbs"), prepared.get("pcds"),
        prepared.get("pcd_valid_mask"),
        prepared.get("vertex_features"), prepared.get("vertices"),
        prepared.get("vertices_valid_mask"), prepared.get("instruction"),
        prepared["gripper_history"], prepared["curr_closedness"],
        method=DiffuserActor.encode,
    )
    # bf16 ViT: chunked batching changes GEMM reduction order, so values
    # drift at bf16-noise scale through 12 layers — bound it loosely here;
    # the RGB-extractor case below pins the chunk plumbing EXACTLY in fp32.
    for a, b in zip(jax.tree_util.tree_leaves(fixed),
                    jax.tree_util.tree_leaves(fixed_chunked)):
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        np.testing.assert_allclose(a, b, atol=0.1)
        assert float(np.mean(np.abs(a - b))) < 2e-2


def test_backbone_chunked_forward_exact_with_fp32_extractor():
    """Chunk reshape/ordering is exact: with the paramless fp32 RGB
    extractor the chunked and unchunked encodings are bit-identical."""
    import dataclasses

    base = small_config("rgbd")
    chunked_cfg = dataclasses.replace(base, backbone_chunk_images=2)
    batch = make_batch("rgbd", B=2, ncam=2)
    prepared = prepare_inputs(batch, BOUNDS, base)
    noisy = jnp.zeros((2, 1, 1, 9))
    ts = jnp.zeros((2,), dtype=jnp.int32)
    model = DiffuserActor(base)
    model_chunked = DiffuserActor(chunked_cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), prepared, noisy, ts)

    def encode(m):
        return m.apply(
            variables,
            prepared.get("rgbs"), prepared.get("pcds"),
            prepared.get("pcd_valid_mask"),
            prepared.get("vertex_features"), prepared.get("vertices"),
            prepared.get("vertices_valid_mask"), prepared.get("instruction"),
            prepared["gripper_history"], prepared["curr_closedness"],
            method=DiffuserActor.encode,
        )

    for a, b in zip(jax.tree_util.tree_leaves(encode(model)),
                    jax.tree_util.tree_leaves(encode(model_chunked))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
