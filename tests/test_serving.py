"""Sharded batch inference: 8-device mesh result == single-device result."""
import numpy as np

import jax
import jax.numpy as jnp

from nvblox_mindmap_tpu.models.diffuser_actor import (
    DiffuserActor,
    DiffuserActorConfig,
    prepare_inputs,
    sample_trajectory,
)
from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType
from nvblox_mindmap_tpu.parallel.mesh import make_data_mesh
from nvblox_mindmap_tpu.parallel.serving import make_sharded_infer_fn
from tests.jit_helpers import jit_sample

BOUNDS = np.asarray([[-0.5, -1.0, 0.0], [1.5, 1.0, 2.0]], dtype=np.float32)


def small_model():
    cfg = DiffuserActorConfig(
        embedding_dim=24,
        num_attn_heads=4,
        data_type="mesh",
        feature_type=FeatureExtractorType.RGB,
        diffusion_timesteps=4,
        fps_subsampling_factor=4,
    )
    return DiffuserActor(cfg)


def make_batch(batch_size=8, n_vertices=32):
    rng = np.random.default_rng(0)

    def pose8(shape):
        pos = rng.uniform(-0.4, 0.9, size=shape + (3,))
        quat = rng.normal(size=shape + (4,))
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        close = rng.integers(0, 2, size=shape + (1,)).astype(np.float64)
        return np.concatenate([pos, quat, close], -1).astype(np.float32)

    return {
        "gripper_history": pose8((batch_size, 3, 1)),
        "vertices": rng.uniform(
            -0.4, 0.9, size=(batch_size, n_vertices, 3)
        ).astype(np.float32),
        "vertex_features": rng.normal(size=(batch_size, n_vertices, 8)).astype(
            np.float32
        ),
        "vertices_valid_mask": np.ones((batch_size, n_vertices), bool),
    }


def test_sharded_inference_matches_single_device():
    assert jax.device_count() == 8
    model = small_model()
    bounds = jnp.asarray(BOUNDS)
    batch = make_batch(8)
    key = jax.random.PRNGKey(0)

    init_batch = {k: jnp.asarray(v)[:1] for k, v in batch.items()}
    prepared = prepare_inputs(init_batch, bounds, model.config)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1), prepared, jnp.zeros((1, 1, 1, 9)),
        jnp.zeros((1,), jnp.int32),
    )
    params = variables["params"]

    mesh = make_data_mesh()
    infer = make_sharded_infer_fn(model, bounds, mesh)
    traj_sharded, yaw_sharded, w_sharded = infer(params, batch, key)
    # Output is sharded over 8 devices on the leading axis.
    assert len(traj_sharded.sharding.device_set) == 8

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    prepared_full = prepare_inputs(jbatch, bounds, model.config)
    traj_ref, _, w_ref = jit_sample(
        model, {"params": params}, prepared_full, key, bounds
    )
    np.testing.assert_allclose(
        np.asarray(traj_sharded), np.asarray(traj_ref), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(w_sharded), np.asarray(w_ref), atol=2e-4
    )


def test_sharded_inference_rejects_indivisible_batch():
    import pytest

    model = small_model()
    mesh = make_data_mesh()
    infer = make_sharded_infer_fn(model, jnp.asarray(BOUNDS), mesh)
    with pytest.raises(ValueError, match="not divisible"):
        infer({}, make_batch(6), jax.random.PRNGKey(0))


def test_sharded_ddim_serving_mode():
    model = small_model()
    mesh = make_data_mesh()
    infer = make_sharded_infer_fn(
        model, jnp.asarray(BOUNDS), mesh,
        num_inference_steps=2, scheduler_kind="ddim",
    )
    batch = make_batch(8)
    init_batch = {k: jnp.asarray(v)[:1] for k, v in batch.items()}
    prepared = prepare_inputs(init_batch, jnp.asarray(BOUNDS), model.config)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1), prepared, jnp.zeros((1, 1, 1, 9)),
        jnp.zeros((1,), jnp.int32),
    )
    traj, _, _ = infer(variables["params"], batch, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(traj)).all()
