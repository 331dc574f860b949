"""Learning sanity: the diffusion policy can overfit a single keypose.

The strongest end-to-end correctness signal short of task success: train on
one fixed sample until the sampled keypose approaches the ground truth.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.jit_helpers import jit_sample

from nvblox_mindmap_tpu.models.diffuser_actor import (
    DiffuserActor,
    DiffuserActorConfig,
    diffusion_train_loss,
    prepare_inputs,
    sample_trajectory,
)
from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType

BOUNDS = jnp.asarray([[-0.5, -1.0, 0.0], [1.5, 1.0, 2.0]])


@pytest.mark.slow
def test_overfit_single_keypose():
    import optax

    cfg = DiffuserActorConfig(
        embedding_dim=24,
        num_attn_heads=4,
        data_type="mesh",
        feature_type=FeatureExtractorType.RGB,
        diffusion_timesteps=20,
        fps_subsampling_factor=4,
    )
    model = DiffuserActor(cfg)
    rng = np.random.default_rng(0)

    B = 16  # replicate the sample: many (t, eps) draws per optimizer step
    gt_pos = np.asarray([0.7, 0.2, 1.1])
    gt = np.concatenate([gt_pos, [1, 0, 0, 0], [1.0]]).astype(np.float32)
    batch = {
        "gripper_history": jnp.asarray(
            np.tile(
                np.concatenate([[0.4, 0.0, 0.9], [1, 0, 0, 0], [0.0]]),
                (B, 3, 1, 1),
            ),
            jnp.float32,
        ),
        "gt_gripper_pred": jnp.asarray(np.tile(gt, (B, 1, 1, 1)), jnp.float32),
        "vertices": jnp.asarray(
            np.tile(rng.uniform(0, 1, (1, 32, 3)), (B, 1, 1)), jnp.float32
        ),
        "vertex_features": jnp.asarray(
            np.tile(rng.normal(size=(1, 32, 8)), (B, 1, 1)), jnp.float32
        ),
        "vertices_valid_mask": jnp.ones((B, 32), dtype=bool),
    }
    prepared = prepare_inputs(batch, BOUNDS, cfg)
    noisy = jnp.zeros((B, 1, 1, 9))
    ts = jnp.zeros((B,), dtype=jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), prepared, noisy, ts)
    params = variables["params"]

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            return diffusion_train_loss(
                model, {"params": p}, prepared, key
            )["total"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    first_loss = None
    for i in range(1500):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if first_loss is None:
            first_loss = float(loss)
    final_loss = float(loss)
    assert final_loss < first_loss * 0.6, (first_loss, final_loss)

    traj, _, _ = jit_sample(
        model, {"params": params}, prepared, jax.random.PRNGKey(2), BOUNDS,
        scheduler_kind="ddim", stochastic=False,
    )
    pred_pos = np.asarray(traj)[0, 0, 0, :3]
    start_pos = np.asarray([0.4, 0.0, 0.9])
    # A short overfit run lands the prediction clearly closer to the GT
    # keypose than an uninformed guess at the workspace scale.
    assert np.linalg.norm(pred_pos - gt_pos) < 0.8, (pred_pos, gt_pos)
    # Openness learned closed.
    assert float(traj[0, 0, 0, 7]) > 0.5
