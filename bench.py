"""Benchmark: keypose-prediction latency on one TPU chip.

Measures the p50 latency of a full DiffuserActor keypose prediction at the
flagship configuration (2048 mesh vertices x 768-d features, 100 DDPM
denoising steps, embedding dim 120) - the reference's inference hot path
(reference: diffuser_actor.py conditional_sample, 100x DiffusionHead).

Target (BASELINE.md): < 100 ms per keypose on 1 TPU chip.
vs_baseline = 100ms / measured_p50 (>1 means faster than target).

Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nvblox_mindmap_tpu.models.diffuser_actor import (
        DiffuserActor,
        DiffuserActorConfig,
        prepare_inputs,
        sample_trajectory,
    )
    from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType

    cfg = DiffuserActorConfig(
        embedding_dim=120,
        num_attn_heads=8,
        data_type="mesh",
        feature_type=FeatureExtractorType.RGB,
        diffusion_timesteps=100,
        fps_subsampling_factor=5,
    )
    model = DiffuserActor(cfg)
    bounds = jnp.asarray(
        [[-0.37, -0.75, -0.13], [0.95, 0.75, 0.65]], dtype=jnp.float32
    )

    rng = np.random.default_rng(0)
    B, NV, FD = 1, 2048, 768

    def pose8(shape):
        pos = rng.uniform(-0.3, 0.6, size=shape + (3,))
        quat = rng.normal(size=shape + (4,))
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        close = rng.integers(0, 2, size=shape + (1,)).astype(np.float64)
        return np.concatenate([pos, quat, close], -1).astype(np.float32)

    batch = {
        "gripper_history": jnp.asarray(pose8((B, 3, 1))),
        "vertices": jnp.asarray(
            rng.uniform(-0.3, 0.6, size=(B, NV, 3)), dtype=jnp.float32
        ),
        "vertex_features": jnp.asarray(
            rng.normal(size=(B, NV, FD)), dtype=jnp.float32
        ),
        "vertices_valid_mask": jnp.ones((B, NV), dtype=bool),
    }
    noisy = jnp.zeros((B, 1, 1, 9))
    ts = jnp.zeros((B,), dtype=jnp.int32)

    @jax.jit
    def init_fn(key, raw_batch):
        prepared = prepare_inputs(raw_batch, bounds, cfg)
        return model.init(key, prepared, noisy, ts)

    variables = init_fn(jax.random.PRNGKey(0), batch)

    @jax.jit
    def predict(params, batch, key):
        prepared = prepare_inputs(batch, bounds, cfg)
        traj, _, _ = sample_trajectory(
            model, {"params": params}, prepared, key, bounds
        )
        return traj

    params = variables["params"]
    key = jax.random.PRNGKey(1)
    # Warmup / compile.
    jax.block_until_ready(predict(params, batch, key))

    times = []
    for i in range(20):
        key = jax.random.PRNGKey(i)
        t0 = time.perf_counter()
        jax.block_until_ready(predict(params, batch, key))
        times.append(time.perf_counter() - t0)
    p50_ms = float(np.percentile(times, 50) * 1000)

    print(
        json.dumps(
            {
                "metric": "keypose_prediction_latency_p50",
                "value": round(p50_ms, 3),
                "unit": "ms",
                "vs_baseline": round(100.0 / p50_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
