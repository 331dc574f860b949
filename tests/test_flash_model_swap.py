"""Flash-attention inference swap: full-model outputs match the XLA path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvblox_mindmap_tpu.models.converter import (
    apply_inference_settings,
    convert_to_flash_attention,
)
from nvblox_mindmap_tpu.models.diffuser_actor import (
    DiffuserActor,
    DiffuserActorConfig,
    prepare_inputs,
    sample_trajectory,
)
from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType
from nvblox_mindmap_tpu.ops.attention import (
    get_default_attention_impl,
    set_default_attention_impl,
)
from tests.jit_helpers import jit_sample

BOUNDS = np.asarray([[-0.5, -1.0, 0.0], [1.5, 1.0, 2.0]], dtype=np.float32)


@pytest.fixture(autouse=True)
def restore_impl():
    yield
    set_default_attention_impl("xla")


def make_model_and_batch():
    cfg = DiffuserActorConfig(
        embedding_dim=24,
        num_attn_heads=4,
        data_type="mesh",
        feature_type=FeatureExtractorType.RGB,
        diffusion_timesteps=3,
        fps_subsampling_factor=4,
    )
    model = DiffuserActor(cfg)
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 3, 1, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    batch = {
        "gripper_history": jnp.asarray(np.concatenate(
            [rng.uniform(-0.4, 0.9, (2, 3, 1, 3)), q, np.ones((2, 3, 1, 1))],
            -1,
        ).astype(np.float32)),
        "vertices": jnp.asarray(
            rng.uniform(-0.4, 0.9, (2, 32, 3)), jnp.float32
        ),
        "vertex_features": jnp.asarray(
            rng.normal(size=(2, 32, 8)), jnp.float32
        ),
        "vertices_valid_mask": jnp.ones((2, 32), bool),
    }
    return model, batch


def test_flash_swap_matches_xla_and_drops_weights(monkeypatch):
    model, batch = make_model_and_batch()
    bounds = jnp.asarray(BOUNDS)
    prepared = prepare_inputs(batch, bounds, model.config)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1), prepared, jnp.zeros((2, 1, 1, 9)),
        jnp.zeros((2,), jnp.int32),
    )
    key = jax.random.PRNGKey(0)

    traj_xla, _, w_xla = jit_sample(
        model, variables, prepared, key, bounds
    )
    assert w_xla is not None

    # Count actual flash-kernel invocations (trace-time).
    from nvblox_mindmap_tpu.ops import flash_attention as fa

    calls = {"n": 0}
    real = fa.flash_attention

    def counting(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(fa, "flash_attention", counting)

    sampler_kwargs = apply_inference_settings(convert_to_flash_attention())
    assert get_default_attention_impl() == "flash"
    assert sampler_kwargs == {}
    traj_flash, _, w_flash = jit_sample(
        model, variables, prepared, key, bounds
    )
    assert calls["n"] > 0, "flash kernel was never traced"
    assert w_flash is None  # flash cannot materialize weights
    np.testing.assert_allclose(
        np.asarray(traj_flash), np.asarray(traj_xla), atol=5e-3
    )


def test_apply_inference_settings_passes_scheduler_through():
    from nvblox_mindmap_tpu.models.converter import convert_diffusion_scheduler

    settings = dict(convert_to_flash_attention())
    settings.update(convert_diffusion_scheduler(5))
    rest = apply_inference_settings(settings)
    assert rest == {
        "scheduler_kind": "ddim",
        "num_inference_steps": 5,
        "stochastic": False,
    }
    assert get_default_attention_impl() == "flash"
    set_default_attention_impl("xla")


def test_set_default_attention_impl_rejects_unknown():
    with pytest.raises(ValueError, match="Unknown attention impl"):
        set_default_attention_impl("cuda")
