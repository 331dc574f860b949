"""Diffusion schedulers: beta tables and step rules vs. closed-form values."""
import numpy as np

import jax
import jax.numpy as jnp

from nvblox_mindmap_tpu.ops.schedulers import make_betas, make_schedule


def test_scaled_linear_betas_match_diffusers_formula():
    betas = make_betas("scaled_linear", 100)
    expected = np.linspace(1e-4**0.5, 0.02**0.5, 100) ** 2
    np.testing.assert_allclose(betas, expected, rtol=1e-12)


def test_squaredcos_betas_capped():
    betas = make_betas("squaredcos_cap_v2", 100)
    assert betas.max() <= 0.999 + 1e-12
    assert betas.min() > 0


def test_add_noise_endpoints():
    sched = make_schedule("scaled_linear", 100)
    x0 = jnp.ones((2, 4))
    noise = jnp.full((2, 4), 2.0)
    # At t=0 almost all signal.
    t0 = jnp.zeros((2,), dtype=jnp.int32)
    out = sched.add_noise(x0, noise, t0)
    abar0 = float(sched.alphas_cumprod[0])
    np.testing.assert_allclose(
        out, np.sqrt(abar0) * 1 + np.sqrt(1 - abar0) * 2, rtol=1e-6
    )


def test_ddpm_step_deterministic_recovers_x0_at_t0():
    sched = make_schedule("scaled_linear", 100)
    x0 = jnp.asarray(np.random.default_rng(0).uniform(-0.9, 0.9, size=(2, 3)))
    noise = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3)))
    t = jnp.asarray(0)
    xt = sched.add_noise(x0.astype(jnp.float32), noise.astype(jnp.float32),
                         jnp.zeros((2,), dtype=jnp.int32))
    prev = sched.step(noise.astype(jnp.float32), t, xt, key=None)
    np.testing.assert_allclose(prev, x0, atol=1e-5)


def test_ddim_full_chain_denoises():
    """Running the DDIM chain with the true eps recovers x0."""
    sched = make_schedule("squaredcos_cap_v2", 100, kind="ddim")
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.uniform(-0.9, 0.9, size=(2, 6)), dtype=jnp.float32)
    noise = jnp.asarray(rng.normal(size=(2, 6)), dtype=jnp.float32)
    T = 100
    xt = sched.add_noise(x0, noise, jnp.full((2,), T - 1, dtype=jnp.int32))

    def step(x, t):
        # Use the true eps implied by the current x and x0 at this level.
        abar = sched.alphas_cumprod[t]
        eps = (x - jnp.sqrt(abar) * x0) / jnp.sqrt(1 - abar)
        return sched.step(eps, t, x, key=None), None

    out, _ = jax.lax.scan(step, xt, sched.timesteps())
    np.testing.assert_allclose(out, x0, atol=1e-4)


def test_ddpm_stochastic_step_runs():
    sched = make_schedule("scaled_linear", 100)
    xt = jnp.ones((2, 3))
    eps = jnp.zeros((2, 3))
    out = sched.step(eps, jnp.asarray(50), xt, key=jax.random.PRNGKey(0))
    assert out.shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_step_uses_raw_eps_with_clipped_x0():
    """Parity with diffusers DDIMScheduler.step at the reference's call site
    (use_clipped_model_output stays False, diffuser_actor.py:392-396): when
    the predicted x0 clips, the x0 term uses the clipped value but the
    direction term keeps the RAW predicted eps - NOT the Glide variant that
    re-derives eps from the clipped x0 (use_clipped_model_output=True),
    which this test pins out."""
    sched = make_schedule("scaled_linear", 100, kind="ddim")
    t = jnp.asarray(90)
    prev_t = jnp.asarray(80)
    xt = jnp.full((1, 3), 2.5, dtype=jnp.float32)
    eps = jnp.full((1, 3), 0.1, dtype=jnp.float32)
    abar_t = float(sched.alphas_cumprod[90])
    abar_prev = float(sched.alphas_cumprod[80])
    x0_unclipped = (2.5 - np.sqrt(1 - abar_t) * 0.1) / np.sqrt(abar_t)
    assert x0_unclipped > 1.0, "test must exercise the clip branch"
    out = np.asarray(sched.step(eps, t, xt, key=None, prev_t=prev_t))
    expected = np.sqrt(abar_prev) * 1.0 + np.sqrt(1 - abar_prev) * 0.1
    np.testing.assert_allclose(out, expected, rtol=1e-5)
    # ... and NOT the re-derived-eps (Glide) value.
    eps_rederived = (2.5 - np.sqrt(abar_t) * 1.0) / np.sqrt(1 - abar_t)
    glide = np.sqrt(abar_prev) * 1.0 + np.sqrt(1 - abar_prev) * eps_rederived
    assert abs(float(out[0, 0]) - glide) > 1e-3


def test_timestep_spacing_leading_vs_trailing():
    """Few-step spacing semantics (schedulers.DiffusionSchedule.timesteps):
    'leading' is diffusers' default — chain starts at t=T-r, ends at 0;
    'trailing' starts at t=T-1 where the init really is pure noise. The
    drill_in_box serving measurement (docs/data/
    task_success_drill_in_box_ddim.json: 0/8 leading -> 6/8 trailing)
    hangs off exactly these index sets."""
    import numpy as np

    from nvblox_mindmap_tpu.ops.schedulers import make_schedule

    sched = make_schedule("scaled_linear", 100, kind="ddim")
    lead = np.asarray(sched.timesteps(10, spacing="leading"))
    trail = np.asarray(sched.timesteps(10, spacing="trailing"))
    assert lead.tolist() == [90, 80, 70, 60, 50, 40, 30, 20, 10, 0]
    assert trail.tolist() == [99, 89, 79, 69, 59, 49, 39, 29, 19, 9]
    # n == T: both spacings reduce to the full descending chain.
    full = np.asarray(sched.timesteps(100, spacing="trailing"))
    assert full.tolist() == list(range(99, -1, -1))
    assert np.asarray(sched.timesteps(100, spacing="leading")).tolist() == (
        list(range(99, -1, -1))
    )
