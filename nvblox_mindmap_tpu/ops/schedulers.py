"""Denoising-diffusion schedulers (DDPM / DDIM) as closed-form JAX tables.

The reference constructs two diffusers DDPMSchedulers with epsilon prediction
(reference: mindmap/diffuser_actor/diffuser_actor.py:147-157):

- position:  beta_schedule="scaled_linear"
- rotation:  beta_schedule="squaredcos_cap_v2"

and optionally converts them to DDIM for fast inference
(reference: mindmap/diffuser_actor/converter.py:51+).

Here the schedulers are immutable pytrees of precomputed tables, with
``add_noise`` and ``step`` usable under jit with traced timesteps - the whole
100-step denoising loop runs as a single ``lax.scan`` on-device, which is what
makes <100 ms keypose prediction possible on TPU.

Defaults mirror diffusers' DDPMScheduler: beta_start=1e-4, beta_end=0.02,
variance_type="fixed_small", clip_sample=True (range 1.0).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def make_betas(schedule: str, num_timesteps: int, beta_start: float = 1e-4,
               beta_end: float = 0.02) -> np.ndarray:
    """Beta tables for the supported schedules."""
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)
    if schedule == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_timesteps, dtype=np.float64)
            ** 2
        )
    if schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        i = np.arange(num_timesteps, dtype=np.float64)
        betas = 1.0 - alpha_bar((i + 1) / num_timesteps) / alpha_bar(i / num_timesteps)
        return np.minimum(betas, 0.999)
    raise ValueError(f"Unknown beta schedule: {schedule}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Immutable scheduler state. ``kind`` selects the step rule."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    kind: str = dataclasses.field(metadata=dict(static=True))
    clip_sample: bool = dataclasses.field(metadata=dict(static=True))
    clip_range: float = dataclasses.field(metadata=dict(static=True))

    @property
    def num_train_timesteps(self) -> int:
        return self.betas.shape[0]

    def timesteps(self, num_inference_steps: Optional[int] = None,
                  spacing: str = "leading") -> jnp.ndarray:
        """Descending inference timesteps.

        ``leading`` is diffusers' default (what the reference's converted
        DDIM runs): [0, r, 2r, ...] reversed — the chain STARTS at
        t = T - r, so the pure-noise init is treated as a partially-denoised
        sample (an SNR mismatch that grows with the step ratio; Lin et al.,
        "Common Diffusion Noise Schedules and Sampler Steps are Flawed").
        ``trailing`` starts at t = T-1 where the init really is pure noise:
        [T-1, T-1-r, ...] — measurably better for few-step sampling of the
        small scene-world policies (docs/pages/benchmarks.md, DDIM serving
        section).
        """
        T = self.num_train_timesteps
        n = num_inference_steps or T
        assert n <= T
        step_ratio = T // n
        if spacing == "leading":
            ts = (np.arange(0, n) * step_ratio).round().astype(np.int64)[::-1]
        elif spacing == "trailing":
            ts = np.arange(T, 0, -step_ratio).round().astype(np.int64) - 1
        else:
            raise ValueError(f"unknown timestep spacing: {spacing!r}")
        return jnp.asarray(ts.copy())

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        """Forward-process noising: sqrt(abar_t) x0 + sqrt(1-abar_t) eps.

        ``t`` has shape (B,) and broadcasts over trailing dims of x0.
        """
        abar = self.alphas_cumprod[t]
        shape = (x0.shape[0],) + (1,) * (x0.ndim - 1)
        sqrt_abar = jnp.sqrt(abar).reshape(shape).astype(x0.dtype)
        sqrt_1m = jnp.sqrt(1.0 - abar).reshape(shape).astype(x0.dtype)
        return sqrt_abar * x0 + sqrt_1m * noise

    def _pred_x0(self, eps: jnp.ndarray, t: jnp.ndarray,
                 sample: jnp.ndarray) -> jnp.ndarray:
        abar_t = self.alphas_cumprod[t].astype(sample.dtype)
        x0 = (sample - jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(abar_t)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_range, self.clip_range)
        return x0

    def step(self, eps: jnp.ndarray, t: jnp.ndarray, sample: jnp.ndarray,
             key: Optional[jax.Array] = None, prev_t: Optional[jnp.ndarray] = None
             ) -> jnp.ndarray:
        """One reverse-diffusion step x_t -> x_{t-1}.

        ``t`` is a traced scalar; works inside lax.scan. For DDPM, ``key``
        supplies the stochastic variance noise (omitted => deterministic mode).
        """
        if prev_t is None:
            prev_t = t - 1
        abar_t = self.alphas_cumprod[t].astype(sample.dtype)
        abar_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[prev_t], 1.0).astype(
            sample.dtype
        )
        x0 = self._pred_x0(eps, t, sample)

        if self.kind == "ddim":
            # diffusers DDIMScheduler.step semantics at the reference's call
            # site (diffuser_actor.py:392-396 passes no use_clipped_model_
            # output, so it stays False): the x0 term uses the CLIPPED x0,
            # the direction term uses the RAW predicted eps. The previous
            # re-derivation of eps from the clipped x0 was the
            # use_clipped_model_output=True (Glide) variant — a small but
            # real parity divergence (measured ~1% open-loop effect on the
            # drill_in_box sweep; the sampler-quality story lives in the
            # timestep-spacing / clip_sample knobs, see timesteps()).
            return jnp.sqrt(abar_prev) * x0 + jnp.sqrt(1.0 - abar_prev) * eps

        # DDPM posterior mean.
        alpha_t = abar_t / abar_prev
        beta_t = 1.0 - alpha_t
        beta_prod_t = 1.0 - abar_t
        beta_prod_prev = 1.0 - abar_prev
        x0_coeff = jnp.sqrt(abar_prev) * beta_t / beta_prod_t
        xt_coeff = jnp.sqrt(alpha_t) * beta_prod_prev / beta_prod_t
        prev = x0_coeff * x0 + xt_coeff * sample

        if key is not None:
            # variance_type="fixed_small": posterior variance, clamped.
            variance = jnp.clip(beta_prod_prev / beta_prod_t * beta_t, min=1e-20)
            noise = jax.random.normal(key, sample.shape, dtype=sample.dtype)
            prev = prev + jnp.where(t > 0, jnp.sqrt(variance), 0.0) * noise
        return prev


def make_schedule(beta_schedule: str, num_train_timesteps: int = 100,
                  kind: str = "ddpm", clip_sample: bool = True,
                  clip_range: float = 1.0) -> DiffusionSchedule:
    betas = make_betas(beta_schedule, num_train_timesteps)
    alphas_cumprod = np.cumprod(1.0 - betas)
    return DiffusionSchedule(
        betas=jnp.asarray(betas, dtype=jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        kind=kind,
        clip_sample=clip_sample,
        clip_range=clip_range,
    )
