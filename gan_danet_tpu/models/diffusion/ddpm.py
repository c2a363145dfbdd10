"""DDPM noise scheduler (behavioural parity: the diffusers DDPMScheduler
used by reference 4.train/5.test: scaled-linear betas 0.00085..0.012 over
1000 train steps, epsilon prediction, clip_sample off for latents)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class DDPMScheduler:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    clip_sample: bool = False

    betas: np.ndarray = field(init=False)
    alphas_cumprod: np.ndarray = field(init=False)
    timesteps: np.ndarray = field(init=False)

    def __post_init__(self):
        n = self.num_train_timesteps
        if self.beta_schedule == "scaled_linear":
            self.betas = np.linspace(self.beta_start**0.5, self.beta_end**0.5,
                                     n, dtype=np.float64) ** 2
        elif self.beta_schedule == "linear":
            self.betas = np.linspace(self.beta_start, self.beta_end, n,
                                     dtype=np.float64)
        else:
            raise ValueError(self.beta_schedule)
        alphas = 1.0 - self.betas
        self.alphas_cumprod = np.cumprod(alphas)
        self.timesteps = np.arange(n)[::-1].copy()

    # ------------------------------------------------------------------
    def add_noise(self, sample: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        """x_t = sqrt(abar_t) x_0 + sqrt(1-abar_t) eps; t may be a scalar
        or (B,) array of integer timesteps."""
        abar = jnp.asarray(self.alphas_cumprod, jnp.float32)[t]
        while abar.ndim < sample.ndim:
            abar = abar[..., None]
        return jnp.sqrt(abar) * sample + jnp.sqrt(1.0 - abar) * noise

    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        step = self.num_train_timesteps // num_inference_steps
        self.timesteps = (np.arange(num_inference_steps) * step)[::-1].copy()
        self._num_inference_steps = num_inference_steps
        return self.timesteps

    def step_tables(self, num_inference_steps: int):
        """Per-inference-step coefficient tables for the JITTED sampler.

        The host `step` below recomputes its posterior coefficients with
        Python/numpy float64 scalars on every call — fine as an oracle,
        but it forces one compiled dispatch per denoise step plus host
        scheduler math between steps (the per-step dispatch tax measured
        at 8-60x wall on remote backends, DESIGN.md §6). Here every
        t-dependent scalar of Ho et al. (2020) eq. 6-7 is precomputed in
        float64 over the whole inference schedule and stored as (S,)
        arrays indexed by step position, so the 50-step CFG loop can run
        as ONE lax.scan program (pipeline.LatentDiffusion.generate).

        Row i corresponds to timesteps[i] (descending). sigma is 0 at the
        terminal row (prev_t < 0): the last step is deterministic, exactly
        like the host oracle."""
        ts = self.set_timesteps(num_inference_steps)
        step = self.num_train_timesteps // num_inference_steps
        prev = ts - step
        abar_t = self.alphas_cumprod[ts]
        abar_prev = np.where(prev >= 0,
                             self.alphas_cumprod[np.maximum(prev, 0)], 1.0)
        beta_t = 1.0 - abar_t / abar_prev
        var = beta_t * (1.0 - abar_prev) / (1.0 - abar_t)
        f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
        return {
            "t": jnp.asarray(ts.copy(), jnp.int32),
            "sqrt_abar": f32(np.sqrt(abar_t)),
            "sqrt_1m_abar": f32(np.sqrt(1.0 - abar_t)),
            "coef_x0": f32(np.sqrt(abar_prev) * beta_t / (1.0 - abar_t)),
            "coef_xt": f32(np.sqrt(1.0 - beta_t) * (1.0 - abar_prev)
                           / (1.0 - abar_t)),
            "sigma": f32(np.where(prev >= 0,
                                  np.sqrt(np.maximum(var, 1e-20)), 0.0)),
        }

    def step_scan(self, model_output: jnp.ndarray, i, sample: jnp.ndarray,
                  tables, noise: jnp.ndarray) -> jnp.ndarray:
        """Jittable ancestral step using step_tables, `i` a traced step
        index. `noise` must be a fresh N(0,1) draw — it is scaled by
        sigma[i], which is 0 at the terminal step."""
        x0 = (sample - tables["sqrt_1m_abar"][i] * model_output) \
            / tables["sqrt_abar"][i]
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return (tables["coef_x0"][i] * x0 + tables["coef_xt"][i] * sample
                + tables["sigma"][i] * noise)

    def step(
        self,
        model_output: jnp.ndarray,
        t: int,
        sample: jnp.ndarray,
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """One ancestral DDPM denoising step x_t -> x_{t-prev}."""
        step_size = self.num_train_timesteps // getattr(
            self, "_num_inference_steps", self.num_train_timesteps)
        prev_t = t - step_size

        abar_t = float(self.alphas_cumprod[t])
        abar_prev = float(self.alphas_cumprod[prev_t]) if prev_t >= 0 else 1.0
        beta_t = 1.0 - abar_t / abar_prev

        # predicted x0 (epsilon parametrisation)
        x0 = (sample - np.sqrt(1.0 - abar_t) * model_output) / np.sqrt(abar_t)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)

        # posterior mean coefficients (Ho et al. 2020, eq. 7)
        coef_x0 = np.sqrt(abar_prev) * beta_t / (1.0 - abar_t)
        coef_xt = np.sqrt(1.0 - beta_t) * (1.0 - abar_prev) / (1.0 - abar_t)
        mean = coef_x0 * x0 + coef_xt * sample

        if prev_t >= 0 and key is not None:
            var = beta_t * (1.0 - abar_prev) / (1.0 - abar_t)
            mean = mean + np.sqrt(max(var, 1e-20)) * jax.random.normal(
                key, sample.shape, sample.dtype)
        return mean
