"""Diffusion noise schedulers: DDPM (train) + DDIM (fast sampling).

Replaces diffusers' `DDPMScheduler` used by the reference visualizer
(`visualization/train.py:349-353`, `add_noise` at `:526-534`). SD-1.5 config:
scaled_linear betas 0.00085 -> 0.012 over 1000 steps, epsilon prediction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"


def make_betas(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps,
                           dtype=np.float64)
    if cfg.beta_schedule == "scaled_linear":
        return np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                           cfg.num_train_timesteps, dtype=np.float64) ** 2
    raise ValueError(cfg.beta_schedule)


class DDPMScheduler:
    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        betas = make_betas(cfg)
        alphas = 1.0 - betas
        self.alphas_cumprod = jnp.asarray(np.cumprod(alphas), jnp.float32)
        self.betas = jnp.asarray(betas, jnp.float32)
        self.alphas = jnp.asarray(alphas, jnp.float32)

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        """q(x_t | x_0): sqrt(a_t) x0 + sqrt(1-a_t) eps. t: [B] ints."""
        a = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (jnp.sqrt(a).reshape(shape) * x0
                + jnp.sqrt(1.0 - a).reshape(shape) * noise)

    def step(self, model_out: jnp.ndarray, t: int, sample: jnp.ndarray,
             key: Optional[jax.Array] = None) -> jnp.ndarray:
        """One ancestral DDPM step x_t -> x_{t-1} (epsilon parametrization)."""
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(t > 0, self.alphas_cumprod[jnp.maximum(t - 1, 0)], 1.0)
        beta_t = self.betas[t]
        x0 = (sample - jnp.sqrt(1 - a_t) * model_out) / jnp.sqrt(a_t)
        x0 = jnp.clip(x0, -1000.0, 1000.0)
        coef_x0 = jnp.sqrt(a_prev) * beta_t / (1 - a_t)
        coef_xt = jnp.sqrt(self.alphas[t]) * (1 - a_prev) / (1 - a_t)
        mean = coef_x0 * x0 + coef_xt * sample
        var = beta_t * (1 - a_prev) / (1 - a_t)
        if key is not None:
            noise = jax.random.normal(key, sample.shape, sample.dtype)
        else:
            noise = jnp.zeros_like(sample)
        return mean + jnp.where(t > 0, jnp.sqrt(jnp.maximum(var, 1e-20)), 0.0) * noise


class DDIMScheduler:
    """Deterministic DDIM sampler over a strided subset of timesteps."""

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        betas = make_betas(cfg)
        self.alphas_cumprod = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        step = self.cfg.num_train_timesteps // num_inference_steps
        return (np.arange(num_inference_steps) * step).round()[::-1].astype(np.int32)

    def step(self, model_out: jnp.ndarray, t: int, t_prev: int,
             sample: jnp.ndarray, eta: float = 0.0) -> jnp.ndarray:
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(t_prev >= 0, self.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
        x0 = (sample - jnp.sqrt(1 - a_t) * model_out) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1 - a_prev) * model_out
        return jnp.sqrt(a_prev) * x0 + dir_xt
