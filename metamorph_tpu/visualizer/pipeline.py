"""On-TPU render path: predicted SigLIP embeddings -> pixels.

Replaces the demo's StableDiffusionPipeline call
(`inference/demo.py:137-180`): per 64-token chunk of generated visual
embeddings, run adapter -> pad to 77 -> CFG denoising loop (DDIM) -> VAE
decode. The CFG null conditioning is the all-zeros 77x768 tensor, matching the
training dropout (`visualization/train.py:514-518`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from metamorph_tpu.visualizer.adapter import apply_adapter, pad_tokens
from metamorph_tpu.visualizer.scheduler import DDIMScheduler, SchedulerConfig
from metamorph_tpu.visualizer.unet import UNetConfig, unet_apply
from metamorph_tpu.visualizer.vae import VAEConfig, vae_decode


def render(
    adapter_params,
    unet_params,
    vae_params,
    unet_cfg: UNetConfig,
    vae_cfg: VAEConfig,
    siglip_embeds: jnp.ndarray,      # [B, 64, 1152]
    rng: jax.Array,
    adapter_mode: str = "mlp",
    guidance_scale: float = 7.5,
    num_inference_steps: int = 50,
    latent_size: int = 64,
    scheduler_cfg: SchedulerConfig = SchedulerConfig(),
) -> jnp.ndarray:
    """Returns images [B, H, W, 3] in [0, 1]."""
    sched = DDIMScheduler(scheduler_cfg)
    B = siglip_embeds.shape[0]

    cond = pad_tokens(apply_adapter(adapter_params, siglip_embeds,
                                    mode=adapter_mode), 77)
    uncond = jnp.zeros_like(cond)
    ctx = jnp.concatenate([uncond, cond], axis=0)   # [2B, 77, D]

    latents = jax.random.normal(
        rng, (B, latent_size, latent_size, unet_cfg.sample_channels), jnp.float32)

    ts = sched.timesteps(num_inference_steps)
    for i, t in enumerate(ts):
        t_prev = ts[i + 1] if i + 1 < len(ts) else -1
        lat2 = jnp.concatenate([latents, latents], axis=0)
        tt = jnp.full((2 * B,), int(t), jnp.int32)
        eps = unet_apply(unet_params, unet_cfg, lat2, tt, ctx)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        eps = eps_u + guidance_scale * (eps_c - eps_u)
        latents = sched.step(eps, int(t), int(t_prev), latents)

    images = vae_decode(vae_params, vae_cfg, latents)
    return jnp.clip(images / 2.0 + 0.5, 0.0, 1.0)


def render_multi_scale(adapter_params, unet_params, vae_params, unet_cfg,
                       vae_cfg, siglip_embeds, rng,
                       guidance_scales=(6.0, 7.5, 10.0, 12.5), **kw):
    """The demo renders each image at several guidance scales
    (`inference/demo.py:156-180`)."""
    outs = []
    for g in guidance_scales:
        outs.append(render(adapter_params, unet_params, vae_params, unet_cfg,
                           vae_cfg, siglip_embeds, rng, guidance_scale=g, **kw))
    return jnp.stack(outs, axis=1)  # [B, n_scales, H, W, 3]
