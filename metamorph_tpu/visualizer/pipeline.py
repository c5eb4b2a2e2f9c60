"""On-TPU render path: predicted SigLIP embeddings -> pixels.

Replaces the demo's StableDiffusionPipeline call
(`inference/demo.py:137-180`): per 64-token chunk of generated visual
embeddings, run adapter -> pad to 77 -> CFG denoising loop -> VAE decode.
The default sampler is PNDM at 50 steps — the SD-1.5 pipeline default the
reference demo runs — with DDIM available via `scheduler="ddim"`. The CFG
null conditioning is the all-zeros 77x768 tensor, matching the training
dropout (`visualization/train.py:514-518`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from metamorph_tpu.visualizer.adapter import apply_adapter, pad_tokens
from metamorph_tpu.visualizer.scheduler import (DDIMScheduler,
                                                DPMSolverPlusPlusScheduler,
                                                PNDMScheduler,
                                                SchedulerConfig)
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
    scheduler: str = "pndm",         # pndm (reference demo default) | ddim
                                     #   | dpmpp (2M: ~50-step quality at 20)
    scheduler_cfg: SchedulerConfig = SchedulerConfig(),
) -> jnp.ndarray:
    """Returns images [B, H, W, 3] in [0, 1]."""
    B = siglip_embeds.shape[0]

    cond = pad_tokens(apply_adapter(adapter_params, siglip_embeds,
                                    mode=adapter_mode), 77)
    uncond = jnp.zeros_like(cond)
    ctx = jnp.concatenate([uncond, cond], axis=0)   # [2B, 77, D]

    latents = jax.random.normal(
        rng, (B, latent_size, latent_size, unet_cfg.sample_channels), jnp.float32)

    def eps_fn(latents, t):
        lat2 = jnp.concatenate([latents, latents], axis=0)
        tt = jnp.full((2 * B,), int(t), jnp.int32)
        eps = unet_apply(unet_params, unet_cfg, lat2, tt, ctx)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        return eps_u + guidance_scale * (eps_c - eps_u)

    if scheduler == "pndm":
        sched = PNDMScheduler(scheduler_cfg)
        for t in sched.set_timesteps(num_inference_steps):
            latents = sched.step(eps_fn(latents, t), int(t), latents)
    elif scheduler == "dpmpp":
        sched = DPMSolverPlusPlusScheduler(scheduler_cfg)
        for t in sched.set_timesteps(num_inference_steps):
            latents = sched.step(eps_fn(latents, t), int(t), latents)
    elif scheduler == "ddim":
        sched = DDIMScheduler(scheduler_cfg)
        ts = sched.timesteps(num_inference_steps)
        for i, t in enumerate(ts):
            t_prev = ts[i + 1] if i + 1 < len(ts) else -1
            latents = sched.step(eps_fn(latents, t), int(t), int(t_prev), latents)
    else:
        raise ValueError(f"unknown scheduler {scheduler}")

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
