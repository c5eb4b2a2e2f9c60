"""Diffusion visualizer finetune: SigLIP-conditioned SD-1.5 on TPU.

TPU-native replacement for the reference's DDP/NCCL visualizer trainer
(`visualization/train.py:364-604`):
  * frozen SigLIP + frozen VAE, trainable adapter (+ optionally UNet);
  * per step: encode image -> adapter -> pad 64->77 -> CFG dropout (whole-row
    zeroing of the padded conditioning with prob `cfg_prob`,
    `visualization/train.py:505-518`) -> vae encode -> add_noise (t~U[0,1000),
    optional per-channel noise offset `:526-534`) -> unet -> MSE(noise);
  * log-warmup + linear-decay LR (`lr_lambda` `:88-103`);
  * step-based checkpoint/resume with data fast-forward (`:268-299,421-447`);
  * tar-shard dataset split across *global* ranks (the reference splits by
    local_rank — a multi-node shard-assignment bug we fix, `:454-471`).

Data parallelism comes from sharding the batch over the mesh instead of DDP.
"""

from __future__ import annotations

import dataclasses
import io
import json
import math
import os
import tarfile
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metamorph_tpu.visualizer.adapter import apply_adapter, init_adapter, pad_tokens
from metamorph_tpu.visualizer.scheduler import DDPMScheduler, SchedulerConfig
from metamorph_tpu.visualizer.unet import UNetConfig, init_unet_params, unet_apply
from metamorph_tpu.visualizer.vae import VAEConfig, init_vae_params, vae_encode


@dataclasses.dataclass
class VisualizerTrainConfig:
    adapter_mode: str = "mlp"
    num_tokens: int = 64
    cfg_prob: float = 0.1          # conditioning DROP probability
    noise_offset: float = 0.0
    learning_rate: float = 1e-4
    unet_lr: float = 1e-5
    unfreeze_unet: bool = False
    # reference trains a from-scratch UNet with linear-warmup-then-CONSTANT
    # LR instead of the warmup+decay used for finetuning
    # (`visualization/train.py:408-411`, lr_lambda_warmup_constant)
    unet_from_scratch: bool = False
    batch_size: int = 24
    resolution: int = 512
    total_steps: int = 16000
    save_steps: int = 1000
    seed: int = 0


def lr_schedule(base_lr: float, target: int = 16000):
    """Log warmup to target//4 then linear decay (`visualization/train.py:88-103`)."""
    peak = target // 4

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.log(step + 1.0) / math.log(peak + 1)
        decay = 1.0 - (step - peak) / (target - peak)
        mult = jnp.where(step < peak, warm, jnp.clip(decay, 0.0, 1.0))
        return base_lr * mult

    return fn


def lr_schedule_warmup_constant(base_lr: float, warmup: int = 10_000):
    """Linear warmup over `warmup` steps, then constant — the reference's
    from-scratch-UNet schedule (`visualization/train.py` lr_lambda_warmup_constant)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        return base_lr * jnp.minimum(step / warmup, 1.0)

    return fn


def select_lr_schedules(tc: "VisualizerTrainConfig"):
    """(adapter_schedule, unet_schedule) for a train config. A from-scratch
    UNet switches BOTH to warmup-then-constant — the reference swaps the
    projector's scheduler too (`visualization/train.py:409-418`,
    lr_lambda_warmup_constant applied to optimizer AND optimizer_projector)."""
    if tc.unet_from_scratch:
        return (lr_schedule_warmup_constant(tc.learning_rate),
                lr_schedule_warmup_constant(tc.unet_lr))
    return (lr_schedule(tc.learning_rate, tc.total_steps),
            lr_schedule(tc.unet_lr, tc.total_steps))


def visualizer_loss(adapter_params, unet_params, vae_params, cfgs,
                    siglip_embeds, images, rng):
    """One training-step loss. cfgs = (train_cfg, unet_cfg, vae_cfg, sched)."""
    tc, unet_cfg, vae_cfg, sched = cfgs
    B = images.shape[0]
    k_drop, k_noise, k_t, k_off, k_vae = jax.random.split(rng, 5)

    cond = apply_adapter(adapter_params, siglip_embeds, mode=tc.adapter_mode)
    cond = pad_tokens(cond, 77)
    drop = jax.random.uniform(k_drop, (B,)) < tc.cfg_prob
    cond = jnp.where(drop[:, None, None], 0.0, cond)

    latents = vae_encode(vae_params, vae_cfg, images, rng=k_vae)
    latents = jax.lax.stop_gradient(latents)

    noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
    if tc.noise_offset > 0:
        off = jax.random.normal(k_off, (B, 1, 1, latents.shape[-1]), latents.dtype)
        noise = noise + tc.noise_offset * off
    t = jax.random.randint(k_t, (B,), 0, sched.cfg.num_train_timesteps)
    noisy = sched.add_noise(latents, noise, t)

    pred = unet_apply(unet_params, unet_cfg, noisy, t, cond)
    return jnp.mean((pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)


def make_visualizer_train_step(tc: VisualizerTrainConfig, unet_cfg: UNetConfig,
                               vae_cfg: VAEConfig,
                               sched: Optional[DDPMScheduler] = None,
                               mesh=None):
    """Returns (step_fn, init_opt_state). step_fn(state, siglip, images, rng)
    -> (state, loss). state = {adapter, unet, vae, opt_adapter, opt_unet}.

    With `mesh`, the step compiles DDP-equivalent to the reference's 8-GPU
    NCCL setup (`visualization/train.py:394-395`): params/optimizer replicated,
    the batch sharded over every mesh axis, XLA all-reducing the grads."""
    sched = sched or DDPMScheduler()
    cfgs = (tc, unet_cfg, vae_cfg, sched)
    adapter_sched, unet_sched = select_lr_schedules(tc)
    tx_adapter = optax.adamw(adapter_sched, b1=0.9, b2=0.999, weight_decay=0.01)
    tx_unet = optax.adamw(unet_sched, b1=0.9, b2=0.999, weight_decay=0.01)

    def step(state, siglip_embeds, images, rng):
        if tc.unfreeze_unet:
            def loss_fn(ap, up):
                return visualizer_loss(ap, up, state["vae"], cfgs,
                                       siglip_embeds, images, rng)

            loss, (ga, gu) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                state["adapter"], state["unet"])
            ua, oa = tx_adapter.update(ga, state["opt_adapter"], state["adapter"])
            uu, ou = tx_unet.update(gu, state["opt_unet"], state["unet"])
            return {
                **state,
                "adapter": optax.apply_updates(state["adapter"], ua),
                "unet": optax.apply_updates(state["unet"], uu),
                "opt_adapter": oa, "opt_unet": ou,
            }, loss

        def loss_fn(ap):
            return visualizer_loss(ap, state["unet"], state["vae"], cfgs,
                                   siglip_embeds, images, rng)

        loss, ga = jax.value_and_grad(loss_fn)(state["adapter"])
        ua, oa = tx_adapter.update(ga, state["opt_adapter"], state["adapter"])
        return {**state, "adapter": optax.apply_updates(state["adapter"], ua),
                "opt_adapter": oa}, loss

    def init_state(rng, dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(rng, 3)
        adapter = init_adapter(k1, mode=tc.adapter_mode,
                               output_dim=unet_cfg.cross_attention_dim,
                               num_tokens=tc.num_tokens, dtype=dtype)
        unet = init_unet_params(k2, unet_cfg, dtype)
        vae = init_vae_params(k3, vae_cfg, dtype)
        return {"adapter": adapter, "unet": unet, "vae": vae,
                "opt_adapter": tx_adapter.init(adapter),
                "opt_unet": tx_unet.init(unet)}

    if mesh is None:
        return jax.jit(step), init_state

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(mesh.axis_names))  # batch over all axes
    jit_step = jax.jit(step,
                       in_shardings=(repl, batch_sh, batch_sh, repl),
                       out_shardings=(repl, repl),
                       donate_argnums=(0,))
    return jit_step, init_state


# ---------------------------------------------------------------------------
# tar-shard dataset (WebDataset-style)
# ---------------------------------------------------------------------------

def iter_tar_shards(shard_paths: List[str], process_index: int,
                    process_count: int) -> Iterator[bytes]:
    """Yield raw image bytes from tar shards assigned to this *global* process
    (fixes the reference's local_rank split, `visualization/train.py:454-471`)."""
    shards = sorted(shard_paths)
    per = len(shards) // max(process_count, 1)
    start = process_index * per
    end = len(shards) if process_index == process_count - 1 else start + per
    for path in shards[start:end]:
        with tarfile.open(path, "r") as tf:
            for member in tf:
                if member.name.endswith((".jpg", ".jpeg", ".png")):
                    f = tf.extractfile(member)
                    if f is not None:
                        yield f.read()


def decode_and_preprocess(img_bytes: bytes, siglip_size: int, vae_size: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """-> (siglip_pixels [S,S,3], vae_image [R,R,3] in [-1,1]); corrupt images
    raise (caller continues, `visualization/train.py:135-137`)."""
    from PIL import Image

    from metamorph_tpu.multimodal.mm_utils import resize_bilinear, siglip_preprocess

    img = Image.open(io.BytesIO(img_bytes)).convert("RGB")
    arr = np.asarray(img)
    sig = siglip_preprocess(arr, siglip_size)
    # resize short side then center crop (CustomDataset vae_transforms)
    h, w = arr.shape[:2]
    scale = vae_size / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = resize_bilinear(arr, (nh, nw))
    top, left = (nh - vae_size) // 2, (nw - vae_size) // 2
    crop = resized[top:top + vae_size, left:left + vae_size]
    vae_img = (crop / 255.0 - 0.5) / 0.5
    return sig.astype(np.float32), vae_img.astype(np.float32)
