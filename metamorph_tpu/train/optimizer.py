"""Optimizer, LR schedules, per-group learning rates, trainable sets.

Parity targets:
  * AdamW + warmup/cosine (HF Trainer defaults used by the reference scripts);
  * per-group LRs for mm_projector / vision_tower
    (`metamorph/train/metamorph_trainer.py:156-271`);
  * sqrt batch-size LR scaling rule lr = base·sqrt(bs/base_bs)
    (`README.md:189-191`, `scripts/Train.md:116-123`);
  * 2-stage trainable sets: stage-1 connector pretrain tunes the projector
    (+ embeddings when im_start_end tokens are added) with the LLM frozen
    (`train.py:1435-1524`); stage-2 tunes everything (optionally minus tower).

Optimizer states inherit the parameter PartitionSpecs (ZeRO-2-equivalent
sharding comes free under GSPMD).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from metamorph_tpu.config import TrainConfig


def sqrt_lr_scale(base_lr: float, batch_size: int, base_batch_size: int) -> float:
    return base_lr * math.sqrt(batch_size / base_batch_size)


def make_schedule(cfg: TrainConfig, lr: float) -> optax.Schedule:
    warmup = max(int(cfg.total_steps * cfg.warmup_ratio), 1)
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, max(cfg.total_steps, warmup + 1), end_value=0.0)
    if cfg.lr_schedule == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup),
             optax.linear_schedule(lr, 0.0, max(cfg.total_steps - warmup, 1))],
            [warmup])
    if cfg.lr_schedule == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), optax.constant_schedule(lr)],
            [warmup])
    raise ValueError(cfg.lr_schedule)


def _top_level_group(path) -> str:
    key = path[0]
    name = key.key if hasattr(key, "key") else str(key)
    if name == "projector":
        return "projector"
    if name == "siglip":
        return "vision_tower"
    return "default"


def param_group_labels(params: Any) -> Any:
    """Label pytree: 'projector' / 'vision_tower' / 'default' — the reference's
    optimizer param groups (`metamorph_trainer.py:156-271`)."""
    return jax.tree_util.tree_map_with_path(lambda p, _: _top_level_group(p), params)


def trainable_mask(params: Any, cfg: TrainConfig) -> Any:
    """True = update this leaf. Implements the stage-1/stage-2 freeze toggles."""

    def mask(path, _):
        group = _top_level_group(path)
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        if cfg.tune_mm_mlp_adapter:
            # stage 1: projector (+ input embeddings for the new image tokens)
            return group == "projector" or ("embed" in names)
        if cfg.lora_enable and names[0] == "llama":
            # LoRA: only the low-rank factors move (PEFT path, train.py:1435-1466)
            return any("_lora_" in n for n in names)
        if cfg.freeze_backbone and names[0] == "llama":
            return False
        if names[0] == "siglip":
            # tower trainable only when explicitly given its own LR (unfreeze)
            return cfg.vision_tower_lr is not None
        return True

    return jax.tree_util.tree_map_with_path(mask, params)


def make_optimizer(cfg: TrainConfig, params: Any) -> optax.GradientTransformation:
    def adamw(lr: float):
        return optax.adamw(
            learning_rate=make_schedule(cfg, lr),
            b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        )

    group_labels = param_group_labels(params)
    mask = trainable_mask(params, cfg)
    # frozen leaves get their own label -> set_to_zero, so multi_transform
    # never allocates Adam moments for them (matters: the frozen SigLIP tower
    # is 428M params — no reason to hold 3.4GB of dead optimizer state)
    labels = jax.tree.map(lambda g, m: g if m else "frozen", group_labels, mask)
    groups = {
        "default": adamw(cfg.learning_rate),
        "projector": adamw(cfg.mm_projector_lr or cfg.learning_rate),
        "vision_tower": adamw(cfg.vision_tower_lr or cfg.learning_rate),
        "frozen": optax.set_to_zero(),
    }
    inv_mask = jax.tree.map(lambda m: not m, mask)
    return optax.chain(
        # zero frozen grads first so they don't pollute the global clip norm
        # (reference: requires_grad=False params never reach the optimizer)
        optax.masked(optax.set_to_zero(), inv_mask),
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.multi_transform(groups, labels),
    )
