"""Stand-alone loss functions.

The production dual loss lives in `models/metamorph.py::metamorph_forward`;
this module carries the reference's loss-function API surface
(`metamorph_llama.py:39-41,140-160,199-219`), including `infonce_loss`, which
the reference defines but never calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(z: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error (`l1_loss_fn`, metamorph_llama.py:199-209)."""
    return jnp.abs(z.astype(jnp.float32) - h.astype(jnp.float32)).mean()


def smooth_l1_loss(z: jnp.ndarray, h: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Huber-style smooth L1 (`loss_fn`, metamorph_llama.py:39-41)."""
    d = jnp.abs(z.astype(jnp.float32) - h.astype(jnp.float32))
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta).mean()


def cosine_loss(target: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """-mean cosine similarity (the normalize_vision AR loss,
    metamorph_llama.py:449-453)."""
    t = target.astype(jnp.float32)
    p = pred.astype(jnp.float32)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    return -(t * p).sum(-1).mean()


def soft_ce_loss(target_prob: jnp.ndarray, pred_prob: jnp.ndarray,
                 eps: float = 1e-10) -> jnp.ndarray:
    """Soft cross-entropy for the apply_softmax variant
    (metamorph_llama.py:442-447)."""
    return -(target_prob.astype(jnp.float32)
             * jnp.log(pred_prob.astype(jnp.float32) + eps)).sum(-1).mean()


def infonce_loss(targets: jnp.ndarray, preds: jnp.ndarray,
                 temperature: float = 0.03) -> jnp.ndarray:
    """Batch-contrastive InfoNCE (`infonce_loss`, metamorph_llama.py:140-160 —
    defined but unused in the reference)."""
    t = targets.astype(jnp.float32)
    p = preds.astype(jnp.float32)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    sim = (p @ t.T) / temperature
    labels = jnp.arange(sim.shape[0])
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
