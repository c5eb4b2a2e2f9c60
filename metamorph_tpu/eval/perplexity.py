"""Evaluation: perplexity / per-component losses over a packed eval set.

The reference has no eval harness (SURVEY.md §6); this provides the basic
quality metrics a user needs when swapping frameworks: text perplexity on
supervised tokens and the visual-AR cosine similarity, aggregated over batches.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metamorph_tpu.config import MetaMorphConfig
from metamorph_tpu.models.metamorph import metamorph_forward
from metamorph_tpu.multimodal.packing import PackedBatch, batch_to_arrays


def evaluate(
    params: Any,
    cfg: MetaMorphConfig,
    batches: Iterable[Tuple[Any, np.ndarray]],
    max_batches: int = 0,
    attn_impl: str = "xla",
) -> Dict[str, float]:
    """Returns {perplexity, loss_language, loss_image_ar (=-mean cosine),
    mean_visual_cosine, n_text_tokens, n_image_ar_tokens}."""
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def fwd(params, batch, pixels):
        _, metrics = metamorph_forward(params, cfg, batch, pixels,
                                       attn_impl=attn_impl)
        return metrics

    total_nll = 0.0
    total_text = 0.0
    total_cos = 0.0
    total_img = 0.0
    n = 0
    for packed, pixels in batches:
        batch = (batch_to_arrays(packed) if isinstance(packed, PackedBatch)
                 else dict(packed))
        batch = {k: jnp.asarray(np.asarray(v)) for k, v in batch.items()}
        m = jax.device_get(fwd(params, batch, jnp.asarray(np.asarray(pixels))))
        nt, ni = float(m["n_text_tokens"]), float(m["n_image_ar_tokens"])
        total_nll += float(m["loss_language"]) * nt
        total_text += nt
        total_cos += -float(m["loss_image_ar"]) * ni
        total_img += ni
        n += 1
        if max_batches and n >= max_batches:
            break

    mean_nll = total_nll / max(total_text, 1.0)
    mean_cos = total_cos / max(total_img, 1.0)
    return {
        "perplexity": float(np.exp(mean_nll)),
        "loss_language": mean_nll,
        "mean_visual_cosine": mean_cos,
        "loss_image_ar": -mean_cos,
        "n_text_tokens": total_text,
        "n_image_ar_tokens": total_img,
        "n_batches": float(n),
    }
