"""LoRA adapters for the LLaMA backbone.

Parity target: the reference's PEFT LoRA path — `lora_enable`/`lora_r`/
`lora_alpha` training args (`metamorph/train/train.py:88-93,1435-1466`),
LoRA-split final save (`train.py:1602-1612`), and merge-on-load
(`metamorph/model/builder.py:39-73`).

Design: low-rank factors live INSIDE the stacked layer subtrees
(`layers/attn/wq_lora_a` [L, D, r], `wq_lora_b` [L, r, out], ...) so the
`lax.scan` block loop picks them up transparently; `_attn_block`/`_mlp_block`
apply `x @ W + (x @ A) @ B * (alpha/r)` on the fly (no merged weight copies in
HBM). `merge_lora` folds the factors into the base weights for export.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# (subtree, leaf) pairs that can carry LoRA — all decoder linears, matching
# the reference's find_all_linear_names over the LLM (`train.py:144-156`).
LORA_TARGETS = (
    ("attn", "wq"), ("attn", "wk"), ("attn", "wv"), ("attn", "wo"),
    ("mlp", "w_gate"), ("mlp", "w_up"), ("mlp", "w_down"),
)


def add_lora(llama_params: Params, rng: jax.Array, r: int, alpha: float = None,
             targets: Sequence = LORA_TARGETS, dtype=None) -> Params:
    """Returns a new llama param tree with zero-initialized-B LoRA factors."""
    layers = dict(llama_params["layers"])
    keys = jax.random.split(rng, len(targets))
    new_layers = {k: dict(v) for k, v in layers.items()}
    for key, (sub, name) in zip(keys, targets):
        W = layers[sub][name]                      # [L, d_in, d_out]
        L, d_in, d_out = W.shape
        dt = dtype or W.dtype
        a = (jax.random.normal(key, (L, d_in, r), jnp.float32) * (d_in ** -0.5)
             ).astype(dt)
        b = jnp.zeros((L, r, d_out), dt)
        new_layers[sub][f"{name}_lora_a"] = a
        new_layers[sub][f"{name}_lora_b"] = b
    out = dict(llama_params)
    out["layers"] = new_layers
    return out


def lora_scale(r: int, alpha: float) -> float:
    return alpha / r


def apply_lora_dense(layer: Params, name: str, x: jnp.ndarray,
                     scale: float) -> jnp.ndarray:
    """x @ W (+ LoRA path when factors are present)."""
    out = x @ layer[name]
    a = layer.get(f"{name}_lora_a")
    if a is not None:
        out = out + ((x @ a) @ layer[f"{name}_lora_b"]) * scale
    return out


def merge_lora(llama_params: Params, r: int, alpha: float) -> Params:
    """Fold LoRA factors into base weights (merge-and-unload,
    `builder.py:67-70`) and drop the factor leaves."""
    scale = lora_scale(r, alpha)
    layers = llama_params["layers"]
    new_layers = {k: dict(v) for k, v in layers.items()}
    for sub in list(new_layers):
        subtree = new_layers[sub]
        for name in list(subtree):
            if name.endswith("_lora_a"):
                base = name[: -len("_lora_a")]
                a, b = subtree.pop(name), subtree.pop(f"{base}_lora_b")
                delta = jnp.einsum("lir,lro->lio", a.astype(jnp.float32),
                                   b.astype(jnp.float32)) * scale
                subtree[base] = (subtree[base].astype(jnp.float32)
                                 + delta).astype(subtree[base].dtype)
    out = dict(llama_params)
    out["layers"] = new_layers
    return out


def split_lora_state(llama_params: Params) -> Dict[str, Any]:
    """Extract only the LoRA factor leaves (the reference saves LoRA weights
    separately from the base, `train.py:1602-1612`)."""
    out = {}
    for sub, tree in llama_params["layers"].items():
        picked = {k: v for k, v in tree.items() if "_lora_" in k}
        if picked:
            out[sub] = picked
    return {"layers": out}


def lora_trainable_mask(llama_params: Params) -> Params:
    """True only on LoRA factor leaves."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any("_lora_" in getattr(k, "key", str(k)) for k in path),
        llama_params)
