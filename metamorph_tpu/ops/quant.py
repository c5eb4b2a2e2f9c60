"""Weight-only int8 quantization for decode/serving.

Beyond the reference (whose only quantization story is bitsandbytes 4/8-bit
CUDA loading, off in all published scripts — `model/builder.py:21-30`,
`train.py:101-104`): TPU decode is bound by weight reads from HBM, so
symmetric per-output-channel int8 weights halve the bandwidth per token.
XLA:TPU fuses the int8->bf16 convert into the dot, so the dequantized matrix
never materializes; the per-channel scale multiplies the [B, D_out] output
(mathematically identical to scaling the weight columns).

Training and prefill stay bf16 — this is a serving-side transform
(`quantize_llama_decode`), applied to a loaded checkpoint.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QUANT_KEY = "int8_q"   # marks a quantized weight leaf-dict


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Symmetric per-output-channel int8: w [..., D_in, D_out] ->
    {int8_q [..., D_in, D_out], scale fp32 [..., 1, D_out]} with
    w ≈ int8_q * scale."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return {QUANT_KEY: q.astype(jnp.int8), "scale": scale}


def dequantize_weight(wq: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    return (wq[QUANT_KEY].astype(jnp.float32) * wq["scale"]).astype(dtype)


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, dict) and QUANT_KEY in leaf


def quantized_matmul(x: jnp.ndarray, wq: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """x [..., D_in] @ (int8_q * scale). The convert rides inside the dot on
    TPU; accumulation fp32, output back in x.dtype."""
    q = wq[QUANT_KEY]
    out = jax.lax.dot_general(
        x, q.astype(x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out * wq["scale"].reshape((1,) * (out.ndim - 1) + (-1,))
    return out.astype(x.dtype)


def quantize_kv(x: jnp.ndarray) -> tuple:
    """Symmetric per-vector int8 for KV-cache entries: x [..., Dh] ->
    (int8 [..., Dh], scale fp32 [...]) with x ≈ int8 * scale[..., None].
    One scale per (token, kv head) — the granularity a decode-step write
    produces, and fine enough that attention cosine stays >0.999 (certified
    in tests/test_kv_quant.py)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


_DECODE_QUANT_NAMES = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_llama_decode(llama_params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the decode-hot weights of a LLaMA param tree: all decoder
    linears (stacked [L, D_in, D_out]) and the lm_head. Embedding table, norm
    scales, and LoRA factors stay as-is. Returns a NEW tree consumable by
    `llama.decode_step` / the decode entry points (training functions reject
    it — quantization is serving-only)."""
    out = jax.tree.map(lambda x: x, llama_params)  # shallow-ish copy
    layers = dict(out["layers"])
    attn = dict(layers["attn"])
    mlp = dict(layers["mlp"])
    for name in _DECODE_QUANT_NAMES:
        grp = attn if name in attn else mlp
        grp[name] = quantize_weight(grp[name])
    layers["attn"], layers["mlp"] = attn, mlp
    out["layers"] = layers
    if "lm_head" in out:
        out["lm_head"] = {"kernel": quantize_weight(out["lm_head"]["kernel"])}
    return out
