"""SigLIP -> CLIP-text-space adapter (the diffusion conditioning projector).

JAX pure-function port surface of `SimplifiedSigLIPProjector`
(`inference/adapter.py:36-108`, training copy `visualization/train.py:166-257`):
64 L2-normalized SigLIP tokens (1152-d) -> 77 CLIP-space tokens (768-d), with
modes:
  * mlp       — per-token MLP Linear+LN+ReLU stack (token count unchanged; the
                demo pads 64 -> 77 with zeros, `inference/demo.py:137-180`);
  * xattn     — learned 77 query tokens cross-attending to projected inputs;
  * xattnffn  — same + post-attention FFN per block;
  * transformer — encoder-decoder with learned query embeddings.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _dense(key, d_in, d_out, dtype):
    bound = d_in ** -0.5
    k1, k2 = jax.random.split(key)
    return {"kernel": jax.random.uniform(k1, (d_in, d_out), jnp.float32,
                                         -bound, bound).astype(dtype),
            "bias": jax.random.uniform(k2, (d_out,), jnp.float32,
                                       -bound, bound).astype(dtype)}


def _ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _apply_ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _apply_dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _mha(p, q, kv, num_heads):
    """torch nn.MultiheadAttention equivalent (in_proj q/k/v + out_proj)."""
    B, Tq, D = q.shape
    Dh = D // num_heads
    qh = _apply_dense(p["q"], q).reshape(B, Tq, num_heads, Dh)
    kh = _apply_dense(p["k"], kv).reshape(B, -1, num_heads, Dh)
    vh = _apply_dense(p["v"], kv).reshape(B, -1, num_heads, Dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * (Dh ** -0.5)
    a = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", a, vh).reshape(B, Tq, D)
    return _apply_dense(p["out"], out)


def init_adapter(rng, mode: str = "mlp", input_dim: int = 1152,
                 hidden_dim: int = 4096, output_dim: int = 768,
                 num_tokens: int = 77, num_layers: int = 6, num_heads: int = 8,
                 dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(rng, 64))
    if mode == "mlp":
        dims = ([(input_dim, hidden_dim)]
                + [(hidden_dim, hidden_dim)] * (num_layers - 2)
                + [(hidden_dim, output_dim)])
        return {
            "layers": [{"fc": _dense(next(keys), di, do, dtype),
                        "ln": _ln(do, dtype)} for di, do in dims],
        }
    if mode in ("xattn", "xattnffn"):
        blocks = []
        for _ in range(num_layers):
            blk = {
                "attn": {"q": _dense(next(keys), output_dim, output_dim, dtype),
                         "k": _dense(next(keys), output_dim, output_dim, dtype),
                         "v": _dense(next(keys), output_dim, output_dim, dtype),
                         "out": _dense(next(keys), output_dim, output_dim, dtype)},
                "norm1": _ln(output_dim, dtype),
            }
            if mode == "xattnffn":
                blk["ffn"] = {"fc1": _dense(next(keys), output_dim, 4 * output_dim, dtype),
                              "fc2": _dense(next(keys), 4 * output_dim, output_dim, dtype)}
                blk["norm2"] = _ln(output_dim, dtype)
            blocks.append(blk)
        return {
            "token_embeddings": jax.random.normal(
                next(keys), (1, num_tokens, output_dim), jnp.float32).astype(dtype),
            "proj": _dense(next(keys), input_dim, output_dim, dtype),
            "input_norm": _ln(output_dim, dtype),
            "blocks": blocks,
        }
    if mode == "transformer":
        def tfm_layer(cross: bool):
            lay = {
                "self_attn": {"q": _dense(next(keys), hidden_dim, hidden_dim, dtype),
                              "k": _dense(next(keys), hidden_dim, hidden_dim, dtype),
                              "v": _dense(next(keys), hidden_dim, hidden_dim, dtype),
                              "out": _dense(next(keys), hidden_dim, hidden_dim, dtype)},
                "norm1": _ln(hidden_dim, dtype),
                "ffn": {"fc1": _dense(next(keys), hidden_dim, 4 * hidden_dim, dtype),
                        "fc2": _dense(next(keys), 4 * hidden_dim, hidden_dim, dtype)},
                "norm_ffn": _ln(hidden_dim, dtype),
            }
            if cross:
                lay["cross_attn"] = {
                    "q": _dense(next(keys), hidden_dim, hidden_dim, dtype),
                    "k": _dense(next(keys), hidden_dim, hidden_dim, dtype),
                    "v": _dense(next(keys), hidden_dim, hidden_dim, dtype),
                    "out": _dense(next(keys), hidden_dim, hidden_dim, dtype)}
                lay["norm2"] = _ln(hidden_dim, dtype)
            return lay

        return {
            "fc": _dense(next(keys), input_dim, hidden_dim, dtype),
            "encoder": [tfm_layer(False) for _ in range(num_layers)],
            "decoder": [tfm_layer(True) for _ in range(num_layers)],
            "enc_norm": _ln(hidden_dim, dtype),
            "dec_norm": _ln(hidden_dim, dtype),
            "out": _dense(next(keys), hidden_dim, output_dim, dtype),
            "query_embs": jax.random.normal(
                next(keys), (1, num_tokens, hidden_dim), jnp.float32).astype(dtype),
        }
    raise ValueError(f"Unsupported mode: {mode}")


def apply_adapter(params: Params, x: jnp.ndarray, mode: str = "mlp",
                  num_heads: int = 8) -> jnp.ndarray:
    """x: [B, T_in, input_dim] -> [B, T_out, output_dim]."""
    if mode == "mlp":
        layers = params["layers"]
        for lay in layers[:-1]:
            x = _apply_ln(lay["ln"], _apply_dense(lay["fc"], x))
            x = jax.nn.relu(x)
        last = layers[-1]
        return _apply_ln(last["ln"], _apply_dense(last["fc"], x))
    if mode in ("xattn", "xattnffn"):
        B = x.shape[0]
        xp = _apply_ln(params["input_norm"], _apply_dense(params["proj"], x))
        tokens = jnp.broadcast_to(params["token_embeddings"],
                                  (B,) + params["token_embeddings"].shape[1:])
        for blk in params["blocks"]:
            attn = _mha(blk["attn"], tokens, xp, num_heads)
            tokens = _apply_ln(blk["norm1"], tokens + attn)
            if "ffn" in blk:
                h = jax.nn.relu(_apply_dense(blk["ffn"]["fc1"], tokens))
                h = _apply_dense(blk["ffn"]["fc2"], h)
                tokens = _apply_ln(blk["norm2"], tokens + h)
        return tokens
    if mode == "transformer":
        h = _apply_dense(params["fc"], x)
        # pre-norm encoder
        for lay in params["encoder"]:
            n = _apply_ln(lay["norm1"], h)
            h = h + _mha(lay["self_attn"], n, n, 4)
            n = _apply_ln(lay["norm_ffn"], h)
            h = h + _apply_dense(lay["ffn"]["fc2"],
                                 jax.nn.relu(_apply_dense(lay["ffn"]["fc1"], n)))
        memory = _apply_ln(params["enc_norm"], h)
        B = x.shape[0]
        t = jnp.broadcast_to(params["query_embs"],
                             (B,) + params["query_embs"].shape[1:])
        for lay in params["decoder"]:
            n = _apply_ln(lay["norm1"], t)
            t = t + _mha(lay["self_attn"], n, n, 4)
            n = _apply_ln(lay["norm2"], t)
            t = t + _mha(lay["cross_attn"], n, memory, 4)
            n = _apply_ln(lay["norm_ffn"], t)
            t = t + _apply_dense(lay["ffn"]["fc2"],
                                 jax.nn.relu(_apply_dense(lay["ffn"]["fc1"], n)))
        t = _apply_ln(params["dec_norm"], t)
        return _apply_dense(params["out"], t)
    raise ValueError(mode)


def pad_tokens(x: jnp.ndarray, num_tokens: int = 77) -> jnp.ndarray:
    """64 -> 77 zero-padding used by the demo before the SD pipeline
    (`inference/demo.py:137-180`)."""
    B, T, D = x.shape
    if T >= num_tokens:
        return x[:, :num_tokens]
    return jnp.concatenate(
        [x, jnp.zeros((B, num_tokens - T, D), x.dtype)], axis=1)
