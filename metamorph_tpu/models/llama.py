"""LLaMA-3 decoder as pure functions over a param pytree.

TPU-first re-design of the backbone the reference gets from HF `LlamaModel`
(`metamorph/model/language_model/metamorph_llama.py:133-137` riding on
transformers). Differences from a port:

  * layer params are stacked on a leading L axis and the block loop is a
    `lax.scan` — one traced block, fast XLA compiles, clean remat;
  * attention dispatches to a Pallas flash kernel for long sequences;
  * KV-cache decode is a first-class single-token step (the reference decodes
    with use_cache=False, recomputing the full prefix every token —
    `metamorph_llama.py:510`).

Weight layout matches HF LLaMA such that `hf_import.py` is a pure transpose.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from metamorph_tpu.config import LlamaConfig
from metamorph_tpu.ops.attention import attention

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_llama_params(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.bfloat16) -> Params:
    D, F = cfg.hidden_size, cfg.intermediate_size
    H, KV, Dh, L = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    k = jax.random.split(rng, 8)

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) * (fan_in ** -0.5)).astype(dtype)

    params = {
        "embed": {"embedding": dense(k[0], (cfg.vocab_size, D), D)},
        "layers": {
            "attn": {
                "wq": dense(k[1], (L, D, H * Dh), D),
                "wk": dense(k[2], (L, D, KV * Dh), D),
                "wv": dense(k[3], (L, D, KV * Dh), D),
                "wo": dense(k[4], (L, H * Dh, D), H * Dh),
            },
            "mlp": {
                "w_gate": dense(k[5], (L, D, F), D),
                "w_up": dense(k[6], (L, D, F), D),
                "w_down": dense(k[7], (L, F, D), F),
            },
            "input_norm": {"scale": jnp.ones((L, D), dtype)},
            "post_attn_norm": {"scale": jnp.ones((L, D), dtype)},
        },
        "final_norm": {"scale": jnp.ones((D,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": dense(k[0], (D, cfg.vocab_size), D)}
    return params


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * scale.astype(jnp.float32)).astype(dtype)


def _rope_scaled_freqs(cfg: LlamaConfig) -> jnp.ndarray:
    """Inverse frequencies with the LLaMA-3.1 NTK-by-parts scaling."""
    dim = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    if not cfg.rope_scaling:
        return inv_freq
    low_wavelen = cfg.rope_original_max_position / cfg.rope_low_freq_factor
    high_wavelen = cfg.rope_original_max_position / cfg.rope_high_freq_factor
    wavelen = 2.0 * jnp.pi / inv_freq
    scaled = inv_freq / cfg.rope_scaling_factor
    smooth = (cfg.rope_original_max_position / wavelen - cfg.rope_low_freq_factor) / (
        cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
    )
    mid = (1.0 - smooth) * scaled + smooth * inv_freq
    out = jnp.where(wavelen > low_wavelen, scaled, jnp.where(wavelen < high_wavelen, inv_freq, mid))
    return out


def rope_tables(cfg: LlamaConfig, positions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [..., T, Dh/2] for given integer positions [..., T]."""
    inv_freq = _rope_scaled_freqs(cfg)
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., T, Dh/2]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, H, Dh]; cos/sin: [B, T, Dh/2]. HF 'half-rotate' convention.

    The rotation arithmetic runs in x's dtype (cos/sin tables stay fp32 and
    cast at the use site) — matching HF, which applies `q*cos +
    rotate_half(q)*sin` in the activation dtype; the previous fp32 upcast
    cost ~6 extra [B,T,H,Dh] fp32 passes per layer fwd (and again in the
    remat recompute) at B=1/T=16k."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1)


def _lora_dense(layer: Params, name: str, x, cfg: LlamaConfig):
    w = layer[name]
    if isinstance(w, dict):
        # weight-only int8 (serving path, ops/quant.py) — the int8->bf16
        # convert fuses into the dot; scale applies per output channel
        from metamorph_tpu.ops.quant import quantized_matmul

        out = quantized_matmul(x, w)
    else:
        out = x @ w
    a = layer.get(f"{name}_lora_a")
    if a is not None and cfg.lora_r > 0:
        scale = cfg.lora_alpha / cfg.lora_r
        out = out + ((x @ a) @ layer[f"{name}_lora_b"]) * scale
    return out


def _attn_block(layer: Params, cfg: LlamaConfig, x, cos, sin, mask, attn_impl):
    """Self-attention for one layer (training / prefill — full sequence).
    Returns (out, (k, v)) — k/v feed the decode cache at prefill."""
    B, T, D = x.shape
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = _lora_dense(layer, "wq", x, cfg).reshape(B, T, H, Dh)
    k = _lora_dense(layer, "wk", x, cfg).reshape(B, T, KV, Dh)
    v = _lora_dense(layer, "wv", x, cfg).reshape(B, T, KV, Dh)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    # named for the save_attn_qkv remat policy (llama_forward): saving the
    # post-rope tensors lets the backward feed the flash bwd kernels without
    # re-running the qkv projections or rope
    q = checkpoint_name(q, "qkv_rope")
    k = checkpoint_name(k, "qkv_rope")
    v = checkpoint_name(v, "qkv_rope")
    out = attention(q, k, v, mask=mask, impl=attn_impl)
    out = out.reshape(B, T, H * Dh)
    return _lora_dense(layer, "wo", out, cfg), (k, v)


def _mlp_block(layer: Params, x, cfg: LlamaConfig):
    # silu in the activation dtype, as HF LlamaMLP computes it — the explicit
    # fp32 upcast added two [B,T,F] fp32 passes per layer (repeated in the
    # remat recompute) without matching the reference any closer
    gate = jax.nn.silu(_lora_dense(layer, "w_gate", x, cfg))
    up = _lora_dense(layer, "w_up", x, cfg)
    return _lora_dense(layer, "w_down", gate * up, cfg)


def _decoder_layer(cfg: LlamaConfig, attn_impl: str, x, layer_params, cos, sin, mask):
    attn_p, mlp_p = layer_params["attn"], layer_params["mlp"]
    h = rms_norm(x, layer_params["input_norm"]["scale"], cfg.rms_norm_eps)
    attn_out, new_kv = _attn_block(attn_p, cfg, h, cos, sin, mask, attn_impl)
    x = x + attn_out
    h = rms_norm(x, layer_params["post_attn_norm"]["scale"], cfg.rms_norm_eps)
    x = x + _mlp_block(mlp_p, h, cfg)
    return x, new_kv


# ---------------------------------------------------------------------------
# forward (training / prefill)
# ---------------------------------------------------------------------------

def embed_tokens(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    """Token embedding lookup.

    Under a mesh, the table is constrained to replicated for the gather and the
    output to batch-sharded: the gather then has a replicated operand +
    batch-sharded indices, and (because with_sharding_constraint transposes to
    itself) the backward scatter-add produces a replicated [V,D] grad that XLA
    reduce-scatters back to the table's (tensor, fsdp) sharding — instead of
    the involuntary-full-rematerialization fallback GSPMD hits when it must
    reshard the [B,T,D] cotangent from batch- to D-sharded layouts."""
    from jax.sharding import PartitionSpec as P

    from metamorph_tpu.parallel.context import act_spec, constrain

    table = constrain(params["embed"]["embedding"], P(None, None))
    out = jnp.take(table, ids, axis=0)
    if out.ndim == 3:
        out = constrain(out, act_spec(3))
    return out


def llama_forward(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,          # [B, T, D]
    positions: jnp.ndarray,              # [B, T] int32
    attn_mask: jnp.ndarray,              # [B, T] 1 = valid
    attn_impl: str = "xla",
    remat: bool = False,
    return_cache: bool = False,
    remat_policy: str = "dots_no_batch",
):
    """Full-sequence forward. Returns final-norm hidden states [B, T, D]
    (and per-layer stacked (k, v) when return_cache, for decode prefill)."""
    cos, sin = rope_tables(cfg, positions)
    from metamorph_tpu.ops.attention import make_causal_mask

    mask = make_causal_mask(attn_mask) if attn_impl == "xla" else None

    def body(x, layer_params):
        out, kv = _decoder_layer(cfg, attn_impl, x, layer_params, cos, sin, mask)
        return out, (kv if return_cache else None)

    if remat:
        policy = {
            "nothing": jax.checkpoint_policies.nothing_saveable,
            "dots_no_batch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            "dots": jax.checkpoint_policies.checkpoint_dots,
            # also save the flash kernel's (o, lse) so the backward pass does
            # not re-run the attention forward — +[B,T,H*Dh] bf16 per layer of
            # residual memory, worth it at long T where attention dominates
            "dots_no_batch_save_attn": jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names("flash_attn_out")),
            # long-context policy: save ONLY the flash kernel's (o, lse) —
            # the backward recomputes the layer's cheap projections/MLP
            # matmuls (~1/2 the fwd FLOPs at T=16k) but never re-runs the
            # quadratic attention forward. At B=1/T=16k/600m this keeps
            # ~0.5 GB of residuals vs dots_no_batch's ~6.6 GB of dot
            # outputs, which otherwise pins HBM at 15.75/15.75 GB and
            # stretches the optimizer tail ~4x with allocator pressure
            # (measured: scripts/profile_longctx.py vs bench.py step gap).
            "save_attn_only": jax.checkpoint_policies.save_only_these_names(
                "flash_attn_out"),
            # the long-context middle ground: keep the flash (o, lse) AND
            # the post-rope q/k/v (~126 MB/layer at B=1/T=16k) so the
            # backward re-runs neither the quadratic attention forward nor
            # the qkv projections, while the WIDE [T, F] gate/up outputs
            # (~336 MB/layer) are recomputed — ~5.7 TF of recompute buys
            # back ~5 GB of HBM vs dots_no_batch_save_attn, escaping the
            # allocator-pressure regime where the step runs at a full HBM
            # arena (measured faster at T=16k; see docs/TRAIN.md)
            "save_attn_qkv": jax.checkpoint_policies.save_only_these_names(
                "flash_attn_out", "qkv_rope"),
        }[remat_policy]
        body = jax.checkpoint(body, policy=policy)

    x, kvs = jax.lax.scan(body, inputs_embeds, params["layers"])
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps)
    if return_cache:
        return x, kvs  # kvs: tuple of stacked [L, B, T, KV, Dh]
    return x


def lm_head(params: Params, cfg: LlamaConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    if cfg.tie_word_embeddings:
        w = params["embed"]["embedding"].T
    elif isinstance(params["lm_head"]["kernel"], dict):
        from metamorph_tpu.ops.quant import quantized_matmul

        return quantized_matmul(hidden, params["lm_head"]["kernel"]).astype(
            jnp.float32)
    else:
        w = params["lm_head"]["kernel"]
    return (hidden @ w).astype(jnp.float32)


# ---------------------------------------------------------------------------
# KV-cache decode
# ---------------------------------------------------------------------------

def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
                  quantized: bool = False):
    """Decode cache, [L, B, KV, S, Dh]: each (row, kv head) owns a contiguous
    [S, Dh] slab — the layout the Pallas decode-attention kernel streams.

    quantized=True stores int8 entries + per-(token, kv head) fp32 scales
    ([L, B, KV, S]) — halves the cache's HBM traffic, which dominates batched
    decode once S is large. Downstream code detects the mode by the presence
    of "k_scale" (`ops/quant.quantize_kv` is the write-side transform)."""
    L, KV, Dh = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    shape = (L, batch, KV, max_len, Dh)
    if quantized:
        return {"k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "k_scale": jnp.zeros(shape[:-1], jnp.float32),
                "v_scale": jnp.zeros(shape[:-1], jnp.float32)}
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def prefill(params, cfg: LlamaConfig, inputs_embeds, positions, attn_mask,
            cache, attn_impl: str = "xla"):
    """Run the prompt through the model, filling cache[..., :T, :]. Returns
    (hidden [B,T,D], cache)."""
    hidden, (ks, vs) = llama_forward(
        params, cfg, inputs_embeds, positions, attn_mask,
        attn_impl=attn_impl, return_cache=True)
    # ks/vs: [L, B, T, KV, Dh] -> cache layout [L, B, KV, T, Dh]
    ks = ks.transpose(0, 1, 3, 2, 4)
    vs = vs.transpose(0, 1, 3, 2, 4)
    if "k_scale" in cache:                         # int8 KV cache
        from metamorph_tpu.ops.quant import quantize_kv

        kq, k_sc = quantize_kv(ks)
        vq, v_sc = quantize_kv(vs)
        cache = {
            "k": jax.lax.dynamic_update_slice_in_dim(cache["k"], kq, 0, axis=3),
            "v": jax.lax.dynamic_update_slice_in_dim(cache["v"], vq, 0, axis=3),
            "k_scale": jax.lax.dynamic_update_slice_in_dim(
                cache["k_scale"], k_sc, 0, axis=3),
            "v_scale": jax.lax.dynamic_update_slice_in_dim(
                cache["v_scale"], v_sc, 0, axis=3),
        }
        return hidden, cache
    cache = {
        "k": jax.lax.dynamic_update_slice_in_dim(cache["k"], ks.astype(cache["k"].dtype), 0, axis=3),
        "v": jax.lax.dynamic_update_slice_in_dim(cache["v"], vs.astype(cache["v"].dtype), 0, axis=3),
    }
    return hidden, cache


def decode_step(params, cfg: LlamaConfig, x: jnp.ndarray, pos: jnp.ndarray,
                cache, cache_idx: jnp.ndarray, starts=None,
                attn_impl: str = "xla"):
    """One-token step. x: [B, 1, D]; pos: [B, 1]; cache_idx: scalar int
    (number of tokens already in cache, shared) OR [B] int (per-row ragged
    positions, continuous batching). starts [B] marks each row's first valid
    key (left-padded batched prompts). attn_impl: "xla" | "pallas" (the
    decode-attention kernel — TPU; interpret elsewhere).
    Returns (hidden [B,1,D], cache).

    Unlike training/prefill, the layer loop is UNROLLED: a `lax.scan` carry
    would slice the [L, B, KV, S, Dh] cache per layer and restack the updated
    slabs — ~3 full-cache copies of HBM traffic per token. Unrolled, each
    layer does one tiny in-place token write (static layer index, donated
    buffer) plus the unavoidable streaming read by the attention kernel;
    measured 8.0 -> 3.1 ms/step at 600m, B=8, S=4k."""
    from metamorph_tpu.ops.decode_attention import (decode_attention,
                                                    decode_attention_xla)

    B = x.shape[0]
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cos, sin = rope_tables(cfg, pos)
    ck_all, cv_all = cache["k"], cache["v"]        # [L, B, KV, S, Dh]
    quant = "k_scale" in cache                     # int8 KV cache
    cks_all = cache.get("k_scale")                 # [L, B, KV, S] fp32
    cvs_all = cache.get("v_scale")
    if quant:
        from metamorph_tpu.ops.quant import quantize_kv
    ragged = getattr(cache_idx, "ndim", 0) == 1
    if ragged:
        lengths = (cache_idx + 1).astype(jnp.int32)
    else:
        lengths = jnp.full((B,), cache_idx + 1, jnp.int32)
    attn_fn = decode_attention if attn_impl == "pallas" else decode_attention_xla

    for l in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[l], params["layers"])
        attn_p, mlp_p = lp["attn"], lp["mlp"]
        h = rms_norm(x, lp["input_norm"]["scale"], cfg.rms_norm_eps)
        q = _lora_dense(attn_p, "wq", h, cfg).reshape(B, 1, H, Dh)
        k = _lora_dense(attn_p, "wk", h, cfg).reshape(B, 1, KV, Dh)
        v = _lora_dense(attn_p, "wv", h, cfg).reshape(B, 1, KV, Dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if quant:
            k1, k1_sc = quantize_kv(k[:, 0])       # [B, KV, Dh] i8 / [B, KV]
            v1, v1_sc = quantize_kv(v[:, 0])
        else:
            k1 = k[:, 0].astype(ck_all.dtype)      # [B, KV, Dh]
            v1 = v[:, 0].astype(cv_all.dtype)
        if ragged:
            # per-row dynamic_update_slice, NOT a vector-index scatter: XLA
            # updates a DUS chain in place even when the result feeds the
            # Pallas custom_call below, while the equivalent scatter loses
            # aliasing there and copies the full [L,B,KV,S,Dh] cache per
            # layer (measured 49 -> ~3 ms/step at 600m, B=8, S=4k)
            for b in range(B):
                ck_all = jax.lax.dynamic_update_slice(
                    ck_all, k1[b].reshape(1, 1, KV, 1, Dh),
                    (l, b, 0, cache_idx[b], 0))
                cv_all = jax.lax.dynamic_update_slice(
                    cv_all, v1[b].reshape(1, 1, KV, 1, Dh),
                    (l, b, 0, cache_idx[b], 0))
                if quant:
                    cks_all = jax.lax.dynamic_update_slice(
                        cks_all, k1_sc[b].reshape(1, 1, KV, 1),
                        (l, b, 0, cache_idx[b]))
                    cvs_all = jax.lax.dynamic_update_slice(
                        cvs_all, v1_sc[b].reshape(1, 1, KV, 1),
                        (l, b, 0, cache_idx[b]))
        else:
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, k1[None, :, :, None, :], (l, 0, 0, cache_idx, 0))
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, v1[None, :, :, None, :], (l, 0, 0, cache_idx, 0))
            if quant:
                cks_all = jax.lax.dynamic_update_slice(
                    cks_all, k1_sc[None, :, :, None], (l, 0, 0, cache_idx))
                cvs_all = jax.lax.dynamic_update_slice(
                    cvs_all, v1_sc[None, :, :, None], (l, 0, 0, cache_idx))
        if attn_impl == "pallas":
            # hand the kernel the whole stacked cache + a static layer offset
            # (a sliced operand would force an [B,KV,S,Dh] copy per layer)
            out = attn_fn(q[:, 0], ck_all, cv_all, lengths, starts=starts,
                          layer=l, k_scale=cks_all, v_scale=cvs_all)
        else:
            out = attn_fn(q[:, 0], ck_all[l], cv_all[l], lengths,
                          starts=starts,
                          k_scale=cks_all[l] if quant else None,
                          v_scale=cvs_all[l] if quant else None)
        x = x + _lora_dense(attn_p, "wo", out.reshape(B, 1, H * Dh), cfg)
        h2 = rms_norm(x, lp["post_attn_norm"]["scale"], cfg.rms_norm_eps)
        x = x + _mlp_block(mlp_p, h2, cfg)

    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps)
    out_cache = {"k": ck_all, "v": cv_all}
    if quant:
        out_cache["k_scale"], out_cache["v_scale"] = cks_all, cvs_all
    return x, out_cache


def _chunk_attention(q, ks, vs, chunk_pos, scale):
    """Causal attention of a prompt chunk against one row's cache slab.
    q: [C, H, Dh]; ks/vs: [KV, S, Dh]; chunk_pos: [C] absolute positions.
    Chunk token c may read keys at positions <= chunk_pos[c] (its own K/V was
    written into the slab before this call). Fully-masked rows (padding
    tokens) produce finite garbage that the caller discards."""
    C, H, Dh = q.shape
    KV, S, _ = ks.shape
    G = H // KV
    # keep the dots in the input dtype with fp32 ACCUMULATION — an fp32 cast
    # before the einsum would push a [C, S]-sized matmul off the MXU
    out_dtype = q.dtype
    if q.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        # CPU thunk runtime can't execute bf16 x bf16 -> f32 dots
        q, ks, vs = (a.astype(jnp.float32) for a in (q, ks, vs))
    qg = q.reshape(C, KV, G, Dh)
    s = jnp.einsum("ckgd,ksd->kgcs", qg, ks,
                   preferred_element_type=jnp.float32) * scale
    mask = jnp.arange(S)[None, :] <= chunk_pos[:, None]          # [C, S]
    s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("kgcs,ksd->ckgd", p.astype(vs.dtype), vs,
                   preferred_element_type=jnp.float32)
    return o.reshape(C, H, Dh).astype(out_dtype)


def decode_chunk_step(params, cfg: LlamaConfig, xc: jnp.ndarray,
                      chunk_pos: jnp.ndarray, cache,
                      attn_impl: str = "xla"):
    """Speculative-verification step (B=1 cache): run C token embeddings
    `xc [C, D]` at contiguous positions `chunk_pos [C]` against row 0's
    cache with causal-within-chunk attention, writing all C K/V entries at
    chunk_pos. Returns (h [C, D], cache).

    The caller (inference/spec_decode.py) accepts a verified prefix and
    rolls its cache_len back to it; entries past the accepted point are
    stale but harmless — attention masks by length, and the next chunk
    (which starts at the rolled-back position and spans >= the overhang)
    overwrites them before the length can reach them. Weight reads dominate
    B=1 decode, so this C-token step costs ~one plain decode_step — that is
    the entire speculative-decoding bet on TPU."""
    from metamorph_tpu.ops.decode_attention import chunk_attention

    C = xc.shape[0]
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    scale = Dh ** -0.5
    ck_all, cv_all = cache["k"], cache["v"]        # [L, 1, KV, S, Dh]
    quant = "k_scale" in cache
    cks_all = cache.get("k_scale")
    cvs_all = cache.get("v_scale")
    if quant:
        from metamorph_tpu.ops.quant import quantize_kv
    S = ck_all.shape[3]
    cos, sin = rope_tables(cfg, chunk_pos[None])
    p0 = chunk_pos[0]
    x = xc[None]                                   # [1, C, D]

    for l in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[l], params["layers"])
        attn_p, mlp_p = lp["attn"], lp["mlp"]
        h = rms_norm(x, lp["input_norm"]["scale"], cfg.rms_norm_eps)
        q = _lora_dense(attn_p, "wq", h, cfg).reshape(1, C, H, Dh)
        k = _lora_dense(attn_p, "wk", h, cfg).reshape(1, C, KV, Dh)
        v = _lora_dense(attn_p, "wv", h, cfg).reshape(1, C, KV, Dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kc_f = k[0].transpose(1, 0, 2)             # [KV, C, Dh]
        vc_f = v[0].transpose(1, 0, 2)
        if quant:
            kc, kc_sc = quantize_kv(kc_f)
            vc, vc_sc = quantize_kv(vc_f)
            cks_all = jax.lax.dynamic_update_slice(
                cks_all, kc_sc[None, None], (l, 0, 0, p0))
            cvs_all = jax.lax.dynamic_update_slice(
                cvs_all, vc_sc[None, None], (l, 0, 0, p0))
        else:
            kc = kc_f.astype(ck_all.dtype)
            vc = vc_f.astype(cv_all.dtype)
        ck_all = jax.lax.dynamic_update_slice(
            ck_all, kc[None, None], (l, 0, 0, p0, 0))
        cv_all = jax.lax.dynamic_update_slice(
            cv_all, vc[None, None], (l, 0, 0, p0, 0))
        if attn_impl == "pallas":
            out = chunk_attention(q[0], ck_all, cv_all, jnp.int32(0), p0,
                                  layer=l, k_scale=cks_all, v_scale=cvs_all)
        else:
            slab_k = ck_all[l, 0]
            slab_v = cv_all[l, 0]
            if quant:
                slab_k = slab_k.astype(jnp.float32) * cks_all[l, 0][..., None]
                slab_v = slab_v.astype(jnp.float32) * cvs_all[l, 0][..., None]
            out = _chunk_attention(q[0], slab_k, slab_v, chunk_pos, scale)
        x = x + _lora_dense(attn_p, "wo", out.reshape(C, H * Dh)[None], cfg)
        h2 = rms_norm(x, lp["post_attn_norm"]["scale"], cfg.rms_norm_eps)
        x = x + _mlp_block(mlp_p, h2, cfg)

    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps)
    out_cache = {"k": ck_all, "v": cv_all}
    if quant:
        out_cache["k_scale"], out_cache["v_scale"] = cks_all, cvs_all
    return x[0], out_cache


def _chunk_attention_batched(q, ks, vs, chunk_phys, starts, scale):
    """Per-row causal chunk attention over the whole batch.
    q: [B, C, H, Dh]; ks/vs: [B, KV, S, Dh]; chunk_phys: [B, C] physical key
    slots of each row's chunk tokens; starts: [B] first valid key per row
    (left-padded batched prompts). Chunk token c of row b reads keys at
    starts[b] <= j <= chunk_phys[b, c]."""
    B, C, H, Dh = q.shape
    KV, S = ks.shape[1], ks.shape[2]
    G = H // KV
    out_dtype = q.dtype
    if q.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        q, ks, vs = (a.astype(jnp.float32) for a in (q, ks, vs))
    qg = q.reshape(B, C, KV, G, Dh)
    s = jnp.einsum("bckgd,bksd->bkgcs", qg, ks,
                   preferred_element_type=jnp.float32) * scale
    j = jnp.arange(S)
    mask = ((j[None, None] <= chunk_phys[:, :, None])
            & (j[None, None] >= starts[:, None, None]))        # [B, C, S]
    s = jnp.where(mask[:, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgcs,bksd->bckgd", p.astype(vs.dtype), vs,
                   preferred_element_type=jnp.float32)
    return o.reshape(B, C, H, Dh).astype(out_dtype)


def decode_chunk_step_batched(params, cfg: LlamaConfig, xc: jnp.ndarray,
                              rope_pos: jnp.ndarray, write_pos: jnp.ndarray,
                              starts: jnp.ndarray, cache,
                              attn_impl: str = "xla"):
    """Batched speculative-verification step: run C token embeddings per row
    (`xc [B, C, D]`) at logical RoPE positions `rope_pos [B, C]`, writing each
    row's C K/V entries at contiguous physical slots starting `write_pos [B]`
    (rows are ragged in time — different rows verify at different depths).
    `starts [B]` masks left padding. Returns (h [B, C, D], cache).

    Why this pays at B>1: batched decode is bound by TWO HBM streams — the
    weights (amortized over B) and the per-row cache read (NOT amortized).
    A C-token chunk reads both streams once for C candidates per row, so
    accepted drafts amortize the cache stream too, which single-token
    batched decode never can. Same rollback contract as `decode_chunk_step`:
    entries past a row's accepted point are stale but are overwritten by the
    next chunk before its length can reach them.

    attn_impl "pallas" routes through the batched chunk kernel
    (ops/decode_attention.chunk_attention_batched) and requires starts == 0
    (unpadded rows — the serving layout); "xla" handles arbitrary left
    padding."""
    from metamorph_tpu.ops.decode_attention import chunk_attention_batched

    B, C, _ = xc.shape
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    scale = Dh ** -0.5
    ck_all, cv_all = cache["k"], cache["v"]        # [L, B, KV, S, Dh]
    quant = "k_scale" in cache
    cks_all = cache.get("k_scale")
    cvs_all = cache.get("v_scale")
    if quant:
        from metamorph_tpu.ops.quant import quantize_kv
    cos, sin = rope_tables(cfg, rope_pos)          # [B, C, Dh/2]
    chunk_phys = write_pos[:, None] + jnp.arange(C, dtype=jnp.int32)[None]
    x = xc

    for l in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[l], params["layers"])
        attn_p, mlp_p = lp["attn"], lp["mlp"]
        h = rms_norm(x, lp["input_norm"]["scale"], cfg.rms_norm_eps)
        q = _lora_dense(attn_p, "wq", h, cfg).reshape(B, C, H, Dh)
        k = _lora_dense(attn_p, "wk", h, cfg).reshape(B, C, KV, Dh)
        v = _lora_dense(attn_p, "wv", h, cfg).reshape(B, C, KV, Dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kc_f = k.transpose(0, 2, 1, 3)             # [B, KV, C, Dh]
        vc_f = v.transpose(0, 2, 1, 3)
        if quant:
            kc, kc_sc = quantize_kv(kc_f)          # i8 [B,KV,C,Dh] / [B,KV,C]
            vc, vc_sc = quantize_kv(vc_f)
        else:
            kc = kc_f.astype(ck_all.dtype)
            vc = vc_f.astype(cv_all.dtype)
        # per-row DUS chain, not a vector scatter — see decode_step: the
        # scatter loses in-place updating and copies the full cache per layer
        for b in range(B):
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, kc[b][None, None], (l, b, 0, write_pos[b], 0))
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, vc[b][None, None], (l, b, 0, write_pos[b], 0))
            if quant:
                cks_all = jax.lax.dynamic_update_slice(
                    cks_all, kc_sc[b][None, None], (l, b, 0, write_pos[b]))
                cvs_all = jax.lax.dynamic_update_slice(
                    cvs_all, vc_sc[b][None, None], (l, b, 0, write_pos[b]))
        if attn_impl == "pallas":
            # batched chunk kernel: one grid program per (row, kv head,
            # cache block), per-row ragged offsets; contract: starts == 0
            out = chunk_attention_batched(q, ck_all, cv_all, write_pos,
                                          layer=l, k_scale=cks_all,
                                          v_scale=cvs_all)
        else:
            slab_k = ck_all[l]
            slab_v = cv_all[l]
            if quant:
                slab_k = slab_k.astype(jnp.float32) * cks_all[l][..., None]
                slab_v = slab_v.astype(jnp.float32) * cvs_all[l][..., None]
            out = _chunk_attention_batched(q, slab_k, slab_v, chunk_phys,
                                           starts, scale)
        x = x + _lora_dense(attn_p, "wo", out.reshape(B, C, H * Dh), cfg)
        h2 = rms_norm(x, lp["post_attn_norm"]["scale"], cfg.rms_norm_eps)
        x = x + _mlp_block(mlp_p, h2, cfg)

    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps)
    out_cache = {"k": ck_all, "v": cv_all}
    if quant:
        out_cache["k_scale"], out_cache["v_scale"] = cks_all, cvs_all
    return x, out_cache


def decode_step_with_chunk(params, cfg: LlamaConfig, x: jnp.ndarray,
                           pos: jnp.ndarray, cache, cache_idx: jnp.ndarray,
                           chunk: jnp.ndarray, chunk_pos: jnp.ndarray,
                           chunk_mask: jnp.ndarray, fill_slot: jnp.ndarray,
                           attn_impl: str = "xla"):
    """One decode step for every row PLUS one prompt chunk for row
    `fill_slot`, fused so the chunk's projections/MLP ride the same weight
    reads the (HBM-bound) decode step already pays for — chunked prefill that
    overlaps with the decode stream instead of serializing against it
    (vLLM-style; the reference has no serving path at all,
    `metamorph_llama.py:502-597` is B=1 full recompute).

    x: [B, 1, D] decode inputs; pos/cache_idx: per-row ragged positions [B].
    chunk: [C, D] prompt-chunk embeddings for row fill_slot; chunk_pos: [C]
    absolute positions; chunk_mask: [C] validity (False tokens neither write
    cache nor produce usable hiddens). Returns (h_dec [B,1,D], h_chunk [C,D],
    cache)."""
    from metamorph_tpu.ops.decode_attention import (decode_attention,
                                                    decode_attention_xla)

    B = x.shape[0]
    C = chunk.shape[0]
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    scale = Dh ** -0.5
    ck_all, cv_all = cache["k"], cache["v"]        # [L, B, KV, S, Dh]
    quant = "k_scale" in cache                     # int8 KV cache
    cks_all = cache.get("k_scale")                 # [L, B, KV, S] fp32
    cvs_all = cache.get("v_scale")
    if quant:
        from metamorph_tpu.ops.quant import quantize_kv
    S = ck_all.shape[3]
    lengths = (cache_idx + 1).astype(jnp.int32)
    attn_fn = decode_attention if attn_impl == "pallas" else decode_attention_xla

    # combined RoPE tables: decode rows then chunk tokens, [1, B+C]
    all_pos = jnp.concatenate([pos[:, 0], chunk_pos])[None]
    cos, sin = rope_tables(cfg, all_pos)

    xc = chunk[None].astype(x.dtype)               # [1, C, D]
    chunk_off = chunk_pos[0]                       # chunk region start
    cm = chunk_mask[:, None]

    for l in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[l], params["layers"])
        attn_p, mlp_p = lp["attn"], lp["mlp"]
        h_d = rms_norm(x, lp["input_norm"]["scale"], cfg.rms_norm_eps)
        h_c = rms_norm(xc, lp["input_norm"]["scale"], cfg.rms_norm_eps)
        # ONE projection matmul over decode tokens + chunk tokens
        hcat = jnp.concatenate([h_d[:, 0][None], h_c], axis=1)   # [1, B+C, D]
        q = _lora_dense(attn_p, "wq", hcat, cfg).reshape(1, B + C, H, Dh)
        k = _lora_dense(attn_p, "wk", hcat, cfg).reshape(1, B + C, KV, Dh)
        v = _lora_dense(attn_p, "wv", hcat, cfg).reshape(1, B + C, KV, Dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        # decode-token cache writes (per-row ragged; junk for the fill row —
        # the scheduler parks its cache_idx at the end of the chunk region).
        # Per-row DUS, not a vector scatter — see decode_step: the scatter
        # loses in-place updating against the Pallas consumer and copies the
        # full cache per layer.
        if quant:
            k1, k1_sc = quantize_kv(k[0, :B])       # [B, KV, Dh] i8 / [B, KV]
            v1, v1_sc = quantize_kv(v[0, :B])
        else:
            k1 = k[0, :B].astype(ck_all.dtype)      # [B, KV, Dh]
            v1 = v[0, :B].astype(cv_all.dtype)
        for b in range(B):
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, k1[b].reshape(1, 1, KV, 1, Dh),
                (l, b, 0, cache_idx[b], 0))
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, v1[b].reshape(1, 1, KV, 1, Dh),
                (l, b, 0, cache_idx[b], 0))
            if quant:
                cks_all = jax.lax.dynamic_update_slice(
                    cks_all, k1_sc[b].reshape(1, 1, KV, 1),
                    (l, b, 0, cache_idx[b]))
                cvs_all = jax.lax.dynamic_update_slice(
                    cvs_all, v1_sc[b].reshape(1, 1, KV, 1),
                    (l, b, 0, cache_idx[b]))
        # chunk cache writes: [KV, C, Dh] into [fill_slot, :, off:off+C];
        # masked tokens keep the existing cache values (an unmasked write
        # could clobber generated KV after admission)
        kc_f = k[0, B:].transpose(1, 0, 2)                       # [KV, C, Dh]
        vc_f = v[0, B:].transpose(1, 0, 2)
        sel = chunk_mask[None, :, None]
        if quant:
            kc, kc_sc = quantize_kv(kc_f)           # [KV, C] scales
            vc, vc_sc = quantize_kv(vc_f)
            old_ks = jax.lax.dynamic_slice(
                cks_all, (l, fill_slot, 0, chunk_off), (1, 1, KV, C))[0, 0]
            old_vs = jax.lax.dynamic_slice(
                cvs_all, (l, fill_slot, 0, chunk_off), (1, 1, KV, C))[0, 0]
            kc_sc = jnp.where(chunk_mask[None, :], kc_sc, old_ks)[None, None]
            vc_sc = jnp.where(chunk_mask[None, :], vc_sc, old_vs)[None, None]
            cks_all = jax.lax.dynamic_update_slice(
                cks_all, kc_sc, (l, fill_slot, 0, chunk_off))
            cvs_all = jax.lax.dynamic_update_slice(
                cvs_all, vc_sc, (l, fill_slot, 0, chunk_off))
        else:
            kc = kc_f.astype(ck_all.dtype)
            vc = vc_f.astype(cv_all.dtype)
        old_k = jax.lax.dynamic_slice(
            ck_all, (l, fill_slot, 0, chunk_off, 0), (1, 1, KV, C, Dh))[0, 0]
        old_v = jax.lax.dynamic_slice(
            cv_all, (l, fill_slot, 0, chunk_off, 0), (1, 1, KV, C, Dh))[0, 0]
        kc = jnp.where(sel, kc, old_k)[None, None]
        vc = jnp.where(sel, vc, old_v)[None, None]
        ck_all = jax.lax.dynamic_update_slice(
            ck_all, kc, (l, fill_slot, 0, chunk_off, 0))
        cv_all = jax.lax.dynamic_update_slice(
            cv_all, vc, (l, fill_slot, 0, chunk_off, 0))
        # decode attention over the (updated) cache
        q_dec = q[0, :B]
        if attn_impl == "pallas":
            out_d = attn_fn(q_dec, ck_all, cv_all, lengths, layer=l,
                            k_scale=cks_all, v_scale=cvs_all)
            # streaming chunk kernel: reads the fill row's slab straight out
            # of the stacked cache — no slab copy, no [C, S] score buffer
            from metamorph_tpu.ops.decode_attention import chunk_attention

            out_c = chunk_attention(q[0, B:], ck_all, cv_all, fill_slot,
                                    chunk_off, layer=l,
                                    k_scale=cks_all, v_scale=cvs_all)
        else:
            out_d = attn_fn(q_dec, ck_all[l], cv_all[l], lengths,
                            k_scale=cks_all[l] if quant else None,
                            v_scale=cvs_all[l] if quant else None)
            # XLA fallback (CPU/tests): slab slice + masked dots
            slab_k = jax.lax.dynamic_slice(
                ck_all, (l, fill_slot, 0, 0, 0), (1, 1, KV, S, Dh))[0, 0]
            slab_v = jax.lax.dynamic_slice(
                cv_all, (l, fill_slot, 0, 0, 0), (1, 1, KV, S, Dh))[0, 0]
            if quant:
                sl_ks = jax.lax.dynamic_slice(
                    cks_all, (l, fill_slot, 0, 0), (1, 1, KV, S))[0, 0]
                sl_vs = jax.lax.dynamic_slice(
                    cvs_all, (l, fill_slot, 0, 0), (1, 1, KV, S))[0, 0]
                slab_k = slab_k.astype(jnp.float32) * sl_ks[..., None]
                slab_v = slab_v.astype(jnp.float32) * sl_vs[..., None]
            out_c = _chunk_attention(q[0, B:], slab_k, slab_v, chunk_pos,
                                     scale)
        # combined output projection + residual
        ocat = jnp.concatenate([out_d.reshape(B, H * Dh)[None],
                                out_c.reshape(C, H * Dh)[None]], axis=1)
        proj = _lora_dense(attn_p, "wo", ocat, cfg)              # [1, B+C, D]
        x = x + proj[0, :B][:, None]
        xc = xc + proj[:, B:]
        # combined MLP
        h2_d = rms_norm(x, lp["post_attn_norm"]["scale"], cfg.rms_norm_eps)
        h2_c = rms_norm(xc, lp["post_attn_norm"]["scale"], cfg.rms_norm_eps)
        h2 = jnp.concatenate([h2_d[:, 0][None], h2_c], axis=1)
        mlp_out = _mlp_block(mlp_p, h2, cfg)
        x = x + mlp_out[0, :B][:, None]
        xc = xc + mlp_out[:, B:]

    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps)
    xc = rms_norm(xc, params["final_norm"]["scale"], cfg.rms_norm_eps)
    out_cache = {"k": ck_all, "v": cv_all}
    if quant:
        out_cache["k_scale"], out_cache["v_scale"] = cks_all, cvs_all
    return x, xc[0], out_cache
