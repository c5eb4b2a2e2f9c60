"""Unified multimodal greedy decode with a real KV cache.

Re-implements the reference decode state machine
(`metamorph/model/language_model/metamorph_llama.py:502-597`) inside a
`lax.while_loop` over a KV cache. The reference forces use_cache=False and
recomputes the whole growing sequence every token (O(T^2) decode,
`metamorph_llama.py:510,524`); here each iteration is a single-token
`decode_step`, mathematically identical because attention is causal.

State machine (same transitions as the reference):
  * token 128256 <image_start> (while not in image mode) -> enter image mode;
  * in image mode, for K steps: the model's last hidden is replaced by
    mm_projector(vision_head(hidden)) (the continuous-token feedback trick,
    `metamorph_llama.py:363-377`), the 1152-d prediction is recorded, and the
    projected embedding is fed back as the next input; after K tokens exit;
  * token 128257 <image_end> -> exit image mode;
  * anything else -> append its text embedding and record the id;
  * stop on eos (128001/128009) — checked every iteration, even mid-image,
    exactly like the reference (`:578-582`).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from metamorph_tpu.config import MetaMorphConfig
from metamorph_tpu.constants import (IM_END_TOKEN_ID, IM_START_TOKEN_ID,
                                     LLAMA3_EOS_IDS)
from metamorph_tpu.models import llama as llama_lib
from metamorph_tpu.models import metamorph as mm_lib
from metamorph_tpu.models import projector as proj_lib


class DecodeState(NamedTuple):
    rng: jax.Array
    cache: Dict[str, jnp.ndarray]
    cache_len: jnp.ndarray        # int32 — tokens currently in cache
    next_embed: jnp.ndarray       # [1, 1, D] — input for the next step
    in_image: jnp.ndarray         # bool
    img_count: jnp.ndarray        # int32 — tokens emitted for current image
    ids: jnp.ndarray              # [max_new] int32 (pad = -1)
    n_ids: jnp.ndarray            # int32
    img_embeds: jnp.ndarray       # [max_img_tokens, Dv] fp32
    n_img: jnp.ndarray            # int32
    steps: jnp.ndarray            # int32 — total iterations (ref counter)
    done: jnp.ndarray             # bool


def _project_pred(params, cfg: MetaMorphConfig, pred_z: jnp.ndarray) -> jnp.ndarray:
    """mm_projector(vision_head output) — the continuous token fed back."""
    acts = mm_lib._proj_acts(cfg)
    dtype = params["llama"]["embed"]["embedding"].dtype
    return proj_lib.apply_stack(params["projector"], acts, pred_z.astype(dtype))


def _sample_token(rng, logits, temperature: float, top_p: float):
    """Temperature + nucleus sampling (the reference exposes sampling through
    its HF-generate fallback, metamorph_llama.py:712-717)."""
    logits = logits / jnp.maximum(temperature, 1e-6)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)  # keep at least 1
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -1e30, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def _advance(params, cfg: MetaMorphConfig, state: DecodeState,
             h_last: jnp.ndarray, K: int, max_new: int,
             stop_ids: tuple = (), do_sample: bool = False,
             temperature: float = 1.0, top_p: float = 1.0) -> DecodeState:
    """Apply the state machine to the hidden state of the newest position.

    Tail-latency notes (this runs once per generated token; at 600m/int8 the
    surrounding plumbing was ~22% of the per-token budget): buffer updates are
    dynamic_update_slice on a gathered old value, never `.at[dyn].set`
    scatters (TPU lowers 1-element scatters much worse than DUS); the
    conditional image write is a select, not `lax.cond` (a cond is a separate
    sub-computation call per step); the rng split is skipped entirely for
    greedy decode."""
    logits = llama_lib.lm_head(params["llama"], cfg.llama, h_last)  # [1, V]
    if do_sample:
        rng, k_sample = jax.random.split(state.rng)
        next_token = _sample_token(k_sample, logits, temperature, top_p)
    else:
        rng = state.rng
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # [1]
    tok = next_token[0]

    pred_z = mm_lib.apply_vision_head(params, cfg, h_last)           # [1, Dv] fp32
    prediction = _project_pred(params, cfg, pred_z)                  # [1, D]
    tok_embed = llama_lib.embed_tokens(params["llama"], next_token)  # [1, D]

    is_start = jnp.logical_and(~state.in_image, tok == IM_START_TOKEN_ID)
    emit_image = jnp.logical_and(state.in_image, state.img_count < K)
    is_end = jnp.logical_and(~emit_image, jnp.logical_and(~is_start,
                                                          tok == IM_END_TOKEN_ID))

    # record the generated id for every branch except continuous emission
    record = ~emit_image
    old_id = jax.lax.dynamic_slice(state.ids, (state.n_ids,), (1,))
    ids = jax.lax.dynamic_update_slice(
        state.ids, jnp.where(record, tok, old_id[0])[None], (state.n_ids,))
    n_ids = state.n_ids + record.astype(jnp.int32)

    # record the 1152-d prediction during emission (select + DUS, no cond)
    old_row = jax.lax.dynamic_slice(
        state.img_embeds, (state.n_img, 0), (1, state.img_embeds.shape[1]))
    img_embeds = jax.lax.dynamic_update_slice(
        state.img_embeds, jnp.where(emit_image, pred_z, old_row),
        (state.n_img, 0))
    n_img = state.n_img + emit_image.astype(jnp.int32)
    img_count = jnp.where(emit_image, state.img_count + 1, state.img_count)

    # image-mode transitions
    in_image = state.in_image
    in_image = jnp.where(is_start, True, in_image)
    in_image = jnp.where(jnp.logical_and(emit_image, img_count >= K), False, in_image)
    in_image = jnp.where(is_end, False, in_image)
    # NOTE: like the reference, the counter resets ONLY on <image_end>
    # (`metamorph_llama.py:565-567`) — a second <image_start> without an
    # intervening <image_end> emits no image tokens. Faithful quirk.
    img_count = jnp.where(is_end, 0, img_count)

    next_embed = jnp.where(emit_image, prediction, tok_embed)[None]  # [1,1,D]

    steps = state.steps + 1
    is_eos = jnp.isin(tok, jnp.asarray(tuple(LLAMA3_EOS_IDS) + stop_ids, jnp.int32))
    buffer_full = n_img >= state.img_embeds.shape[0]
    done = state.done | is_eos | (steps >= max_new) | buffer_full

    return DecodeState(
        rng=rng, cache=state.cache, cache_len=state.cache_len,
        next_embed=next_embed, in_image=in_image, img_count=img_count, ids=ids,
        n_ids=n_ids, img_embeds=img_embeds, n_img=n_img, steps=steps, done=done)


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "max_images",
                                             "max_cache_len", "stop_ids",
                                             "do_sample", "temperature", "top_p",
                                             "prefill_attn_impl", "attn_impl",
                                             "kv_int8", "start_in_image"))
def greedy_decode(
    params: Any,
    cfg: MetaMorphConfig,
    prompt_embeds: jnp.ndarray,   # [1, T0, D] fused prompt
    max_new_tokens: int = 256,
    max_images: int = 4,
    max_cache_len: int = 0,
    stop_ids: tuple = (),         # extra stop token ids (KeywordsStoppingCriteria
                                  # analog, mm_utils.py:226-258)
    do_sample: bool = False,
    temperature: float = 1.0,
    top_p: float = 1.0,
    sample_rng: jax.Array | None = None,
    prefill_attn_impl: str = "xla",  # "flash" for long prompts: the [T0,T0]
                                     # score matrix never materializes (the
                                     # unpadded single row satisfies the flash
                                     # kernel's right-padded-lengths contract)
    attn_impl: str = "xla",          # per-step cache attention: "pallas" = the
                                     # decode kernel (ops/decode_attention.py)
    kv_int8: bool = False,           # int8 KV cache (half the cache's HBM
                                     # traffic; ops/quant.quantize_kv scheme)
    start_in_image: bool = False,    # parity-harness convention: treat the
                                     # prompt's final token as an already-
                                     # consumed <image_start> and begin in
                                     # image mode — the state machine after
                                     # entry is identical to organic entry
                                     # (`metamorph_llama.py:547-574`); used to
                                     # certify the 64-step continuous-feedback
                                     # loop deterministically
) -> Dict[str, jnp.ndarray]:
    """Returns {"ids": [max_new], "n_ids": (), "image_embeds": [max_images*K, Dv],
    "n_image_tokens": ()}. ids padded with -1."""
    K = cfg.mm.num_image_tokens
    D = cfg.llama.hidden_size
    Dv = cfg.siglip.hidden_size
    T0 = prompt_embeds.shape[1]
    cache_len_total = max_cache_len or (T0 + max_new_tokens + 8)

    dtype = prompt_embeds.dtype
    cache = llama_lib.init_kv_cache(cfg.llama, 1, cache_len_total, dtype=dtype,
                                    quantized=kv_int8)
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    h_all, cache = llama_lib.prefill(
        params["llama"], cfg.llama, prompt_embeds, pos,
        jnp.ones((1, T0), jnp.int32), cache, attn_impl=prefill_attn_impl)

    state = DecodeState(
        rng=sample_rng if sample_rng is not None else jax.random.PRNGKey(0),
        cache=cache,
        cache_len=jnp.int32(T0),
        next_embed=jnp.zeros((1, 1, D), dtype),
        in_image=jnp.asarray(bool(start_in_image)),
        img_count=jnp.int32(0),
        ids=jnp.full((max_new_tokens,), -1, jnp.int32),
        n_ids=jnp.int32(0),
        img_embeds=jnp.zeros((max_images * K, Dv), jnp.float32),
        n_img=jnp.int32(0),
        steps=jnp.int32(0),
        done=jnp.asarray(False),
    )
    # first transition comes from the prefill's last hidden state
    state = _advance(params, cfg, state, h_all[:, -1], K, max_new_tokens,
                     stop_ids, do_sample, temperature, top_p)

    def cond(s: DecodeState):
        return ~s.done

    def body(s: DecodeState):
        p = s.cache_len[None, None]  # [1,1] position of the new token
        h, cache = llama_lib.decode_step(
            params["llama"], cfg.llama, s.next_embed, p, s.cache, s.cache_len,
            attn_impl=attn_impl)
        s = s._replace(cache=cache, cache_len=s.cache_len + 1)
        return _advance(params, cfg, s, h[:, 0], K, max_new_tokens, stop_ids,
                        do_sample, temperature, top_p)

    state = jax.lax.while_loop(cond, body, state)
    return {
        "ids": state.ids,
        "n_ids": state.n_ids,
        "image_embeds": state.img_embeds,
        "n_image_tokens": state.n_img,
        "steps": state.steps,
    }


class BatchedDecodeState(NamedTuple):
    rng: jax.Array
    cache: Dict[str, jnp.ndarray]
    cache_len: jnp.ndarray        # scalar int32 — slots filled (shared; left-pad)
    starts: jnp.ndarray           # [B] int32 — first valid cache slot per row
    next_embed: jnp.ndarray       # [B, 1, D]
    prompt_lens: jnp.ndarray      # [B] int32 — real prompt lengths (RoPE pos)
    in_image: jnp.ndarray         # [B] bool
    img_count: jnp.ndarray        # [B] int32
    ids: jnp.ndarray              # [B, max_new] int32 (pad = -1)
    n_ids: jnp.ndarray            # [B] int32
    img_embeds: jnp.ndarray       # [B, C, Dv] fp32
    n_img: jnp.ndarray            # [B] int32
    steps: jnp.ndarray            # scalar int32
    done: jnp.ndarray             # [B] bool


def _advance_batched(params, cfg: MetaMorphConfig, state: BatchedDecodeState,
                     h_last: jnp.ndarray, K: int, max_new: int,
                     stop_ids: tuple = (), do_sample: bool = False,
                     temperature: float = 1.0, top_p: float = 1.0
                     ) -> BatchedDecodeState:
    """Vectorized state machine: every per-sequence scalar of `_advance`
    becomes a [B] lane; finished rows are frozen via the `done` mask."""
    B = h_last.shape[0]
    b_idx = jnp.arange(B)
    logits = llama_lib.lm_head(params["llama"], cfg.llama, h_last)   # [B, V]
    rng, k_sample = jax.random.split(state.rng)
    if do_sample:
        tok = _sample_token(k_sample, logits, temperature, top_p)    # [B]
    else:
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    pred_z = mm_lib.apply_vision_head(params, cfg, h_last)           # [B, Dv]
    prediction = _project_pred(params, cfg, pred_z)                  # [B, D]
    tok_embed = llama_lib.embed_tokens(params["llama"], tok)         # [B, D]

    active = ~state.done
    is_start = active & ~state.in_image & (tok == IM_START_TOKEN_ID)
    emit_image = active & state.in_image & (state.img_count < K)
    is_end = active & ~emit_image & ~is_start & (tok == IM_END_TOKEN_ID)

    record = active & ~emit_image
    old_ids = state.ids[b_idx, state.n_ids]
    ids = state.ids.at[b_idx, state.n_ids].set(jnp.where(record, tok, old_ids))
    n_ids = state.n_ids + record.astype(jnp.int32)

    old_emb = state.img_embeds[b_idx, state.n_img]
    img_embeds = state.img_embeds.at[b_idx, state.n_img].set(
        jnp.where(emit_image[:, None], pred_z, old_emb))
    n_img = state.n_img + emit_image.astype(jnp.int32)
    img_count = jnp.where(emit_image, state.img_count + 1, state.img_count)

    in_image = state.in_image
    in_image = jnp.where(is_start, True, in_image)
    in_image = jnp.where(emit_image & (img_count >= K), False, in_image)
    in_image = jnp.where(is_end, False, in_image)
    img_count = jnp.where(is_end, 0, img_count)  # reference counter quirk

    next_embed = jnp.where(emit_image[:, None, None], prediction[:, None],
                           tok_embed[:, None])

    steps = state.steps + 1
    is_eos = jnp.isin(tok, jnp.asarray(tuple(LLAMA3_EOS_IDS) + stop_ids,
                                       jnp.int32)) & active
    buffer_full = n_img >= state.img_embeds.shape[1]
    done = state.done | is_eos | (steps >= max_new) | buffer_full

    return BatchedDecodeState(
        rng=rng, cache=state.cache, cache_len=state.cache_len,
        starts=state.starts, next_embed=next_embed,
        prompt_lens=state.prompt_lens, in_image=in_image,
        img_count=img_count, ids=ids, n_ids=n_ids, img_embeds=img_embeds,
        n_img=n_img, steps=steps, done=done)


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "max_images",
                                             "max_cache_len", "stop_ids",
                                             "do_sample", "temperature", "top_p",
                                             "attn_impl", "prefill_attn_impl",
                                             "kv_int8"))
def _batched_greedy_decode(
    params: Any,
    cfg: MetaMorphConfig,
    prompt_embeds: jnp.ndarray,   # [B, T0, D] LEFT-padded fused prompts
    prompt_mask: jnp.ndarray,     # [B, T0] 1 = real token
    max_new_tokens: int = 256,
    max_images: int = 4,
    max_cache_len: int = 0,
    stop_ids: tuple = (),
    do_sample: bool = False,
    temperature: float = 1.0,
    top_p: float = 1.0,
    sample_rng: jax.Array | None = None,
    attn_impl: str = "xla",
    prefill_attn_impl: str = "xla",  # "flash" ONLY for right-padded/full
                                     # prompts (the kernel's length masking
                                     # assumes right padding)
    kv_int8: bool = False,
) -> Dict[str, jnp.ndarray]:
    """B>1 multimodal greedy decode (serving path). Prompts must be
    LEFT-padded (pack_sequences padding_side='left') so every row writes the
    same cache slot each step; per-row RoPE positions continue from each
    prompt's real length. Per-row state machine identical to `greedy_decode`.
    Returns {"ids" [B,max_new], "n_ids" [B], "image_embeds" [B,C,Dv],
    "n_image_tokens" [B], "steps" ()}."""
    K = cfg.mm.num_image_tokens
    D = cfg.llama.hidden_size
    Dv = cfg.siglip.hidden_size
    B, T0 = prompt_embeds.shape[:2]
    S = max_cache_len or (T0 + max_new_tokens + 8)

    dtype = prompt_embeds.dtype
    cache = llama_lib.init_kv_cache(cfg.llama, B, S, dtype=dtype,
                                    quantized=kv_int8)
    # left-pad positions: real token i of a row gets position i
    pos = (jnp.cumsum(prompt_mask, axis=1) - 1) * prompt_mask
    h_all, cache = llama_lib.prefill(
        params["llama"], cfg.llama, prompt_embeds, pos.astype(jnp.int32),
        prompt_mask.astype(jnp.int32), cache, attn_impl=prefill_attn_impl)

    prompt_lens = prompt_mask.sum(axis=1).astype(jnp.int32)
    # left-padded prompts: row b's valid keys start at its pad width
    starts = (jnp.int32(T0) - prompt_lens).astype(jnp.int32)

    state = BatchedDecodeState(
        rng=sample_rng if sample_rng is not None else jax.random.PRNGKey(0),
        cache=cache,
        cache_len=jnp.int32(T0),
        starts=starts,
        next_embed=jnp.zeros((B, 1, D), dtype),
        prompt_lens=prompt_lens,
        in_image=jnp.zeros((B,), bool),
        img_count=jnp.zeros((B,), jnp.int32),
        ids=jnp.full((B, max_new_tokens), -1, jnp.int32),
        n_ids=jnp.zeros((B,), jnp.int32),
        img_embeds=jnp.zeros((B, max_images * K, Dv), jnp.float32),
        n_img=jnp.zeros((B,), jnp.int32),
        steps=jnp.int32(0),
        done=jnp.zeros((B,), bool),
    )
    # first transition from the prefill's last (rightmost, left-pad) hidden
    state = _advance_batched(params, cfg, state, h_all[:, -1], K,
                             max_new_tokens, stop_ids, do_sample, temperature,
                             top_p)

    def cond(s: BatchedDecodeState):
        return ~jnp.all(s.done)

    def body(s: BatchedDecodeState):
        # token being fed is generated token #(steps-1) -> position L + steps-1
        p = (s.prompt_lens + s.steps - 1)[:, None]       # [B, 1] RoPE position
        h, cache = llama_lib.decode_step(
            params["llama"], cfg.llama, s.next_embed, p, s.cache, s.cache_len,
            starts=s.starts, attn_impl=attn_impl)
        s = s._replace(cache=cache, cache_len=s.cache_len + 1)
        return _advance_batched(params, cfg, s, h[:, 0], K, max_new_tokens,
                                stop_ids, do_sample, temperature, top_p)

    state = jax.lax.while_loop(cond, body, state)
    return {
        "ids": state.ids,
        "n_ids": state.n_ids,
        "image_embeds": state.img_embeds,
        "n_image_tokens": state.n_img,
        "steps": state.steps,
    }


def batched_greedy_decode(params, cfg, prompt_embeds, prompt_mask, *args,
                          prefill_attn_impl: str = "xla", **kw):
    """Host-side guard + jit dispatch. The flash prefill kernel derives row
    lengths as mask.sum() and masks the TAIL (right padding); this decode
    path LEFT-pads, so 'flash' on an actually-padded batch would silently
    attend wrong. Only unpadded (all-ones mask) batches may use it."""
    if prefill_attn_impl == "flash":
        import numpy as _np
        if not bool(_np.asarray(prompt_mask, bool).all()):
            raise ValueError(
                "prefill_attn_impl='flash' requires an unpadded batch here: "
                "batched_greedy_decode left-pads, but the flash kernel masks "
                "assuming right padding (use 'xla', or equal-length prompts)")
    return _batched_greedy_decode(params, cfg, prompt_embeds, prompt_mask,
                                  *args, prefill_attn_impl=prefill_attn_impl,
                                  **kw)


def generate_batched(params, cfg: MetaMorphConfig, batch: Dict[str, jnp.ndarray],
                     pixels: jnp.ndarray | None = None,
                     max_new_tokens: int = 256, max_images: int = 4,
                     **kw) -> Dict[str, jnp.ndarray]:
    """Batched generate: fuse LEFT-padded prompts (pack_sequences
    padding_side='left'), then batched KV-cache decode."""
    if pixels is not None:
        projected, _ = mm_lib.encode_images(params, cfg, pixels)
        embeds = mm_lib.fuse_embeddings(params, cfg, batch, projected)
    else:
        embeds = llama_lib.embed_tokens(params["llama"], batch["tokens"])
    return batched_greedy_decode(params, cfg, embeds, batch["attn_mask"],
                                 max_new_tokens=max_new_tokens,
                                 max_images=max_images, **kw)


def generate(params, cfg: MetaMorphConfig, batch: Dict[str, jnp.ndarray],
             pixels: jnp.ndarray | None = None, max_new_tokens: int = 256,
             max_images: int = 4, spec_k: int = 1,
             draft: tuple | None = None) -> Dict[str, jnp.ndarray]:
    """Fuse the prompt (images included) then greedy-decode — the reference
    `generate` override (`metamorph_llama.py:665-717`). `spec_k > 1` switches
    to speculative verification with prompt-lookup drafting, or — when
    `draft=(draft_params, draft_cfg)` names a small shared-vocab LLaMA —
    draft-model speculation; the output stream is identical either way."""
    if pixels is not None:
        projected, _ = mm_lib.encode_images(params, cfg, pixels)
        embeds = mm_lib.fuse_embeddings(params, cfg, batch, projected)
    else:
        embeds = llama_lib.embed_tokens(params["llama"], batch["tokens"])
    # strip right padding from the single-row prompt
    n = int(batch["attn_mask"][0].sum())
    embeds = embeds[:, :n]
    if spec_k > 1 and draft is not None:
        from metamorph_tpu.inference.spec_decode import \
            greedy_decode_spec_draft_model

        return greedy_decode_spec_draft_model(
            params, draft[0], cfg, draft[1], embeds, batch["tokens"][0, :n],
            max_new_tokens=max_new_tokens, max_images=max_images,
            spec_k=spec_k)
    if spec_k > 1:
        from metamorph_tpu.inference.spec_decode import greedy_decode_spec

        return greedy_decode_spec(params, cfg, embeds, batch["tokens"][0, :n],
                                  max_new_tokens=max_new_tokens,
                                  max_images=max_images, spec_k=spec_k)
    return greedy_decode(params, cfg, embeds, max_new_tokens=max_new_tokens,
                         max_images=max_images)


def truncate_at_keywords(text: str, keywords) -> str:
    """Host-side keyword stopping for decoded text — the string-matching half
    of the reference's KeywordsStoppingCriteria (`mm_utils.py:226-258`). The
    token-id half is covered by `stop_ids` in `greedy_decode`."""
    cut = len(text)
    for kw in keywords:
        i = text.find(kw)
        if i != -1:
            cut = min(cut, i)
    return text[:cut]
