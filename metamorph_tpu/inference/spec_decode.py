"""Speculative greedy decode: prompt-lookup drafting + chunk verification.

B=1 decode on TPU is bound by streaming the weights from HBM once per token
(`docs/SERVING.md`); a C-token verification chunk (`llama.decode_chunk_step`)
reads the weights ONCE for C candidate tokens, so every accepted draft token
is nearly free. Drafts come from prompt-lookup (n-gram) matching — the
model-free scheme that pays off exactly where multimodal serving spends its
tokens (VQA answers and captions echo the prompt) — and verification is
EXACT: the output ids/image embeds equal `decode.greedy_decode`'s for every
input, accepted drafts or not (pinned by tests/test_spec_decode.py).

Precision caveat: "equal" means equal per-position argmax. The chunk and
single-token compilations reduce in different orders, so on bf16 a RANDOM
-weight model's dense logit near-ties can break differently between the two
paths (which also sinks the accept rate — see bench.py:bench_spec_decode).
Real checkpoints have decisive margins; the fp32 suite pins bitwise equality.

The reference has no speculation and no cache at all — it recomputes the full
sequence per token (`metamorph/model/language_model/metamorph_llama.py:510`).

State-machine interplay: only plain-text tokens ride the accept chain; the
chain stops AT the first special token (<image_start>/<image_end>/eos), whose
transition is applied scalar-wise, and while the row is in image-emission
mode the chunk degenerates to a 1-accept step (continuous tokens cannot be
drafted). Conservative, and exactly equivalent to the plain loop.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from metamorph_tpu.config import MetaMorphConfig
from metamorph_tpu.constants import (IM_END_TOKEN_ID, IM_START_TOKEN_ID,
                                     LLAMA3_EOS_IDS)
from metamorph_tpu.inference.decode import _project_pred
from metamorph_tpu.models import llama as llama_lib
from metamorph_tpu.models import metamorph as mm_lib


class SpecState(NamedTuple):
    cache: Dict[str, jnp.ndarray]
    cache_len: jnp.ndarray        # int32 — valid cache entries
    next_embed: jnp.ndarray       # [1, 1, D]
    in_image: jnp.ndarray         # bool
    img_count: jnp.ndarray        # int32
    ids: jnp.ndarray              # [max_new] int32 (pad -1)
    n_ids: jnp.ndarray            # int32
    img_embeds: jnp.ndarray       # [max_img_tokens, Dv] fp32
    n_img: jnp.ndarray            # int32
    steps: jnp.ndarray            # int32
    done: jnp.ndarray             # bool
    ids_all: jnp.ndarray          # [cap] int32 — prompt ids + recorded ids
    n_all: jnp.ndarray            # int32
    iters: jnp.ndarray            # int32 — chunk steps taken (for metrics)


def _advance1(params, cfg: MetaMorphConfig, state: SpecState,
              h_last: jnp.ndarray, K: int, max_new: int,
              stop_ids: tuple):
    """One full state-machine transition (the exact math of
    `decode._advance`, plus the ids_all append used for drafting). Returns
    (state, tok, emit) so the caller can decide whether the accept chain may
    continue past this token."""
    logits = llama_lib.lm_head(params["llama"], cfg.llama, h_last)   # [1, V]
    next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    tok = next_token[0]

    pred_z = mm_lib.apply_vision_head(params, cfg, h_last)           # [1, Dv]
    prediction = _project_pred(params, cfg, pred_z)                  # [1, D]
    tok_embed = llama_lib.embed_tokens(params["llama"], next_token)  # [1, D]

    is_start = jnp.logical_and(~state.in_image, tok == IM_START_TOKEN_ID)
    emit_image = jnp.logical_and(state.in_image, state.img_count < K)
    is_end = jnp.logical_and(~emit_image,
                             jnp.logical_and(~is_start,
                                             tok == IM_END_TOKEN_ID))

    record = ~emit_image
    old_id = jax.lax.dynamic_slice(state.ids, (state.n_ids,), (1,))
    ids = jax.lax.dynamic_update_slice(
        state.ids, jnp.where(record, tok, old_id[0])[None], (state.n_ids,))
    n_ids = state.n_ids + record.astype(jnp.int32)
    old_all = jax.lax.dynamic_slice(state.ids_all, (state.n_all,), (1,))
    ids_all = jax.lax.dynamic_update_slice(
        state.ids_all, jnp.where(record, tok, old_all[0])[None],
        (state.n_all,))
    n_all = state.n_all + record.astype(jnp.int32)

    old_row = jax.lax.dynamic_slice(
        state.img_embeds, (state.n_img, 0), (1, state.img_embeds.shape[1]))
    img_embeds = jax.lax.dynamic_update_slice(
        state.img_embeds, jnp.where(emit_image, pred_z, old_row),
        (state.n_img, 0))
    n_img = state.n_img + emit_image.astype(jnp.int32)
    img_count = jnp.where(emit_image, state.img_count + 1, state.img_count)

    in_image = state.in_image
    in_image = jnp.where(is_start, True, in_image)
    in_image = jnp.where(jnp.logical_and(emit_image, img_count >= K),
                         False, in_image)
    in_image = jnp.where(is_end, False, in_image)
    img_count = jnp.where(is_end, 0, img_count)  # reference counter quirk

    next_embed = jnp.where(emit_image, prediction, tok_embed)[None]

    steps = state.steps + 1
    is_eos = jnp.isin(tok, jnp.asarray(tuple(LLAMA3_EOS_IDS) + stop_ids,
                                       jnp.int32))
    buffer_full = n_img >= state.img_embeds.shape[0]
    done = state.done | is_eos | (steps >= max_new) | buffer_full

    state = state._replace(
        next_embed=next_embed, in_image=in_image, img_count=img_count,
        ids=ids, n_ids=n_ids, img_embeds=img_embeds, n_img=n_img,
        steps=steps, done=done, ids_all=ids_all, n_all=n_all)
    return state, tok, emit_image


def make_ngram_draft(n_draft: int, max_ngram: int = 3,
                     recent_len_threshold: int = None):
    """Prompt-lookup drafting: find the most recent earlier occurrence of the
    LONGEST matching suffix n-gram (n = max_ngram down to 2) in
    ids_all[:n_all] and propose the n_draft tokens that followed it (-1 where
    no draft). Longer context keys disambiguate repeated bigrams (e.g. 'the'
    pairs), which measurably raises acceptance on structured text. Among
    same-length matches, the most RECENT occurrence wins when its (possibly
    truncated) continuation still covers >= recent_len_threshold tokens
    (default 3/4 of n_draft — recency is the better predictor when
    continuations drift over time); otherwise the latest occurrence with a
    FULL n_draft continuation wins (a too-recent match truncates the draft
    at the end of history — on periodic/echo text an unconditional recency
    preference caps acceptance at the period instead of spec_k: measured
    4.0 vs 8.0 tokens/chunk at K=8). The latest partial match is the final
    fallback. Acceptance measured on four synthetic regimes (order-1 Markov,
    repeated-phrase, drifting-continuation, periodic): the 3/4 threshold
    ties or beats both pure strategies everywhere. O(cap) vector ops per n
    per step."""
    if recent_len_threshold is None:
        recent_len_threshold = max(1, (3 * n_draft) // 4)

    def draft(ids_all: jnp.ndarray, n_all: jnp.ndarray) -> jnp.ndarray:
        cap = ids_all.shape[0]
        start = jnp.int32(-1)           # draft start (position after match)
        for n in range(2, max_ngram + 1):
            p = jnp.arange(cap - n)
            m = jnp.ones((cap - n,), bool)
            for k in range(n):
                tk = jax.lax.dynamic_slice(ids_all, (n_all - n + k,), (1,))[0]
                m = m & (ids_all[k:cap - n + k] == tk)
            # strictly earlier occurrence with >= 1 real token after it
            m = m & (p < n_all - n)
            j_any = jnp.max(jnp.where(m, p, -1))
            j_full = jnp.max(
                jnp.where(m & (p <= n_all - n - n_draft), p, -1))
            recent_ok = (j_any >= 0) & (
                n_all - n - j_any >= recent_len_threshold)
            j = jnp.where(recent_ok, j_any,
                          jnp.where(j_full >= 0, j_full, j_any))
            j = jnp.where(n_all >= n + 1, j, -1)
            # longer n overrides: this loop ends on the longest match found
            start = jnp.where(j >= 0, j + n, start)
        idx = start + jnp.arange(n_draft)
        d = ids_all[jnp.clip(idx, 0, cap - 1)]
        return jnp.where((start >= 0) & (idx < n_all), d, -1)

    return draft


_SPECIAL = (IM_START_TOKEN_ID, IM_END_TOKEN_ID)


def _accept_chain(params, cfg: MetaMorphConfig, s1: SpecState,
                  tok1: jnp.ndarray, emit1: jnp.ndarray,
                  drafts: jnp.ndarray, h: jnp.ndarray, Km1: int,
                  max_new: int, special_arr, eos_arr) -> SpecState:
    """Extra acceptances after the chunk's first (always-applied) transition:
    the plain-text prefix chain through the drafted positions. Shared by the
    prompt-lookup and draft-model B=1 loops."""
    preds = jnp.argmax(
        llama_lib.lm_head(params["llama"], cfg.llama, h[1:]),
        axis=-1).astype(jnp.int32)                           # [Km1]
    base_ok = (~emit1 & ~s1.done
               & ~jnp.isin(tok1, special_arr) & ~s1.in_image)

    ids, ids_all = s1.ids, s1.ids_all
    n_extra = jnp.int32(0)
    last_tok = tok1
    eos_acc = jnp.asarray(False)
    start_acc = jnp.asarray(False)
    end_acc = jnp.asarray(False)
    ok_chain = base_ok
    prev = tok1
    for i in range(Km1):
        ok_i = ok_chain & (drafts[i] == prev)
        acc_i = ok_i & (s1.steps + i < max_new)
        cand = preds[i]
        special_i = jnp.isin(cand, special_arr)
        # record (acceptance is a prefix chain -> slot i past n_ids)
        old = jax.lax.dynamic_slice(ids, (s1.n_ids + i,), (1,))
        ids = jax.lax.dynamic_update_slice(
            ids, jnp.where(acc_i, cand, old[0])[None], (s1.n_ids + i,))
        old_a = jax.lax.dynamic_slice(ids_all, (s1.n_all + i,), (1,))
        ids_all = jax.lax.dynamic_update_slice(
            ids_all, jnp.where(acc_i, cand, old_a[0])[None],
            (s1.n_all + i,))
        n_extra = n_extra + acc_i.astype(jnp.int32)
        last_tok = jnp.where(acc_i, cand, last_tok)
        eos_acc = eos_acc | (acc_i & jnp.isin(cand, eos_arr))
        start_acc = start_acc | (acc_i & (cand == IM_START_TOKEN_ID))
        end_acc = end_acc | (acc_i & (cand == IM_END_TOKEN_ID))
        ok_chain = acc_i & ~special_i
        prev = cand

    any_extra = n_extra > 0
    tok_embed = llama_lib.embed_tokens(params["llama"],
                                       last_tok[None])     # [1, D]
    next_embed = jnp.where(any_extra, tok_embed[None], s1.next_embed)
    steps = s1.steps + n_extra
    return s1._replace(
        ids=ids, ids_all=ids_all,
        n_ids=s1.n_ids + n_extra, n_all=s1.n_all + n_extra,
        cache_len=s1.cache_len + n_extra,
        next_embed=next_embed,
        in_image=jnp.where(start_acc, True, s1.in_image),
        img_count=jnp.where(end_acc, 0, s1.img_count),
        steps=steps,
        done=s1.done | eos_acc | (steps >= max_new))


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_new_tokens", "max_images", "max_cache_len", "stop_ids",
    "prefill_attn_impl", "attn_impl", "kv_int8", "spec_k", "draft_fn"))
def greedy_decode_spec(
    params: Any,
    cfg: MetaMorphConfig,
    prompt_embeds: jnp.ndarray,   # [1, T0, D] fused prompt
    prompt_ids: jnp.ndarray,      # [T0] int32 — drafting source (image-slot
                                  # placeholder ids are fine; they just never
                                  # match a real prediction)
    max_new_tokens: int = 256,
    max_images: int = 4,
    max_cache_len: int = 0,
    stop_ids: tuple = (),
    prefill_attn_impl: str = "xla",
    attn_impl: str = "xla",
    kv_int8: bool = False,
    spec_k: int = 8,              # chunk width: 1 input + spec_k-1 drafts
    draft_fn=None,                # (ids_all, n_all) -> [spec_k-1] int32 | -1
) -> Dict[str, jnp.ndarray]:
    """Greedy decode with speculative verification. Output-identical to
    `decode.greedy_decode` (same ids, image embeds, steps); additionally
    returns "iters" — the number of chunk steps taken (iters == steps means
    no draft ever accepted; iters < steps is the speedup)."""
    K = cfg.mm.num_image_tokens
    D = cfg.llama.hidden_size
    Dv = cfg.siglip.hidden_size
    T0 = prompt_embeds.shape[1]
    Km1 = spec_k - 1
    cache_len_total = max_cache_len or (T0 + max_new_tokens + spec_k + 8)
    if draft_fn is None:
        draft_fn = make_ngram_draft(Km1)

    dtype = prompt_embeds.dtype
    cache = llama_lib.init_kv_cache(cfg.llama, 1, cache_len_total,
                                    dtype=dtype, quantized=kv_int8)
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    h_all, cache = llama_lib.prefill(
        params["llama"], cfg.llama, prompt_embeds, pos,
        jnp.ones((1, T0), jnp.int32), cache, attn_impl=prefill_attn_impl)

    cap = T0 + max_new_tokens + 4
    ids_all = jnp.full((cap,), -1, jnp.int32)
    ids_all = ids_all.at[:T0].set(prompt_ids.astype(jnp.int32))

    state = SpecState(
        cache=cache,
        cache_len=jnp.int32(T0),
        next_embed=jnp.zeros((1, 1, D), dtype),
        in_image=jnp.asarray(False),
        img_count=jnp.int32(0),
        ids=jnp.full((max_new_tokens,), -1, jnp.int32),
        n_ids=jnp.int32(0),
        img_embeds=jnp.zeros((max_images * K, Dv), jnp.float32),
        n_img=jnp.int32(0),
        steps=jnp.int32(0),
        done=jnp.asarray(False),
        ids_all=ids_all,
        n_all=jnp.int32(T0),
        iters=jnp.int32(0),
    )
    state, _, _ = _advance1(params, cfg, state, h_all[:, -1], K,
                            max_new_tokens, stop_ids)

    eos_arr = jnp.asarray(tuple(LLAMA3_EOS_IDS) + stop_ids, jnp.int32)
    special_arr = jnp.asarray(tuple(LLAMA3_EOS_IDS) + stop_ids + _SPECIAL,
                              jnp.int32)

    def cond(s: SpecState):
        return ~s.done

    def body(s: SpecState):
        drafts = draft_fn(s.ids_all, s.n_all)                    # [Km1]
        d_emb = llama_lib.embed_tokens(
            params["llama"], jnp.maximum(drafts, 0)).astype(dtype)
        chunk = jnp.concatenate([s.next_embed[0], d_emb], axis=0)  # [spec_k,D]
        cpos = s.cache_len + jnp.arange(spec_k, dtype=jnp.int32)
        h, cache = llama_lib.decode_chunk_step(
            params["llama"], cfg.llama, chunk, cpos, s.cache,
            attn_impl=attn_impl)
        s = s._replace(cache=cache, cache_len=s.cache_len + 1,
                       iters=s.iters + 1)

        # token 1: the full state machine on the chunk's first hidden state
        s1, tok1, emit1 = _advance1(params, cfg, s, h[0:1], K,
                                    max_new_tokens, stop_ids)

        if Km1 == 0:
            return s1
        return _accept_chain(params, cfg, s1, tok1, emit1, drafts, h, Km1,
                             max_new_tokens, special_arr, eos_arr)

    state = jax.lax.while_loop(cond, body, state)
    return {
        "ids": state.ids,
        "n_ids": state.n_ids,
        "image_embeds": state.img_embeds,
        "n_image_tokens": state.n_img,
        "steps": state.steps,
        "iters": state.iters,
    }


class BatchedSpecState(NamedTuple):
    cache: Dict[str, jnp.ndarray]
    cache_lens: jnp.ndarray       # [B] int32 — next physical write slot
    starts: jnp.ndarray           # [B] int32 — first valid key (left pad)
    prompt_lens: jnp.ndarray      # [B] int32 — logical prompt lengths
    next_embed: jnp.ndarray       # [B, 1, D]
    in_image: jnp.ndarray         # [B] bool
    img_count: jnp.ndarray        # [B] int32
    ids: jnp.ndarray              # [B, max_new] int32 (pad -1)
    n_ids: jnp.ndarray            # [B] int32
    img_embeds: jnp.ndarray       # [B, max_img_tokens, Dv] fp32
    n_img: jnp.ndarray            # [B] int32
    steps: jnp.ndarray            # [B] int32 — transitions applied per row
    done: jnp.ndarray             # [B] bool
    ids_all: jnp.ndarray          # [B, cap] int32 — prompt + recorded ids
    n_all: jnp.ndarray            # [B] int32
    iters: jnp.ndarray            # int32 — chunk steps taken


def _advance1_batched(params, cfg: MetaMorphConfig, state: BatchedSpecState,
                      h_last: jnp.ndarray, K: int, max_new: int,
                      stop_ids: tuple):
    """Per-row state-machine transition — the exact (greedy) math of
    `decode._advance_batched`, plus the ids_all append used for drafting.
    Returns (state, tok [B], emit_image [B])."""
    B = h_last.shape[0]
    b_idx = jnp.arange(B)
    logits = llama_lib.lm_head(params["llama"], cfg.llama, h_last)   # [B, V]
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
    ids = state.ids.at[b_idx, state.n_ids].set(
        jnp.where(record, tok, old_ids))
    n_ids = state.n_ids + record.astype(jnp.int32)
    old_all = state.ids_all[b_idx, state.n_all]
    ids_all = state.ids_all.at[b_idx, state.n_all].set(
        jnp.where(record, tok, old_all))
    n_all = state.n_all + record.astype(jnp.int32)

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

    steps = state.steps + active.astype(jnp.int32)
    is_eos = active & jnp.isin(tok, jnp.asarray(
        tuple(LLAMA3_EOS_IDS) + stop_ids, jnp.int32))
    buffer_full = n_img >= state.img_embeds.shape[1]
    done = state.done | is_eos | (steps >= max_new) | buffer_full

    state = state._replace(
        next_embed=next_embed, in_image=in_image, img_count=img_count,
        ids=ids, n_ids=n_ids, img_embeds=img_embeds, n_img=n_img,
        steps=steps, done=done, ids_all=ids_all, n_all=n_all)
    return state, tok, emit_image


def batched_greedy_decode_spec(params, cfg, prompt_embeds, prompt_mask,
                               prompt_ids, *args,
                               prefill_attn_impl: str = "xla",
                               attn_impl: str = "xla", **kw):
    """Host-side guard + jit dispatch (mirrors decode.batched_greedy_decode):
    'flash' prefill and the 'pallas' chunk attention both assume unpadded
    rows (all-ones mask) — reject actually-padded batches instead of
    silently attending wrong."""
    if prefill_attn_impl == "flash" or attn_impl == "pallas":
        import numpy as _np
        if not bool(_np.asarray(prompt_mask, bool).all()):
            raise ValueError(
                "prefill_attn_impl='flash' / attn_impl='pallas' require an "
                "unpadded batch here: rows are left-padded, but the flash "
                "prefill and the chunk kernel assume starts == 0 "
                "(use 'xla', or equal-length prompts)")
    return _batched_greedy_decode_spec(
        params, cfg, prompt_embeds, prompt_mask, prompt_ids, *args,
        prefill_attn_impl=prefill_attn_impl, attn_impl=attn_impl, **kw)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_new_tokens", "max_images", "max_cache_len", "stop_ids",
    "prefill_attn_impl", "attn_impl", "kv_int8", "spec_k", "draft_fn"))
def _batched_greedy_decode_spec(
    params: Any,
    cfg: MetaMorphConfig,
    prompt_embeds: jnp.ndarray,   # [B, T0, D] LEFT-padded fused prompts
    prompt_mask: jnp.ndarray,     # [B, T0] 1 = real token
    prompt_ids: jnp.ndarray,      # [B, T0] int32, aligned with prompt_embeds
                                  # (left-padded; pad values ignored)
    max_new_tokens: int = 256,
    max_images: int = 4,
    max_cache_len: int = 0,
    stop_ids: tuple = (),
    prefill_attn_impl: str = "xla",
    attn_impl: str = "xla",       # chunk attention: "xla" handles left
                                  # padding; "pallas" requires unpadded rows
    kv_int8: bool = False,
    spec_k: int = 8,
    draft_fn=None,
) -> Dict[str, jnp.ndarray]:
    """Batched speculative greedy decode. Output-identical per row to
    `decode.batched_greedy_decode` (do_sample=False). At B>1 this amortizes
    BOTH HBM streams that bound batched decode — the weights (already
    amortized over B) and each row's cache read (which single-token decode
    re-pays per token): one `decode_chunk_step_batched` prices spec_k
    candidates per row at ~one step. Returns per-row "steps" [B] and scalar
    "iters" (chunk steps taken; B*iters vs sum(steps) is the saving)."""
    K = cfg.mm.num_image_tokens
    D = cfg.llama.hidden_size
    Dv = cfg.siglip.hidden_size
    B, T0 = prompt_embeds.shape[:2]
    Km1 = spec_k - 1
    S = max_cache_len or (T0 + max_new_tokens + spec_k + 8)
    if draft_fn is None:
        draft_fn = make_ngram_draft(Km1)
    draft_b = jax.vmap(draft_fn)

    dtype = prompt_embeds.dtype
    cache = llama_lib.init_kv_cache(cfg.llama, B, S, dtype=dtype,
                                    quantized=kv_int8)
    pos = (jnp.cumsum(prompt_mask, axis=1) - 1) * prompt_mask
    h_all, cache = llama_lib.prefill(
        params["llama"], cfg.llama, prompt_embeds, pos.astype(jnp.int32),
        prompt_mask.astype(jnp.int32), cache, attn_impl=prefill_attn_impl)

    prompt_lens = prompt_mask.sum(axis=1).astype(jnp.int32)
    starts = (jnp.int32(T0) - prompt_lens).astype(jnp.int32)

    # drafting source: each row's real prompt ids made logically contiguous
    cap = T0 + max_new_tokens + 4
    gidx = starts[:, None] + jnp.arange(T0, dtype=jnp.int32)[None]
    row_ids = jnp.take_along_axis(prompt_ids.astype(jnp.int32),
                                  jnp.clip(gidx, 0, T0 - 1), axis=1)
    valid = jnp.arange(T0)[None] < prompt_lens[:, None]
    ids_all = jnp.full((B, cap), -1, jnp.int32)
    ids_all = ids_all.at[:, :T0].set(jnp.where(valid, row_ids, -1))

    state = BatchedSpecState(
        cache=cache,
        cache_lens=jnp.full((B,), T0, jnp.int32),
        starts=starts,
        prompt_lens=prompt_lens,
        next_embed=jnp.zeros((B, 1, D), dtype),
        in_image=jnp.zeros((B,), bool),
        img_count=jnp.zeros((B,), jnp.int32),
        ids=jnp.full((B, max_new_tokens), -1, jnp.int32),
        n_ids=jnp.zeros((B,), jnp.int32),
        img_embeds=jnp.zeros((B, max_images * K, Dv), jnp.float32),
        n_img=jnp.zeros((B,), jnp.int32),
        steps=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        ids_all=ids_all,
        n_all=prompt_lens,
        iters=jnp.int32(0),
    )
    state, _, _ = _advance1_batched(params, cfg, state, h_all[:, -1], K,
                                    max_new_tokens, stop_ids)

    eos_arr = jnp.asarray(tuple(LLAMA3_EOS_IDS) + stop_ids, jnp.int32)
    special_arr = jnp.asarray(tuple(LLAMA3_EOS_IDS) + stop_ids + _SPECIAL,
                              jnp.int32)
    b_idx = jnp.arange(B)

    def cond(s: BatchedSpecState):
        return ~jnp.all(s.done)

    def body(s: BatchedSpecState):
        drafts = draft_b(s.ids_all, s.n_all)                     # [B, Km1]
        d_emb = llama_lib.embed_tokens(
            params["llama"],
            jnp.maximum(drafts, 0).reshape(-1)).astype(dtype)
        chunk = jnp.concatenate(
            [s.next_embed, d_emb.reshape(B, Km1, D)], axis=1)    # [B,spec_k,D]
        rope_pos = ((s.prompt_lens + s.steps - 1)[:, None]
                    + jnp.arange(spec_k, dtype=jnp.int32)[None])
        h, cache = llama_lib.decode_chunk_step_batched(
            params["llama"], cfg.llama, chunk, rope_pos, s.cache_lens,
            s.starts, s.cache, attn_impl=attn_impl)
        s = s._replace(cache=cache, cache_lens=s.cache_lens + 1,
                       iters=s.iters + 1)

        s1, tok1, emit1 = _advance1_batched(params, cfg, s, h[:, 0], K,
                                            max_new_tokens, stop_ids)
        if Km1 == 0:
            return s1
        return _accept_chain_batched(params, cfg, s1, tok1, emit1, drafts, h,
                                     Km1, max_new_tokens, special_arr,
                                     eos_arr)

    state = jax.lax.while_loop(cond, body, state)
    return {
        "ids": state.ids,
        "n_ids": state.n_ids,
        "image_embeds": state.img_embeds,
        "n_image_tokens": state.n_img,
        "steps": state.steps,
        "iters": state.iters,
    }


def _accept_chain_batched(params, cfg: MetaMorphConfig,
                          s1: BatchedSpecState, tok1: jnp.ndarray,
                          emit1: jnp.ndarray, drafts: jnp.ndarray,
                          h: jnp.ndarray, Km1: int, max_new: int,
                          special_arr, eos_arr) -> BatchedSpecState:
    """Per-row accept chain after the chunk's first transition — shared by
    the prompt-lookup and draft-model batched loops."""
    B = h.shape[0]
    b_idx = jnp.arange(B)
    preds = jnp.argmax(
        llama_lib.lm_head(params["llama"], cfg.llama,
                          h[:, 1:].reshape(B * Km1, -1)),
        axis=-1).astype(jnp.int32).reshape(B, Km1)
    base_ok = (~emit1 & ~s1.done
               & ~jnp.isin(tok1, special_arr) & ~s1.in_image)

    ids, ids_all = s1.ids, s1.ids_all
    n_extra = jnp.zeros((B,), jnp.int32)
    last_tok = tok1
    eos_acc = jnp.zeros((B,), bool)
    start_acc = jnp.zeros((B,), bool)
    end_acc = jnp.zeros((B,), bool)
    ok_chain = base_ok
    prev = tok1
    for i in range(Km1):
        ok_i = ok_chain & (drafts[:, i] == prev)
        acc_i = ok_i & (s1.steps + i < max_new)
        cand = preds[:, i]
        special_i = jnp.isin(cand, special_arr)
        old = ids[b_idx, s1.n_ids + i]
        ids = ids.at[b_idx, s1.n_ids + i].set(
            jnp.where(acc_i, cand, old))
        old_a = ids_all[b_idx, s1.n_all + i]
        ids_all = ids_all.at[b_idx, s1.n_all + i].set(
            jnp.where(acc_i, cand, old_a))
        n_extra = n_extra + acc_i.astype(jnp.int32)
        last_tok = jnp.where(acc_i, cand, last_tok)
        eos_acc = eos_acc | (acc_i & jnp.isin(cand, eos_arr))
        start_acc = start_acc | (acc_i & (cand == IM_START_TOKEN_ID))
        end_acc = end_acc | (acc_i & (cand == IM_END_TOKEN_ID))
        ok_chain = acc_i & ~special_i
        prev = cand

    any_extra = n_extra > 0
    tok_embed = llama_lib.embed_tokens(params["llama"], last_tok)  # [B,D]
    next_embed = jnp.where(any_extra[:, None, None], tok_embed[:, None],
                           s1.next_embed)
    steps = s1.steps + n_extra
    return s1._replace(
        ids=ids, ids_all=ids_all,
        n_ids=s1.n_ids + n_extra, n_all=s1.n_all + n_extra,
        cache_lens=s1.cache_lens + n_extra,
        next_embed=next_embed,
        in_image=jnp.where(start_acc, True, s1.in_image),
        img_count=jnp.where(end_acc, 0, s1.img_count),
        steps=steps,
        done=s1.done | eos_acc | (steps >= max_new))


class DraftModelState(NamedTuple):
    main: SpecState
    d_cache: Dict[str, jnp.ndarray]   # drafter KV cache (B=1)
    d_len: jnp.ndarray                # int32 — drafter tokens ingested


@functools.partial(jax.jit, static_argnames=(
    "cfg", "draft_cfg", "max_new_tokens", "max_images", "max_cache_len",
    "stop_ids", "prefill_attn_impl", "attn_impl", "kv_int8", "spec_k"))
def greedy_decode_spec_draft_model(
    params: Any,
    draft_params: Any,            # plain LLaMA param tree (the small model)
    cfg: MetaMorphConfig,
    draft_cfg,                    # LlamaConfig of the drafter
    prompt_embeds: jnp.ndarray,   # [1, T0, D] fused prompt (main model)
    prompt_ids: jnp.ndarray,      # [T0] int32 — the drafter's view of the
                                  # prompt (image-slot placeholders included;
                                  # the drafter is blind to image content)
    max_new_tokens: int = 256,
    max_images: int = 4,
    max_cache_len: int = 0,
    stop_ids: tuple = (),
    prefill_attn_impl: str = "xla",
    attn_impl: str = "xla",
    kv_int8: bool = False,
    spec_k: int = 8,
) -> Dict[str, jnp.ndarray]:
    """Draft-MODEL speculative decoding (classic two-model scheme): a small
    LLaMA proposes spec_k-1 tokens sequentially (cheap — its weights are a
    fraction of the main model's HBM stream), and the main model verifies
    them in ONE chunk step. Pays off on ANY text the drafter predicts well —
    not just prompt echoes. Output is exactly `decode.greedy_decode`'s (same
    verification as `greedy_decode_spec`).

    Drafter bookkeeping: the drafter tracks the ID stream only (its own
    positions — continuous image embeddings are invisible to it; while the
    main row is in image-emission mode chunks degenerate to 1-accept, same
    as prompt-lookup). Each iteration the drafter first CATCHES UP on the
    ids accepted since its last sync via one chunk step — junk tail
    positions in that chunk are never read by valid queries (query c reads
    keys <= p0 + c) and are overwritten by the next catch-up — then rolls
    spec_k-1 single-token steps to propose.

    The reference has no speculation (full recompute per token,
    `metamorph/model/language_model/metamorph_llama.py:510`)."""
    K = cfg.mm.num_image_tokens
    D = cfg.llama.hidden_size
    Dv = cfg.siglip.hidden_size
    T0 = prompt_embeds.shape[1]
    Km1 = spec_k - 1
    assert Km1 >= 1, "spec_k must be >= 2 for draft-model speculation"
    cache_len_total = max_cache_len or (T0 + max_new_tokens + spec_k + 8)

    dtype = prompt_embeds.dtype
    cache = llama_lib.init_kv_cache(cfg.llama, 1, cache_len_total,
                                    dtype=dtype, quantized=kv_int8)
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    h_all, cache = llama_lib.prefill(
        params["llama"], cfg.llama, prompt_embeds, pos,
        jnp.ones((1, T0), jnp.int32), cache, attn_impl=prefill_attn_impl)

    # drafter prefill over the prompt ids (its own embedding table)
    d_cache = llama_lib.init_kv_cache(draft_cfg, 1, cache_len_total,
                                      dtype=dtype)
    d_prompt = llama_lib.embed_tokens(
        draft_params, prompt_ids.astype(jnp.int32)[None]).astype(dtype)
    _, d_cache = llama_lib.prefill(
        draft_params, draft_cfg, d_prompt, pos,
        jnp.ones((1, T0), jnp.int32), d_cache, attn_impl=prefill_attn_impl)

    # + spec_k: the drafter's catch-up dynamic_slice must never clamp-shift
    cap = T0 + max_new_tokens + spec_k + 4
    ids_all = jnp.full((cap,), -1, jnp.int32)
    ids_all = ids_all.at[:T0].set(prompt_ids.astype(jnp.int32))

    main = SpecState(
        cache=cache,
        cache_len=jnp.int32(T0),
        next_embed=jnp.zeros((1, 1, D), dtype),
        in_image=jnp.asarray(False),
        img_count=jnp.int32(0),
        ids=jnp.full((max_new_tokens,), -1, jnp.int32),
        n_ids=jnp.int32(0),
        img_embeds=jnp.zeros((max_images * K, Dv), jnp.float32),
        n_img=jnp.int32(0),
        steps=jnp.int32(0),
        done=jnp.asarray(False),
        ids_all=ids_all,
        n_all=jnp.int32(T0),
        iters=jnp.int32(0),
    )
    main, _, _ = _advance1(params, cfg, main, h_all[:, -1], K,
                           max_new_tokens, stop_ids)
    state = DraftModelState(main=main, d_cache=d_cache, d_len=jnp.int32(T0))

    eos_arr = jnp.asarray(tuple(LLAMA3_EOS_IDS) + stop_ids, jnp.int32)
    special_arr = jnp.asarray(tuple(LLAMA3_EOS_IDS) + stop_ids + _SPECIAL,
                              jnp.int32)

    def cond(st: DraftModelState):
        return ~st.main.done

    def body(st: DraftModelState):
        s, d_cache, d_len = st.main, st.d_cache, st.d_len

        # 1. drafter catch-up: ingest ids_all[d_len : n_all] (one chunk; the
        #    junk tail past `valid` is never read by valid queries and the
        #    next catch-up overwrites it)
        valid = s.n_all - d_len                       # in [0, spec_k]
        cu_ids = jax.lax.dynamic_slice(s.ids_all, (d_len,), (spec_k,))
        cu_emb = llama_lib.embed_tokens(
            draft_params, jnp.maximum(cu_ids, 0)).astype(dtype)
        cu_pos = d_len + jnp.arange(spec_k, dtype=jnp.int32)
        hd, d_cache = llama_lib.decode_chunk_step(
            draft_params, draft_cfg, cu_emb, cu_pos, d_cache,
            attn_impl="xla")
        d_len = d_len + valid

        # 2. sequential drafting: Km1 small-model steps from the last valid
        #    hidden state (positions overwritten by the next catch-up)
        h_last = jax.lax.dynamic_slice(
            hd, (jnp.maximum(valid - 1, 0), 0), (1, hd.shape[1]))
        drafts = []
        d_tok = jnp.argmax(
            llama_lib.lm_head(draft_params, draft_cfg, h_last),
            axis=-1).astype(jnp.int32)                # [1]
        for j in range(Km1):
            drafts.append(d_tok[0])
            if j == Km1 - 1:
                break
            d_emb = llama_lib.embed_tokens(draft_params, d_tok)[None]
            hj, d_cache = llama_lib.decode_step(
                draft_params, draft_cfg, d_emb.astype(dtype),
                (d_len + j)[None, None], d_cache, d_len + j,
                attn_impl="xla")
            d_tok = jnp.argmax(
                llama_lib.lm_head(draft_params, draft_cfg, hj[:, 0]),
                axis=-1).astype(jnp.int32)
        drafts = jnp.stack(drafts)                    # [Km1]

        # 3. main-model chunk verification (identical to greedy_decode_spec)
        d_emb = llama_lib.embed_tokens(
            params["llama"], jnp.maximum(drafts, 0)).astype(dtype)
        chunk = jnp.concatenate([s.next_embed[0], d_emb], axis=0)
        cpos = s.cache_len + jnp.arange(spec_k, dtype=jnp.int32)
        h, cache = llama_lib.decode_chunk_step(
            params["llama"], cfg.llama, chunk, cpos, s.cache,
            attn_impl=attn_impl)
        s = s._replace(cache=cache, cache_len=s.cache_len + 1,
                       iters=s.iters + 1)
        s1, tok1, emit1 = _advance1(params, cfg, s, h[0:1], K,
                                    max_new_tokens, stop_ids)
        s1 = _accept_chain(params, cfg, s1, tok1, emit1, drafts, h, Km1,
                           max_new_tokens, special_arr, eos_arr)
        return DraftModelState(main=s1, d_cache=d_cache, d_len=d_len)

    state = jax.lax.while_loop(cond, body, state)
    m = state.main
    return {
        "ids": m.ids,
        "n_ids": m.n_ids,
        "image_embeds": m.img_embeds,
        "n_image_tokens": m.n_img,
        "steps": m.steps,
        "iters": m.iters,
    }


class BatchedDraftModelState(NamedTuple):
    main: BatchedSpecState
    d_cache: Dict[str, jnp.ndarray]   # drafter KV cache [L, B, KV, S, Dh]
    d_len: jnp.ndarray                # [B] int32 — drafter tokens ingested


def batched_greedy_decode_spec_draft_model(
        params, draft_params, cfg, draft_cfg, prompt_embeds, prompt_mask,
        prompt_ids, *args, prefill_attn_impl: str = "xla",
        attn_impl: str = "xla", **kw):
    """Host-side guard + jit dispatch (see _batched_...draft_model)."""
    if prefill_attn_impl == "flash" or attn_impl == "pallas":
        import numpy as _np
        if not bool(_np.asarray(prompt_mask, bool).all()):
            raise ValueError(
                "prefill_attn_impl='flash' / attn_impl='pallas' require an "
                "unpadded batch (see batched_greedy_decode_spec)")
    return _batched_greedy_decode_spec_draft_model(
        params, draft_params, cfg, draft_cfg, prompt_embeds, prompt_mask,
        prompt_ids, *args, prefill_attn_impl=prefill_attn_impl,
        attn_impl=attn_impl, **kw)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "draft_cfg", "max_new_tokens", "max_images", "max_cache_len",
    "stop_ids", "prefill_attn_impl", "attn_impl", "kv_int8", "spec_k"))
def _batched_greedy_decode_spec_draft_model(
    params: Any,
    draft_params: Any,
    cfg: MetaMorphConfig,
    draft_cfg,
    prompt_embeds: jnp.ndarray,   # [B, T0, D] LEFT-padded fused prompts
    prompt_mask: jnp.ndarray,     # [B, T0]
    prompt_ids: jnp.ndarray,      # [B, T0] int32 (left-padded, pads ignored)
    max_new_tokens: int = 256,
    max_images: int = 4,
    max_cache_len: int = 0,
    stop_ids: tuple = (),
    prefill_attn_impl: str = "xla",
    attn_impl: str = "xla",
    kv_int8: bool = False,
    spec_k: int = 8,
) -> Dict[str, jnp.ndarray]:
    """Batched draft-model speculation: the drafter proposes per-row token
    chains (its own KV caches over each row's id stream, contiguous from 0 —
    no padding), the main model verifies every row's chain in ONE
    `decode_chunk_step_batched`. Per-row output identical to
    `decode.batched_greedy_decode`. Combines both amortizations: the drafter
    makes acceptance workload-general (not just prompt echoes), the batched
    chunk makes every accepted token amortize the weight AND per-row cache
    streams."""
    K = cfg.mm.num_image_tokens
    D = cfg.llama.hidden_size
    Dv = cfg.siglip.hidden_size
    B, T0 = prompt_embeds.shape[:2]
    Km1 = spec_k - 1
    assert Km1 >= 1, "spec_k must be >= 2 for draft-model speculation"
    S = max_cache_len or (T0 + max_new_tokens + spec_k + 8)

    dtype = prompt_embeds.dtype
    cache = llama_lib.init_kv_cache(cfg.llama, B, S, dtype=dtype,
                                    quantized=kv_int8)
    pos = (jnp.cumsum(prompt_mask, axis=1) - 1) * prompt_mask
    h_all, cache = llama_lib.prefill(
        params["llama"], cfg.llama, prompt_embeds, pos.astype(jnp.int32),
        prompt_mask.astype(jnp.int32), cache, attn_impl=prefill_attn_impl)

    prompt_lens = prompt_mask.sum(axis=1).astype(jnp.int32)
    starts = (jnp.int32(T0) - prompt_lens).astype(jnp.int32)

    # logically-contiguous per-row prompt ids (drafting source + drafter feed)
    cap = T0 + max_new_tokens + spec_k + 4
    gidx = starts[:, None] + jnp.arange(T0, dtype=jnp.int32)[None]
    row_ids = jnp.take_along_axis(prompt_ids.astype(jnp.int32),
                                  jnp.clip(gidx, 0, T0 - 1), axis=1)
    valid0 = jnp.arange(T0)[None] < prompt_lens[:, None]
    ids_all = jnp.full((B, cap), -1, jnp.int32)
    ids_all = ids_all.at[:, :T0].set(jnp.where(valid0, row_ids, -1))

    # drafter prefill: RIGHT-padded contiguous rows from 0 (junk K/V past
    # each row's length is overwritten by catch-up chunks before any valid
    # query can read it — query c of a chunk at p0 reads keys <= p0 + c,
    # and the chunk writes [p0, p0+spec_k) first)
    d_cache = llama_lib.init_kv_cache(draft_cfg, B, S, dtype=dtype)
    d_prompt = llama_lib.embed_tokens(
        draft_params, jnp.maximum(row_ids, 0)).astype(dtype)
    d_pos = jnp.broadcast_to(jnp.arange(T0, dtype=jnp.int32)[None], (B, T0))
    _, d_cache = llama_lib.prefill(
        draft_params, draft_cfg, d_prompt, d_pos,
        valid0.astype(jnp.int32), d_cache, attn_impl=prefill_attn_impl)

    main = BatchedSpecState(
        cache=cache,
        cache_lens=jnp.full((B,), T0, jnp.int32),
        starts=starts,
        prompt_lens=prompt_lens,
        next_embed=jnp.zeros((B, 1, D), dtype),
        in_image=jnp.zeros((B,), bool),
        img_count=jnp.zeros((B,), jnp.int32),
        ids=jnp.full((B, max_new_tokens), -1, jnp.int32),
        n_ids=jnp.zeros((B,), jnp.int32),
        img_embeds=jnp.zeros((B, max_images * K, Dv), jnp.float32),
        n_img=jnp.zeros((B,), jnp.int32),
        steps=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        ids_all=ids_all,
        n_all=prompt_lens,
        iters=jnp.int32(0),
    )
    main, _, _ = _advance1_batched(params, cfg, main, h_all[:, -1], K,
                                   max_new_tokens, stop_ids)
    state = BatchedDraftModelState(main=main, d_cache=d_cache,
                                   d_len=prompt_lens)

    eos_arr = jnp.asarray(tuple(LLAMA3_EOS_IDS) + stop_ids, jnp.int32)
    special_arr = jnp.asarray(tuple(LLAMA3_EOS_IDS) + stop_ids + _SPECIAL,
                              jnp.int32)
    zero_starts = jnp.zeros((B,), jnp.int32)

    def cond(st: BatchedDraftModelState):
        return ~jnp.all(st.main.done)

    def body(st: BatchedDraftModelState):
        s, d_cache, d_len = st.main, st.d_cache, st.d_len

        # 1. per-row drafter catch-up on ids accepted since last sync
        valid = s.n_all - d_len                            # [B] in [0,spec_k]
        cu_idx = d_len[:, None] + jnp.arange(spec_k, dtype=jnp.int32)[None]
        cu_ids = jnp.take_along_axis(s.ids_all,
                                     jnp.clip(cu_idx, 0, cap - 1), axis=1)
        cu_emb = llama_lib.embed_tokens(
            draft_params,
            jnp.maximum(cu_ids, 0).reshape(-1)
        ).reshape(B, spec_k, -1).astype(dtype)
        hd, d_cache = llama_lib.decode_chunk_step_batched(
            draft_params, draft_cfg, cu_emb, cu_idx, d_len, zero_starts,
            d_cache, attn_impl=attn_impl)
        d_len = d_len + valid

        # 2. Km1 sequential drafter steps (batched single-token)
        h_last = jnp.take_along_axis(
            hd, jnp.maximum(valid - 1, 0)[:, None, None], axis=1)[:, 0]
        drafts = []
        d_tok = jnp.argmax(
            llama_lib.lm_head(draft_params, draft_cfg, h_last),
            axis=-1).astype(jnp.int32)                     # [B]
        for j in range(Km1):
            drafts.append(d_tok)
            if j == Km1 - 1:
                break
            d_emb = llama_lib.embed_tokens(draft_params, d_tok)[:, None]
            hj, d_cache = llama_lib.decode_step(
                draft_params, draft_cfg, d_emb.astype(dtype),
                (d_len + j)[:, None], d_cache, d_len + j, attn_impl="xla")
            d_tok = jnp.argmax(
                llama_lib.lm_head(draft_params, draft_cfg, hj[:, 0]),
                axis=-1).astype(jnp.int32)
        drafts = jnp.stack(drafts, axis=1)                 # [B, Km1]

        # 3. main-model batched chunk verification
        d_emb = llama_lib.embed_tokens(
            params["llama"],
            jnp.maximum(drafts, 0).reshape(-1)).astype(dtype)
        chunk = jnp.concatenate(
            [s.next_embed, d_emb.reshape(B, Km1, D)], axis=1)
        rope_pos = ((s.prompt_lens + s.steps - 1)[:, None]
                    + jnp.arange(spec_k, dtype=jnp.int32)[None])
        h, cache = llama_lib.decode_chunk_step_batched(
            params["llama"], cfg.llama, chunk, rope_pos, s.cache_lens,
            s.starts, s.cache, attn_impl=attn_impl)
        s = s._replace(cache=cache, cache_lens=s.cache_lens + 1,
                       iters=s.iters + 1)
        s1, tok1, emit1 = _advance1_batched(params, cfg, s, h[:, 0], K,
                                            max_new_tokens, stop_ids)
        s1 = _accept_chain_batched(params, cfg, s1, tok1, emit1, drafts, h,
                                   Km1, max_new_tokens, special_arr, eos_arr)
        return BatchedDraftModelState(main=s1, d_cache=d_cache, d_len=d_len)

    state = jax.lax.while_loop(cond, body, state)
    m = state.main
    return {
        "ids": m.ids,
        "n_ids": m.n_ids,
        "image_embeds": m.img_embeds,
        "n_image_tokens": m.n_img,
        "steps": m.steps,
        "iters": m.iters,
    }
