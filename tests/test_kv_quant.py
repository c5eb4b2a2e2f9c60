"""int8 KV cache: quantization scheme, attention-kernel parity, decode-path
accuracy, and serve-vs-single-decode bitwise agreement.

The cache stores int8 entries + one fp32 scale per (layer, row, kv head,
position) (`llama.init_kv_cache(quantized=True)`, write-side transform
`ops/quant.quantize_kv`). Halves decode's dominant HBM stream (the cache
read); the reference has no KV cache at all (full recompute per token,
`metamorph/model/language_model/metamorph_llama.py:510`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.config import (LlamaConfig, MetaMorphConfig,
                                  MultimodalConfig, SiglipConfig, TrainConfig)
from metamorph_tpu.models import llama as L
from metamorph_tpu.ops.decode_attention import (decode_attention,
                                                decode_attention_xla)
from metamorph_tpu.ops.quant import quantize_kv

CFG = MetaMorphConfig(
    llama=LlamaConfig.tiny(vocab_size=128258),
    siglip=SiglipConfig.tiny(),
    mm=MultimodalConfig(num_image_tokens=3),
    train=TrainConfig(max_seq_len=64),
)


def test_quantize_kv_roundtrip_bound():
    """Per-vector symmetric int8: reconstruction error <= scale/2."""
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 4, 64), jnp.float32) * 3
    q, scale = quantize_kv(x)
    assert q.dtype == jnp.int8 and scale.shape == (5, 4)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(scale)[..., None]
                 - np.asarray(x))
    assert err.max() <= np.asarray(scale).max() * 0.501
    # scales recover the per-vector absmax
    np.testing.assert_allclose(np.asarray(scale) * 127.0,
                               np.abs(np.asarray(x)).max(-1), rtol=1e-6)


def _mk_cache(rng, B=3, KV=2, S=32, Dh=64):
    k = jax.random.normal(rng, (B, KV, S, Dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(rng, 1), (B, KV, S, Dh),
                          jnp.float32)
    return k, v


def test_xla_attention_int8_equals_dequantized():
    """decode_attention_xla over (int8, scales) == the same attention over
    the explicitly dequantized cache — the fused dequant is exact."""
    rng = jax.random.PRNGKey(1)
    B, KV, G, S, Dh = 3, 2, 4, 32, 64
    k, v = _mk_cache(rng, B, KV, S, Dh)
    q = jax.random.normal(jax.random.fold_in(rng, 2), (B, KV * G, Dh))
    lengths = jnp.asarray([5, 32, 17], jnp.int32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    deq_k = kq.astype(jnp.float32) * ks[..., None]
    deq_v = vq.astype(jnp.float32) * vs[..., None]
    a = decode_attention_xla(q, kq, vq, lengths, k_scale=ks, v_scale=vs)
    b = decode_attention_xla(q, deq_k, deq_v, lengths)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stacked", [False, True])
def test_pallas_attention_int8_matches_xla(stacked):
    """The quantized Pallas kernel (interpret on CPU) == the XLA reference,
    both the per-layer-slab and stacked-cache call forms."""
    rng = jax.random.PRNGKey(3)
    B, KV, G, S, Dh = 2, 2, 4, 64, 64
    k, v = _mk_cache(rng, B, KV, S, Dh)
    q = jax.random.normal(jax.random.fold_in(rng, 2), (B, KV * G, Dh))
    lengths = jnp.asarray([23, 64], jnp.int32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    ref = decode_attention_xla(q, kq, vq, lengths, k_scale=ks, v_scale=vs)
    if stacked:
        out = decode_attention(q, kq[None], vq[None], lengths, layer=0,
                               k_scale=ks[None], v_scale=vs[None],
                               block_s=32)
    else:
        out = decode_attention(q, kq, vq, lengths, k_scale=ks, v_scale=vs,
                               block_s=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.fixture(scope="module")
def llama_params():
    return L.init_llama_params(jax.random.PRNGKey(7), CFG.llama,
                               dtype=jnp.float32)


def test_decode_step_int8_cache_tracks_fp(llama_params):
    """Teacher-forced decode: feed the SAME embedding sequence through an fp32
    cache and an int8 cache; per-step hidden states must stay nearly parallel
    (per-token-per-head scales keep attention cosine > 0.999)."""
    cfg = CFG.llama
    D = cfg.hidden_size
    rng = jax.random.PRNGKey(11)
    T = 12
    embeds = jax.random.normal(rng, (1, T, D), jnp.float32) * 0.05

    def run(quantized):
        cache = L.init_kv_cache(cfg, 1, 32, dtype=jnp.float32,
                                quantized=quantized)
        hs = []
        for t in range(T):
            h, cache = L.decode_step(llama_params, cfg, embeds[:, t:t + 1],
                                     jnp.asarray([[t]], jnp.int32), cache,
                                     jnp.int32(t))
            hs.append(np.asarray(h[0, 0]))
        return np.stack(hs)

    fp = run(False)
    q8 = run(True)
    cos = np.sum(fp * q8, -1) / (np.linalg.norm(fp, axis=-1)
                                 * np.linalg.norm(q8, axis=-1))
    assert cos.min() > 0.995, cos


def test_serve_kv_int8_matches_single_decode():
    """End-to-end: the serving engine with an int8 cache decodes bitwise the
    ids of the single-request decode path with an int8 cache (the two paths
    quantize identically; only batching differs)."""
    from metamorph_tpu.inference.decode import greedy_decode
    from metamorph_tpu.inference.serve import Request, ServeEngine
    from metamorph_tpu.models import metamorph as M

    params = M.init_metamorph_params(jax.random.PRNGKey(7), CFG,
                                     dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompts = []
    for t0 in (6, 9):
        ids = jnp.asarray(rng.integers(10, 1000, (1, t0)).astype(np.int32))
        prompts.append(np.asarray(L.embed_tokens(params["llama"], ids)[0]))

    eng = ServeEngine(params, CFG, n_slots=2, max_cache_len=64,
                      max_new_tokens_cap=16, max_images=2,
                      prefill_buckets=(8, 16), steps_per_sync=3, kv_int8=True)
    assert eng.state.cache["k"].dtype == jnp.int8
    for i, p in enumerate(prompts):
        eng.submit(Request(prompt_embeds=p, max_new_tokens=8, uid=i))
    done = {c.uid: c for c in eng.run()}
    for i, p in enumerate(prompts):
        ref = greedy_decode(params, CFG, jnp.asarray(p)[None],
                            max_new_tokens=8, max_images=2, kv_int8=True)
        n = int(ref["n_ids"])
        np.testing.assert_array_equal(done[i].ids,
                                      np.asarray(ref["ids"][:n]))


def test_serve_kv_int8_chunked_fill_matches_blocking():
    """A long prompt admitted through chunked prefill with an int8 cache
    (quantized chunk writes + in-kernel dequant in the chunk attention)
    decodes the same ids as the blocking-prefill int8 path."""
    from metamorph_tpu.inference.serve import Request, ServeEngine
    from metamorph_tpu.models import metamorph as M

    params = M.init_metamorph_params(jax.random.PRNGKey(7), CFG,
                                     dtype=jnp.float32)
    rng = np.random.default_rng(5)
    long_ids = jnp.asarray(rng.integers(10, 1000, (1, 13)).astype(np.int32))
    long_pe = np.asarray(L.embed_tokens(params["llama"], long_ids)[0])
    warm = np.asarray(L.embed_tokens(
        params["llama"],
        jnp.asarray(rng.integers(10, 1000, (1, 5)).astype(np.int32)))[0])

    eng = ServeEngine(params, CFG, n_slots=1, max_cache_len=64,
                      max_new_tokens_cap=16, max_images=2,
                      prefill_buckets=(16,), steps_per_sync=2, kv_int8=True)
    eng.submit(Request(prompt_embeds=long_pe, max_new_tokens=9, uid="x"))
    ref = eng.run()[0]

    eng2 = ServeEngine(params, CFG, n_slots=2, max_cache_len=64,
                       max_new_tokens_cap=16, max_images=2,
                       prefill_buckets=(16,), steps_per_sync=2, fill_chunk=4,
                       kv_int8=True)
    eng2.submit(Request(prompt_embeds=warm, max_new_tokens=12, uid="warm"))
    eng2.step()
    eng2.submit(Request(prompt_embeds=long_pe, max_new_tokens=9, uid="x"))
    eng2.step()
    assert eng2._fills or eng2.slot_uid.count(None) == 0
    done = {c.uid: c for c in eng2.run()}
    np.testing.assert_array_equal(done["x"].ids, ref.ids)


def test_pallas_chunk_attention_int8_matches_xla():
    """Quantized chunk kernel (interpret on CPU) == masked-dot reference over
    the explicitly dequantized slab."""
    from metamorph_tpu.models.llama import _chunk_attention
    from metamorph_tpu.ops.decode_attention import chunk_attention

    rng = jax.random.PRNGKey(9)
    Lyr, B, KV, G, S, Dh, C = 2, 2, 2, 3, 64, 64, 8
    H = KV * G
    k = jax.random.normal(rng, (Lyr, B, KV, S, Dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(rng, 1),
                          (Lyr, B, KV, S, Dh), jnp.float32)
    q = jax.random.normal(jax.random.fold_in(rng, 2), (C, H, Dh), jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    layer, slot, off = 1, 1, 12
    out = chunk_attention(q, kq, vq, jnp.int32(slot), jnp.int32(off),
                          layer=layer, block_s=32, k_scale=ks, v_scale=vs)
    deq_k = kq[layer, slot].astype(jnp.float32) * ks[layer, slot][..., None]
    deq_v = vq[layer, slot].astype(jnp.float32) * vs[layer, slot][..., None]
    chunk_pos = off + jnp.arange(C, dtype=jnp.int32)
    ref = _chunk_attention(q, deq_k, deq_v, chunk_pos, Dh ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
