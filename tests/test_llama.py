"""Unit tests for the LLaMA decoder: shapes, causality, RoPE, KV-cache parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.config import LlamaConfig
from metamorph_tpu.models import llama as L

CFG = LlamaConfig.tiny(vocab_size=256)


@pytest.fixture(scope="module")
def params():
    return L.init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _run(params, ids, mask=None):
    B, T = ids.shape
    mask = np.ones((B, T), np.int32) if mask is None else mask
    pos = np.broadcast_to(np.arange(T, dtype=np.int32), (B, T))
    emb = L.embed_tokens(params, jnp.asarray(ids))
    return L.llama_forward(params, CFG, emb, jnp.asarray(pos), jnp.asarray(mask))


def test_forward_shape(params):
    ids = np.arange(12, dtype=np.int32).reshape(2, 6) % 256
    h = _run(params, ids)
    assert h.shape == (2, 6, CFG.hidden_size)
    logits = L.lm_head(params, CFG, h)
    assert logits.shape == (2, 6, CFG.vocab_size)
    assert logits.dtype == jnp.float32


def test_causality(params):
    """Changing a later token must not affect earlier hidden states."""
    rng = np.random.default_rng(0)
    ids1 = rng.integers(0, 256, (1, 8)).astype(np.int32)
    ids2 = ids1.copy()
    ids2[0, 5] = (ids2[0, 5] + 1) % 256
    h1, h2 = _run(params, ids1), _run(params, ids2)
    np.testing.assert_allclose(h1[0, :5], h2[0, :5], rtol=1e-5, atol=1e-5)
    assert not np.allclose(h1[0, 5:], h2[0, 5:])


def test_padding_invariance(params):
    """Extra padded tokens (mask=0) must not change the valid prefix."""
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, (1, 6)).astype(np.int32)
    padded = np.concatenate([ids, np.zeros((1, 4), np.int32)], axis=1)
    mask = np.concatenate([np.ones((1, 6), np.int32), np.zeros((1, 4), np.int32)], axis=1)
    h_short = _run(params, ids)
    h_pad = _run(params, padded, mask)
    np.testing.assert_allclose(h_short[0], h_pad[0, :6], rtol=1e-5, atol=1e-5)


def test_rope_llama31_scaling():
    cfg = LlamaConfig()  # 8B with rope scaling enabled
    from metamorph_tpu.models.llama import _rope_scaled_freqs

    freqs = np.asarray(_rope_scaled_freqs(cfg))
    base = 1.0 / (cfg.rope_theta ** (np.arange(0, 128, 2) / 128))
    # high-frequency (short wavelength) components untouched
    assert np.allclose(freqs[0], base[0])
    # low-frequency components scaled down by factor 8
    assert np.allclose(freqs[-1], base[-1] / 8.0)


def test_kv_cache_matches_full_forward(params):
    """Prefill + single-token decode steps == one full forward (the reference
    dodges this by full recompute, metamorph_llama.py:510)."""
    rng = np.random.default_rng(2)
    T_prompt, T_total, MAXLEN = 5, 9, 16
    ids = rng.integers(0, 256, (1, T_total)).astype(np.int32)

    h_full = _run(params, ids)

    cache = L.init_kv_cache(CFG, batch=1, max_len=MAXLEN, dtype=jnp.float32)
    prompt = jnp.asarray(ids[:, :T_prompt])
    pos = jnp.arange(T_prompt, dtype=jnp.int32)[None]
    emb = L.embed_tokens(params, prompt)
    h_pre, cache = L.prefill(params, CFG, emb, pos, jnp.ones((1, T_prompt), jnp.int32), cache)
    np.testing.assert_allclose(np.asarray(h_pre), np.asarray(h_full[:, :T_prompt]),
                               rtol=2e-4, atol=2e-4)

    for t in range(T_prompt, T_total):
        x = L.embed_tokens(params, jnp.asarray(ids[:, t:t + 1]))
        p = jnp.full((1, 1), t, jnp.int32)
        h_t, cache = L.decode_step(params, CFG, x, p, cache, jnp.int32(t))
        np.testing.assert_allclose(np.asarray(h_t[:, 0]), np.asarray(h_full[:, t]),
                                   rtol=2e-4, atol=2e-4)


def test_decode_step_with_chunk_matches_prefill(params):
    """Feeding a prompt through decode_step_with_chunk in chunks (the serve
    engine's fused chunked-prefill path) produces the same cache contents and
    the same last-position hidden state as a monolithic prefill."""
    rng = np.random.default_rng(5)
    B, S, C = 3, 32, 4
    fill_slot = 1
    T0 = 10                      # 3 chunks: 4 + 4 + 2
    D = CFG.hidden_size
    emb = jnp.asarray(rng.normal(size=(1, T0, D)).astype(np.float32))

    # reference: monolithic prefill of the row
    ref_cache = L.init_kv_cache(CFG, 1, S, dtype=jnp.float32)
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    h_ref, ref_cache = L.prefill(params, CFG, emb, pos,
                                 jnp.ones((1, T0), jnp.int32), ref_cache)

    # fused path: B rows, other rows carry junk decode inputs
    cache = L.init_kv_cache(CFG, B, S, dtype=jnp.float32)
    cache_lens = jnp.asarray([5, 0, 7], jnp.int32)  # junk write positions
    x_dec = jnp.asarray(rng.normal(size=(B, 1, D)).astype(np.float32))
    h_chunk_last = None
    for j in range((T0 + C - 1) // C):
        lo, hi = j * C, min((j + 1) * C, T0)
        chunk = jnp.zeros((C, D), jnp.float32).at[:hi - lo].set(emb[0, lo:hi])
        chunk_pos = lo + jnp.arange(C, dtype=jnp.int32)
        chunk_mask = jnp.arange(C) < (hi - lo)
        # park the fill row's junk write at the end of this chunk's region,
        # exactly like _decode_fill_all does
        cl = cache_lens.at[fill_slot].set(hi)
        _, h_chunk, cache = L.decode_step_with_chunk(
            params, CFG, x_dec, cl[:, None], cache, cl,
            chunk, chunk_pos, chunk_mask, jnp.int32(fill_slot))
        h_chunk_last = h_chunk[hi - lo - 1]

    for name in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(cache[name][:, fill_slot, :, :T0]),
            np.asarray(ref_cache[name][:, 0, :, :T0]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_chunk_last),
                               np.asarray(h_ref[0, -1]), rtol=2e-4, atol=2e-4)
