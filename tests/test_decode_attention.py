"""Decode-attention kernel tests: Pallas (interpret on CPU) == XLA reference,
plus end-to-end equality of the kernel-backed decode path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.ops.decode_attention import (decode_attention,
                                                decode_attention_xla)


def _rand(B=3, H=8, KV=2, S=256, Dh=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, KV, S, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, KV, S, Dh)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("block_s", [64, 128, 256])
def test_kernel_matches_xla_ragged_lengths(block_s):
    q, k, v = _rand()
    lengths = jnp.asarray([17, 256, 130], jnp.int32)  # ragged, incl. full S
    o_ker = decode_attention(q, k, v, lengths, block_s=block_s)
    o_ref = decode_attention_xla(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(o_ker), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_matches_xla_with_starts():
    """Left-padded rows: valid keys are [start, length)."""
    q, k, v = _rand(seed=1)
    lengths = jnp.asarray([100, 256, 200], jnp.int32)
    starts = jnp.asarray([40, 0, 190], jnp.int32)
    o_ker = decode_attention(q, k, v, lengths, starts=starts, block_s=64)
    o_ref = decode_attention_xla(q, k, v, lengths, starts=starts)
    np.testing.assert_allclose(np.asarray(o_ker), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_mha_group_of_one():
    """H == KV (no grouping) exercises the G=1 sublane edge."""
    q, k, v = _rand(B=2, H=4, KV=4, S=128, Dh=64, seed=2)
    lengths = jnp.asarray([5, 127], jnp.int32)
    o_ker = decode_attention(q, k, v, lengths, block_s=64)
    o_ref = decode_attention_xla(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(o_ker), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_bf16_inputs():
    q, k, v = _rand(seed=3)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    lengths = jnp.asarray([64, 200, 256], jnp.int32)
    o_ker = decode_attention(q, k, v, lengths, block_s=128)
    o_ref = decode_attention_xla(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(o_ker, np.float32),
                               np.asarray(o_ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_greedy_decode_pallas_path_matches_xla():
    """Full decode loop with attn_impl='pallas' (interpret mode on CPU)
    produces identical tokens to the XLA cache-attention path."""
    from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig,
                                      SiglipConfig, MultimodalConfig,
                                      TrainConfig)
    from metamorph_tpu.inference.decode import greedy_decode
    from metamorph_tpu.models import llama as L
    from metamorph_tpu.models import metamorph as M

    cfg = MetaMorphConfig(
        llama=LlamaConfig.tiny(vocab_size=128258),
        siglip=SiglipConfig.tiny(),
        mm=MultimodalConfig(num_image_tokens=3),
        train=TrainConfig(max_seq_len=64),
    )
    params = M.init_metamorph_params(jax.random.PRNGKey(7), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    prompt_ids = jnp.asarray(rng.integers(10, 1000, (1, 6)).astype(np.int32))
    prompt = L.embed_tokens(params["llama"], prompt_ids)

    a = greedy_decode(params, cfg, prompt, max_new_tokens=10, max_images=2)
    b = greedy_decode(params, cfg, prompt, max_new_tokens=10, max_images=2,
                      attn_impl="pallas")
    np.testing.assert_array_equal(np.asarray(a["ids"]), np.asarray(b["ids"]))
    np.testing.assert_allclose(np.asarray(a["image_embeds"]),
                               np.asarray(b["image_embeds"]),
                               rtol=1e-5, atol=1e-5)


def test_chunk_attention_kernel_matches_xla():
    """Streaming chunk kernel (chunked-prefill serving path) == masked-dot
    reference: causal-with-offset masking, dynamic slot/offset prefetch,
    GQA head grouping."""
    from metamorph_tpu.ops.decode_attention import chunk_attention
    from metamorph_tpu.models.llama import _chunk_attention

    rng = np.random.default_rng(3)
    L, B, KV, S, Dh, G, C = 2, 3, 2, 32, 8, 2, 8
    H = KV * G
    k = jnp.asarray(rng.normal(size=(L, B, KV, S, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, B, KV, S, Dh)).astype(np.float32))
    for layer in (0, 1):
        for slot in (0, 2):
            for off in (0, 8, 16):
                q = jnp.asarray(rng.normal(size=(C, H, Dh)).astype(np.float32))
                got = chunk_attention(q, k, v, jnp.int32(slot),
                                      jnp.int32(off), layer=layer, block_s=16)
                pos = off + jnp.arange(C, dtype=jnp.int32)
                want = _chunk_attention(q, k[layer, slot], v[layer, slot],
                                        pos, Dh ** -0.5)
                np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                           rtol=2e-5, atol=2e-5)


def test_chunk_attention_batched_kernel_matches_xla():
    """Batched chunk kernel (speculative decoding path) == per-row masked-dot
    reference at ragged per-row offsets, fp32 and int8 cache."""
    from metamorph_tpu.ops.decode_attention import chunk_attention_batched
    from metamorph_tpu.models.llama import _chunk_attention
    from metamorph_tpu.ops.quant import quantize_kv

    rng = np.random.default_rng(4)
    L, B, KV, S, Dh, G, C = 2, 3, 2, 32, 8, 2, 4
    H = KV * G
    k = jnp.asarray(rng.normal(size=(L, B, KV, S, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, B, KV, S, Dh)).astype(np.float32))
    offs = jnp.asarray([0, 9, 23], jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, C, H, Dh)).astype(np.float32))
    for layer in (0, 1):
        got = chunk_attention_batched(q, k, v, offs, layer=layer, block_s=16)
        for b in range(B):
            pos = offs[b] + jnp.arange(C, dtype=jnp.int32)
            want = _chunk_attention(q[b], k[layer, b], v[layer, b], pos,
                                    Dh ** -0.5)
            np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want),
                                       rtol=2e-5, atol=2e-5)

    # int8 cache: kernel dequantizes in-kernel == explicit dequant reference
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    got = chunk_attention_batched(q, kq, vq, offs, layer=1,
                                  block_s=16, k_scale=ks, v_scale=vs)
    kd = kq.astype(jnp.float32) * ks[..., None]
    vd = vq.astype(jnp.float32) * vs[..., None]
    for b in range(B):
        pos = offs[b] + jnp.arange(C, dtype=jnp.int32)
        want = _chunk_attention(q[b], kd[1, b], vd[1, b], pos, Dh ** -0.5)
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_batched_spec_decode_pallas_matches_xla():
    """batched_greedy_decode_spec(attn_impl='pallas') through the batched
    chunk kernel == the xla chunk path (equal-length unpadded rows)."""
    from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig,
                                      SiglipConfig, MultimodalConfig,
                                      TrainConfig)
    from metamorph_tpu.inference.spec_decode import batched_greedy_decode_spec
    from metamorph_tpu.models import metamorph as M

    cfg = MetaMorphConfig(
        llama=LlamaConfig.tiny(vocab_size=128258),
        siglip=SiglipConfig.tiny(),
        mm=MultimodalConfig(num_image_tokens=3),
        train=TrainConfig(max_seq_len=64),
    )
    params = M.init_metamorph_params(jax.random.PRNGKey(7), cfg, jnp.float32)
    rng = np.random.default_rng(9)
    B, T0 = 2, 6
    ids = jnp.asarray(rng.integers(10, 1000, (B, T0)).astype(np.int32))
    from metamorph_tpu.models.llama import embed_tokens
    pe = embed_tokens(params["llama"], ids)
    mask = jnp.ones((B, T0), jnp.int32)
    a = batched_greedy_decode_spec(params, cfg, pe, mask, ids,
                                   max_new_tokens=8, max_images=1, spec_k=4,
                                   attn_impl="xla")
    b = batched_greedy_decode_spec(params, cfg, pe, mask, ids,
                                   max_new_tokens=8, max_images=1, spec_k=4,
                                   attn_impl="pallas")
    np.testing.assert_array_equal(np.asarray(a["ids"]), np.asarray(b["ids"]))
    np.testing.assert_array_equal(np.asarray(a["n_ids"]),
                                  np.asarray(b["n_ids"]))
    np.testing.assert_allclose(np.asarray(a["image_embeds"]),
                               np.asarray(b["image_embeds"]),
                               rtol=1e-5, atol=1e-5)
