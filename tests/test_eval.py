"""Eval harness tests: perplexity aggregation + sharded flash numerics."""

import jax
import jax.numpy as jnp
import numpy as np

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig, MeshConfig)
from metamorph_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX, IM_START_TOKEN_ID
from metamorph_tpu.eval.perplexity import evaluate
from metamorph_tpu.models import metamorph as M
from metamorph_tpu.multimodal.packing import pack_sequences

CFG = MetaMorphConfig(
    llama=LlamaConfig.tiny(vocab_size=128258),
    siglip=SiglipConfig.tiny(),
    mm=MultimodalConfig(num_image_tokens=4),
    train=TrainConfig(max_seq_len=24),
)


def make_batches(n):
    K = CFG.mm.num_image_tokens
    for i in range(n):
        ids = [[1, 2 + i, IM_START_TOKEN_ID, IMAGE_TOKEN_INDEX, 128257, 7, 8]]
        labs = [[IGNORE_INDEX, IGNORE_INDEX, IM_START_TOKEN_ID, 0, 128257, 7, 8]]
        packed = pack_sequences(ids, labs, K, CFG.train.max_seq_len, 1)
        pixels = np.random.default_rng(i).normal(size=(1, 28, 28, 3)).astype(np.float32)
        yield packed, pixels


def test_evaluate():
    params = M.init_metamorph_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    out = evaluate(params, CFG, make_batches(3))
    assert out["n_batches"] == 3
    assert out["perplexity"] > 1.0
    assert -1.0 <= out["mean_visual_cosine"] <= 1.0
    assert out["n_image_ar_tokens"] == 3 * CFG.mm.num_image_tokens
    # random model: perplexity near vocab size
    assert 1e4 < out["perplexity"] < 1e7


def test_sharded_flash_matches_xla():
    """flash_attention_sharded under a live mesh context == the XLA path."""
    from metamorph_tpu.ops.attention import dot_product_attention, make_causal_mask
    from metamorph_tpu.ops.flash_attention import flash_attention_sharded
    from metamorph_tpu.parallel.context import set_current_mesh
    from metamorph_tpu.parallel.mesh import build_mesh

    mesh = build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    B, T, H, KV, Dh = 4, 128, 4, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, T, H, Dh), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, KV, Dh), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, KV, Dh), jnp.float32)
    mask = jnp.ones((B, T), jnp.int32)

    set_current_mesh(mesh)
    try:
        out = flash_attention_sharded(q, k, v, attn_mask=mask, causal=True,
                                      block_q=64, block_k=64)
    finally:
        set_current_mesh(None)
    ref = dot_product_attention(q, k, v, mask=make_causal_mask(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
