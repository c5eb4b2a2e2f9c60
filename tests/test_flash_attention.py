"""Flash-attention kernel parity (interpret mode on CPU): forward + backward
vs the XLA reference attention, incl. GQA, padding, non-divisible shapes."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.ops.attention import dot_product_attention, make_causal_mask
from metamorph_tpu.ops.flash_attention import flash_attention


def ref_attention(q, k, v, attn_mask=None, causal=True):
    B, T = q.shape[:2]
    mask = None
    if causal:
        am = attn_mask if attn_mask is not None else jnp.ones((B, k.shape[1]), jnp.int32)
        mask = make_causal_mask(am)[:, :, :T, :]
    return dot_product_attention(q, k, v, mask=mask)


def rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("B,T,H,KV,Dh,bq,bk", [
    (2, 256, 4, 4, 64, 128, 128),     # MHA
    (2, 256, 4, 2, 64, 128, 128),     # GQA 2x
    (1, 384, 8, 2, 64, 128, 128),     # GQA 4x, 3 blocks
])
def test_forward_parity(B, T, H, KV, Dh, bq, bk):
    q = rand((B, T, H, Dh), 0)
    k = rand((B, T, KV, Dh), 1)
    v = rand((B, T, KV, Dh), 2)
    out = flash_attention(q, k, v, causal=True, block_q=bq, block_k=bk)
    ref = ref_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_forward_padding():
    B, T, H, KV, Dh = 2, 256, 4, 2, 64
    q, k, v = rand((B, T, H, Dh), 3), rand((B, T, KV, Dh), 4), rand((B, T, KV, Dh), 5)
    mask = np.zeros((B, T), np.int32)
    mask[0, :100] = 1
    mask[1, :256] = 1
    mask = jnp.asarray(mask)
    out = flash_attention(q, k, v, attn_mask=mask, causal=True)
    ref = ref_attention(q, k, v, attn_mask=mask, causal=True)
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               rtol=2e-5, atol=2e-5)


def test_forward_padding_triangle_grid(monkeypatch):
    """Exercises _fwd_kernel_tri's masked branch and length guard: small tri
    blocks (so T=512 yields >= 2 blocks and takes the triangle path) with a
    padded row whose length is not block-aligned, plus rectangular blocks."""
    B, T, H, KV, Dh = 2, 512, 4, 2, 64
    q, k, v = rand((B, T, H, Dh), 12), rand((B, T, KV, Dh), 13), rand((B, T, KV, Dh), 14)
    mask = np.zeros((B, T), np.int32)
    mask[0, :300] = 1           # crosses a 128-block boundary mid-block
    mask[1, :512] = 1
    mask = jnp.asarray(mask)
    ref = ref_attention(q, k, v, attn_mask=mask, causal=True)
    valid = np.asarray(mask, bool)
    for bq, bk in [(128, 128), (128, 256)]:
        monkeypatch.setenv("FLASH_TRI_BLOCK", str(bq))
        monkeypatch.setenv("FLASH_TRI_BLOCK_K", str(bk))
        out = flash_attention(q, k, v, attn_mask=mask, causal=True)
        np.testing.assert_allclose(
            np.asarray(out)[valid], np.asarray(ref)[valid],
            rtol=2e-5, atol=2e-5, err_msg=f"tri blocks {bq}x{bk}")


def test_backward_parity():
    B, T, H, KV, Dh = 1, 256, 4, 2, 64
    q, k, v = rand((B, T, H, Dh), 6), rand((B, T, KV, Dh), 7), rand((B, T, KV, Dh), 8)
    mask = np.zeros((B, T), np.int32)
    mask[0, :200] = 1
    mask = jnp.asarray(mask)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, attn_mask=mask, causal=True)
        return jnp.sum(o * o * mask[:, :, None, None])

    def loss_ref(q, k, v):
        o = ref_attention(q, k, v, attn_mask=mask, causal=True)
        return jnp.sum(o * o * mask[:, :, None, None])

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_backward_parity_triangle_grid():
    """Exercises the triangle-grid causal backward (_bwd_tri): square bwd
    blocks, T == S, >= 2 blocks per side, plus a padded row."""
    B, T, H, KV, Dh = 2, 512, 4, 2, 64
    q, k, v = rand((B, T, H, Dh), 9), rand((B, T, KV, Dh), 10), rand((B, T, KV, Dh), 11)
    mask = np.zeros((B, T), np.int32)
    mask[0, :300] = 1
    mask[1, :512] = 1
    mask = jnp.asarray(mask)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, attn_mask=mask, causal=True,
                            block_q_bwd=128, block_k_bwd=128)
        return jnp.sum(o * o * mask[:, :, None, None])

    def loss_ref(q, k, v):
        o = ref_attention(q, k, v, attn_mask=mask, causal=True)
        return jnp.sum(o * o * mask[:, :, None, None])

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_backward_parity_triangle_rect(monkeypatch):
    """Exercises the RECTANGULAR triangle backward (wide k blocks in the dq
    pass, tall q blocks in the dk/dv pass): block=64, wide=256 at T=512
    satisfies the T//wide >= 4 gate, and the 300-length row crosses a wide
    block mid-block so both kernels' masked branches run."""
    monkeypatch.setenv("FLASH_TRI_BLOCK_BWD_WIDE", "256")
    B, T, H, KV, Dh = 2, 512, 4, 2, 64
    q, k, v = rand((B, T, H, Dh), 20), rand((B, T, KV, Dh), 21), rand((B, T, KV, Dh), 22)
    mask = np.zeros((B, T), np.int32)
    mask[0, :300] = 1
    mask[1, :512] = 1
    mask = jnp.asarray(mask)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, attn_mask=mask, causal=True,
                            block_q_bwd=64, block_k_bwd=64)
        return jnp.sum(o * o * mask[:, :, None, None])

    def loss_ref(q, k, v):
        o = ref_attention(q, k, v, attn_mask=mask, causal=True)
        return jnp.sum(o * o * mask[:, :, None, None])

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("policy", ["dots_no_batch_save_attn",
                                    "save_attn_only", "save_attn_qkv"])
def test_remat_save_attn_policy_matches(policy):
    """Every remat policy must give identical grads to dots_no_batch."""
    from metamorph_tpu.config import LlamaConfig
    from metamorph_tpu.models import llama as L

    cfg = LlamaConfig(vocab_size=512, hidden_size=128, intermediate_size=256,
                      num_layers=2, num_heads=2, num_kv_heads=1, head_dim=64,
                      rope_scaling=False)
    params = L.init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = np.random.default_rng(1).integers(0, 512, (1, 256)).astype(np.int32)
    mask = jnp.ones((1, 256), jnp.int32)
    pos = jnp.asarray(np.arange(256, dtype=np.int32)[None])
    emb = L.embed_tokens(params, jnp.asarray(ids))

    def loss(p, policy):
        h = L.llama_forward(p, cfg, emb, pos, mask, attn_impl="flash",
                            remat=True, remat_policy=policy)
        return jnp.sum(h * h)

    g0 = jax.grad(lambda p: loss(p, "dots_no_batch"))(params)
    g1 = jax.grad(lambda p: loss(p, policy))(params)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=str(p0))


def test_llama_forward_with_flash_matches_xla():
    from metamorph_tpu.config import LlamaConfig
    from metamorph_tpu.models import llama as L

    cfg = LlamaConfig(vocab_size=512, hidden_size=128, intermediate_size=256,
                      num_layers=2, num_heads=2, num_kv_heads=1, head_dim=64,
                      rope_scaling=False)
    params = L.init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = np.random.default_rng(0).integers(0, 512, (2, 128)).astype(np.int32)
    mask = np.ones((2, 128), np.int32)
    mask[1, 100:] = 0
    pos = np.broadcast_to(np.arange(128, dtype=np.int32), (2, 128))
    emb = L.embed_tokens(params, jnp.asarray(ids))
    h_xla = L.llama_forward(params, cfg, emb, jnp.asarray(pos), jnp.asarray(mask),
                            attn_impl="xla")
    h_flash = L.llama_forward(params, cfg, emb, jnp.asarray(pos), jnp.asarray(mask),
                              attn_impl="flash")
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(h_flash)[valid], np.asarray(h_xla)[valid],
                               rtol=2e-4, atol=2e-4)
