"""Ring attention over an 8-device sequence axis == single-device causal
attention, forward and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.config import MeshConfig
from metamorph_tpu.ops.attention import dot_product_attention, make_causal_mask
from metamorph_tpu.parallel.mesh import build_mesh
from metamorph_tpu.parallel.ring_attention import ring_attention


@pytest.fixture(scope="module")
def seq_mesh():
    # all 8 devices on one axis used as the sequence ring
    return build_mesh(MeshConfig(data=1, fsdp=8, tensor=1))


def ref(q, k, v):
    B, T = q.shape[:2]
    mask = make_causal_mask(jnp.ones((B, T), jnp.int32))
    return dot_product_attention(q, k, v, mask=mask)


def test_ring_forward_matches_full(seq_mesh):
    B, T, H, KV, Dh = 1, 8 * 64, 4, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, T, H, Dh), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, KV, Dh), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, KV, Dh), jnp.float32)

    out = ring_attention(q, k, v, seq_mesh, axis_name="fsdp",
                         block_q=64, block_k=64)
    expected = ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_ring_gradients_match(seq_mesh):
    B, T, H, KV, Dh = 1, 8 * 32, 2, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, T, H, Dh), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, KV, Dh), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, KV, Dh), jnp.float32)

    def loss_ring(q, k, v):
        o = ring_attention(q, k, v, seq_mesh, axis_name="fsdp",
                           block_q=32, block_k=32)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(ref(q, k, v).astype(jnp.float32) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)
