"""LoRA tests: zero-init no-op, merge equivalence, trainable-set restriction."""

import jax
import jax.numpy as jnp
import numpy as np

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig)
from metamorph_tpu.models import llama as L
from metamorph_tpu.models import lora as lora_lib


def make(lora_r=4):
    cfg = LlamaConfig.tiny(vocab_size=256)
    cfg = LlamaConfig(**{**cfg.__dict__, "lora_r": lora_r, "lora_alpha": 8.0})
    base = L.init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, base


def run(params, cfg, ids):
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1], dtype=jnp.int32), ids.shape)
    emb = L.embed_tokens(params, ids)
    return L.llama_forward(params, cfg, emb, pos,
                           jnp.ones(ids.shape, jnp.int32))


def test_zero_init_is_noop():
    cfg, base = make()
    with_lora = dict(base)
    with_lora = lora_lib.add_lora(base, jax.random.PRNGKey(1), r=4)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 8)), jnp.int32)
    h0 = run(base, cfg, ids)
    h1 = run(with_lora, cfg, ids)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), rtol=1e-6)


def test_merge_equivalence():
    cfg, base = make()
    p = lora_lib.add_lora(base, jax.random.PRNGKey(1), r=4)
    # randomize B factors so LoRA actually contributes
    key = jax.random.PRNGKey(2)
    layers = p["layers"]
    for sub in layers:
        for name in list(layers[sub]):
            if name.endswith("_lora_b"):
                key, k = jax.random.split(key)
                layers[sub][name] = 0.02 * jax.random.normal(
                    k, layers[sub][name].shape, jnp.float32)

    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (1, 8)), jnp.int32)
    h_lora = run(p, cfg, ids)
    h_base = run(base, cfg, ids)
    assert not np.allclose(np.asarray(h_lora), np.asarray(h_base))

    merged = lora_lib.merge_lora(p, r=4, alpha=8.0)
    assert not any("_lora_" in k for sub in merged["layers"].values() for k in sub)
    cfg_off = LlamaConfig(**{**cfg.__dict__, "lora_r": 0})
    h_merged = run(merged, cfg_off, ids)
    np.testing.assert_allclose(np.asarray(h_merged), np.asarray(h_lora),
                               rtol=2e-5, atol=2e-5)


def test_lora_trainable_mask():
    from metamorph_tpu.train.optimizer import trainable_mask

    cfg, base = make()
    p = lora_lib.add_lora(base, jax.random.PRNGKey(1), r=4)
    full = {"llama": p, "siglip": {"x": jnp.zeros(3)},
            "projector": {"w0": {"kernel": jnp.zeros((2, 2))}},
            "vision_head": {"w0": {"kernel": jnp.zeros((2, 2))}}}
    tc = TrainConfig(lora_enable=True)
    mask = trainable_mask(full, tc)
    assert mask["llama"]["layers"]["attn"]["wq_lora_a"] is True
    assert mask["llama"]["layers"]["attn"]["wq"] is False
    assert mask["llama"]["embed"]["embedding"] is False
    assert mask["projector"]["w0"]["kernel"] is True
    assert mask["siglip"]["x"] is False


def test_split_lora_state():
    cfg, base = make()
    p = lora_lib.add_lora(base, jax.random.PRNGKey(1), r=4)
    split = lora_lib.split_lora_state(p)
    names = [k for sub in split["layers"].values() for k in sub]
    assert all("_lora_" in n for n in names)
    assert len(names) == 14  # 7 targets x (a, b)


def test_lora_save_load_merge(tmp_path):
    from metamorph_tpu.train.checkpoint import load_lora, save_lora

    cfg, base = make()
    p = lora_lib.add_lora(base, jax.random.PRNGKey(1), r=4)
    # make the factors non-trivial
    key = jax.random.PRNGKey(9)
    for sub in p["layers"]:
        for name in list(p["layers"][sub]):
            if "_lora_" in name:
                key, k = jax.random.split(key)
                p["layers"][sub][name] = 0.05 * jax.random.normal(
                    k, p["layers"][sub][name].shape, jnp.float32)

    full = {"llama": p}
    path = str(tmp_path / "lora.safetensors")
    save_lora(path, full)

    restored = load_lora(path, {"llama": base})
    for sub in p["layers"]:
        for name, val in p["layers"][sub].items():
            if "_lora_" in name:
                np.testing.assert_array_equal(
                    np.asarray(restored["llama"]["layers"][sub][name]),
                    np.asarray(val))

    merged = lora_lib.merge_lora(restored["llama"], r=4, alpha=8.0)
    merged_direct = lora_lib.merge_lora(p, r=4, alpha=8.0)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(merged_direct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
