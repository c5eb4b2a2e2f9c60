"""Weight-only int8 decode quantization (ops/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig)
from metamorph_tpu.models import llama as L
from metamorph_tpu.models import metamorph as M
from metamorph_tpu.ops.quant import (dequantize_weight, is_quantized,
                                     quantize_llama_decode, quantize_weight,
                                     quantized_matmul)

CFG = MetaMorphConfig(
    llama=LlamaConfig.tiny(vocab_size=128258),
    siglip=SiglipConfig.tiny(),
    mm=MultimodalConfig(num_image_tokens=3),
    train=TrainConfig(max_seq_len=64),
)


@pytest.fixture(scope="module")
def params():
    return M.init_metamorph_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(4, 32, 48)).astype(np.float32))
    wq = quantize_weight(w)
    assert wq["int8_q"].dtype == jnp.int8
    assert wq["scale"].shape == (4, 1, 48)
    back = dequantize_weight(wq, jnp.float32)
    # symmetric int8: max error is half a quantization step per channel
    step = np.asarray(wq["scale"])
    assert np.all(np.abs(np.asarray(back - w)) <= step / 2 + 1e-7)


def test_quantized_matmul_matches_dequantized():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(5, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32))
    wq = quantize_weight(w)
    ref = x @ dequantize_weight(wq, jnp.float32)
    out = quantized_matmul(x, wq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_quantize_llama_decode_tree(params):
    q = quantize_llama_decode(params["llama"])
    assert is_quantized(q["layers"]["attn"]["wq"])
    assert is_quantized(q["layers"]["mlp"]["w_down"])
    assert is_quantized(q["lm_head"]["kernel"])
    # embedding and norms untouched
    assert q["embed"]["embedding"].dtype == params["llama"]["embed"]["embedding"].dtype
    assert q["layers"]["input_norm"]["scale"].ndim == 2
    # stacked layer axis preserved
    Lx = CFG.llama.num_layers
    assert q["layers"]["attn"]["wq"]["int8_q"].shape[0] == Lx
    assert q["layers"]["attn"]["wq"]["scale"].shape[0] == Lx


def test_quantized_decode_step_matches_dequantized(params):
    """decode_step with int8 weights == decode_step with the explicitly
    dequantized (fp) weights — same math, different association order."""
    qll = quantize_llama_decode(params["llama"])
    dqll = jax.tree.map(lambda x: x, params["llama"])
    layers = dict(dqll["layers"])
    attn, mlp = dict(layers["attn"]), dict(layers["mlp"])
    for name in ("wq", "wk", "wv", "wo"):
        attn[name] = dequantize_weight(qll["layers"]["attn"][name], jnp.float32)
    for name in ("w_gate", "w_up", "w_down"):
        mlp[name] = dequantize_weight(qll["layers"]["mlp"][name], jnp.float32)
    layers["attn"], layers["mlp"] = attn, mlp
    dqll["layers"] = layers
    dqll["lm_head"] = {"kernel": dequantize_weight(qll["lm_head"]["kernel"],
                                                   jnp.float32)}

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 1, CFG.llama.hidden_size)).astype(np.float32))
    pos = jnp.full((2, 1), 3, jnp.int32)
    cache_q = L.init_kv_cache(CFG.llama, 2, 16, jnp.float32)
    cache_d = L.init_kv_cache(CFG.llama, 2, 16, jnp.float32)
    hq, _ = L.decode_step(qll, CFG.llama, x, pos, cache_q, jnp.int32(3))
    hd, _ = L.decode_step(dqll, CFG.llama, x, pos, cache_d, jnp.int32(3))
    np.testing.assert_allclose(np.asarray(hq), np.asarray(hd),
                               rtol=1e-4, atol=1e-4)


def test_quantized_greedy_decode_runs(params):
    """End-to-end smoke: the full multimodal decode loop over int8 weights."""
    from metamorph_tpu.inference.decode import greedy_decode

    qparams = dict(params)
    qparams["llama"] = quantize_llama_decode(params["llama"])
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(10, 1000, (1, 6)).astype(np.int32))
    prompt = L.embed_tokens(qparams["llama"], ids)
    out = greedy_decode(qparams, CFG, prompt, max_new_tokens=8, max_images=2)
    assert int(out["steps"]) >= 1
    assert np.all(np.asarray(out["ids"][: int(out["n_ids"])]) >= 0)


def test_quantized_serve_engine(params):
    """Continuous batching over int8 weights: the quantized tree flows through
    prefill (scan over stacked int8 layers) and the unrolled decode."""
    from metamorph_tpu.inference.serve import Request, ServeEngine

    qparams = dict(params)
    qparams["llama"] = quantize_llama_decode(params["llama"])
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(10, 1000, (1, 5)).astype(np.int32))
    prompt = np.asarray(L.embed_tokens(qparams["llama"], ids)[0])
    eng = ServeEngine(qparams, CFG, n_slots=2, max_cache_len=32,
                      max_new_tokens_cap=8, max_images=1,
                      prefill_buckets=(8,), steps_per_sync=2)
    eng.submit(Request(prompt_embeds=prompt, max_new_tokens=6, uid="q"))
    done = eng.run()
    assert done[0].uid == "q" and done[0].steps >= 1

    # matches the single-request quantized decode
    from metamorph_tpu.inference.decode import greedy_decode

    ref = greedy_decode(qparams, CFG, jnp.asarray(prompt)[None],
                        max_new_tokens=6, max_images=1)
    np.testing.assert_array_equal(done[0].ids,
                                  np.asarray(ref["ids"][: int(ref["n_ids"])]))
