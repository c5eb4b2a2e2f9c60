"""Continuous-batching serving engine: slot-level correctness vs the
single-request KV-cache decode path (which is itself tested against a
reference-style full-recompute emulation in test_decode.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig)
from metamorph_tpu.inference.decode import greedy_decode
from metamorph_tpu.inference.serve import Request, ServeEngine
from metamorph_tpu.models import llama as L
from metamorph_tpu.models import metamorph as M

CFG = MetaMorphConfig(
    llama=LlamaConfig.tiny(vocab_size=128258),
    siglip=SiglipConfig.tiny(),
    mm=MultimodalConfig(num_image_tokens=3),
    train=TrainConfig(max_seq_len=64),
)


@pytest.fixture(scope="module")
def params():
    return M.init_metamorph_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)


def _prompts(params, lengths, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for t0 in lengths:
        ids = jnp.asarray(rng.integers(10, 1000, (1, t0)).astype(np.int32))
        out.append(np.asarray(L.embed_tokens(params["llama"], ids)[0]))
    return out


def _reference(params, prompt, max_new):
    res = greedy_decode(params, CFG, jnp.asarray(prompt)[None],
                        max_new_tokens=max_new, max_images=2)
    n = int(res["n_ids"])
    k = int(res["n_image_tokens"])
    return (np.asarray(res["ids"][:n]), np.asarray(res["image_embeds"][:k]))


def test_serve_matches_single_request_decode(params):
    """3 requests with different prompt/generation lengths through a 2-slot
    engine == each request decoded alone (bitwise token ids, close embeds)."""
    prompts = _prompts(params, [6, 9, 4])
    budgets = [10, 7, 12]
    eng = ServeEngine(params, CFG, n_slots=2, max_cache_len=64,
                      max_new_tokens_cap=16, max_images=2,
                      prefill_buckets=(8, 16), steps_per_sync=3)
    for i, (p, b) in enumerate(zip(prompts, budgets)):
        eng.submit(Request(prompt_embeds=p, max_new_tokens=b, uid=i))
    done = eng.run()
    assert sorted(c.uid for c in done) == [0, 1, 2]

    for c in done:
        ref_ids, ref_emb = _reference(params, prompts[c.uid], budgets[c.uid])
        np.testing.assert_array_equal(c.ids, ref_ids)
        assert c.image_embeds.shape[0] == ref_emb.shape[0]
        if ref_emb.size:
            np.testing.assert_allclose(c.image_embeds, ref_emb,
                                       rtol=1e-5, atol=1e-5)


def test_serve_continuous_admission(params):
    """A request submitted while the engine is mid-generation lands in the
    slot freed by the first finisher — the continuous-batching property."""
    prompts = _prompts(params, [5, 5, 5], seed=3)
    eng = ServeEngine(params, CFG, n_slots=1, max_cache_len=64,
                      max_new_tokens_cap=16, max_images=2,
                      prefill_buckets=(8,), steps_per_sync=2)
    eng.submit(Request(prompt_embeds=prompts[0], max_new_tokens=4, uid="a"))
    eng.step()  # admits "a", generates a couple of tokens
    eng.submit(Request(prompt_embeds=prompts[1], max_new_tokens=4, uid="b"))
    eng.submit(Request(prompt_embeds=prompts[2], max_new_tokens=4, uid="c"))
    done = eng.run()
    assert [c.uid for c in done] == ["a", "b", "c"]  # FIFO through one slot
    for c, p in zip(done, prompts):
        ref_ids, _ = _reference(params, p, 4)
        np.testing.assert_array_equal(c.ids, ref_ids)


def test_serve_rejects_oversized(params):
    eng = ServeEngine(params, CFG, n_slots=1, max_cache_len=32,
                      max_new_tokens_cap=8, prefill_buckets=(8,))
    with pytest.raises(ValueError):
        eng.submit(Request(prompt_embeds=np.zeros((4, CFG.llama.hidden_size),
                                                  np.float32),
                           max_new_tokens=64))
    eng.submit(Request(prompt_embeds=np.zeros((30, CFG.llama.hidden_size),
                                              np.float32),
                       max_new_tokens=8))
    with pytest.raises(ValueError):
        eng.run()


def test_serve_latency_metrics(params):
    eng = ServeEngine(params, CFG, n_slots=1, max_cache_len=64,
                      max_new_tokens_cap=16, max_images=1,
                      prefill_buckets=(8,), steps_per_sync=2)
    p = _prompts(params, [5])[0]
    eng.submit(Request(prompt_embeds=p, max_new_tokens=4, uid="a"))
    eng.submit(Request(prompt_embeds=p, max_new_tokens=4, uid="b"))
    done = eng.run()
    a, b = done
    assert a.serve_s > 0 and b.serve_s > 0
    # "b" waited for "a" to finish in the single slot
    assert b.queue_s > a.queue_s
