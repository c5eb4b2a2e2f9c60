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
    """Every oversize mode raises at submit() — never inside step(), where it
    would strand in-flight requests — and the engine stays usable after."""
    eng = ServeEngine(params, CFG, n_slots=1, max_cache_len=32,
                      max_new_tokens_cap=8, max_images=1,
                      prefill_buckets=(8,))
    D = CFG.llama.hidden_size
    with pytest.raises(ValueError):  # budget > ids buffer cap
        eng.submit(Request(prompt_embeds=np.zeros((4, D), np.float32),
                           max_new_tokens=64))
    with pytest.raises(ValueError):  # prompt + generation > max_cache_len
        eng.submit(Request(prompt_embeds=np.zeros((30, D), np.float32),
                           max_new_tokens=8))
    with pytest.raises(ValueError):  # prompt > largest bucket (== cache len)
        eng.submit(Request(prompt_embeds=np.zeros((40, D), np.float32),
                           max_new_tokens=1))
    good = _prompts(params, [5], seed=1)[0]
    eng.submit(Request(prompt_embeds=good, max_new_tokens=4, uid="ok"))
    done = eng.run()
    assert [c.uid for c in done] == ["ok"]


def test_serve_bucket_never_exceeds_cache(params):
    """Buckets above max_cache_len are clamped in __init__ — an unclamped
    bucket would dynamic_update_slice an oversized row cache into the engine
    cache (hard XLA error mid-run)."""
    eng = ServeEngine(params, CFG, n_slots=1, max_cache_len=24,
                      max_new_tokens_cap=8, max_images=1,
                      prefill_buckets=(8, 64, 4096))
    assert eng.prefill_buckets == (8, 24)
    p = _prompts(params, [10], seed=2)[0]  # buckets to 24, not 64
    eng.submit(Request(prompt_embeds=p, max_new_tokens=4, uid="x"))
    done = eng.run()
    ref_ids, _ = _reference(params, p, 4)
    np.testing.assert_array_equal(done[0].ids, ref_ids)


def test_chunked_fill_matches_blocking_prefill(params):
    """A request admitted via chunked prefill (fused into the decode stream,
    _decode_fill_all) decodes the same tokens as the blocking-prefill path
    and as a standalone single-request decode — while another slot keeps
    generating."""
    prompts = _prompts(params, [5, 13], seed=11)
    eng = ServeEngine(params, CFG, n_slots=2, max_cache_len=64,
                      max_new_tokens_cap=16, max_images=2,
                      prefill_buckets=(8, 16), steps_per_sync=2,
                      fill_chunk=4)
    assert eng.fill_chunk == 4  # 64 % 4 == 0 -> chunked fill enabled
    eng.submit(Request(prompt_embeds=prompts[0], max_new_tokens=12, uid="a"))
    eng.step()                  # blocking admit (nothing decoding yet)
    assert not eng._fills
    # "b" (13 tokens -> 4 chunks of 4) arrives while "a" decodes: must go
    # through the chunked-fill path
    eng.submit(Request(prompt_embeds=prompts[1], max_new_tokens=9, uid="b"))
    eng.step()
    assert eng._fills or eng.slot_uid.count(None) == 0
    done = eng.run()
    assert sorted(str(c.uid) for c in done) == ["a", "b"]
    for c in done:
        p, budget = (prompts[0], 12) if c.uid == "a" else (prompts[1], 9)
        ref_ids, ref_emb = _reference(params, p, budget)
        np.testing.assert_array_equal(c.ids, ref_ids)
        assert c.image_embeds.shape[0] == ref_emb.shape[0]
        if ref_emb.size:
            np.testing.assert_allclose(c.image_embeds, ref_emb,
                                       rtol=1e-4, atol=1e-4)


def test_chunked_fill_high_churn_stream(params):
    """Stream of staggered requests through 2 slots with chunked fill on:
    every completion must match its standalone decode (stress: admissions
    continuously interleave with decode chunks)."""
    lengths = [6, 11, 4, 9, 14, 7]
    budgets = [8, 5, 10, 6, 4, 7]
    prompts = _prompts(params, lengths, seed=23)
    eng = ServeEngine(params, CFG, n_slots=2, max_cache_len=64,
                      max_new_tokens_cap=16, max_images=2,
                      prefill_buckets=(16,), steps_per_sync=4,
                      fill_chunk=4)
    for i, (p, b) in enumerate(zip(prompts, budgets)):
        eng.submit(Request(prompt_embeds=p, max_new_tokens=b, uid=i))
    done = eng.run()
    assert sorted(c.uid for c in done) == list(range(6))
    for c in done:
        ref_ids, ref_emb = _reference(params, prompts[c.uid], budgets[c.uid])
        np.testing.assert_array_equal(c.ids, ref_ids)
        assert c.image_embeds.shape[0] == ref_emb.shape[0]


def test_ids_path_matches_embeds_path(params):
    """Admission by token ids (embedding lookup on device) produces exactly
    the tokens of the pre-fused-embeddings path — the two transports must be
    numerically identical, only the host->device traffic differs."""
    rng = np.random.default_rng(5)
    ids_list = [rng.integers(10, 1000, (t0,)).astype(np.int32)
                for t0 in (6, 9, 4)]

    def run(as_ids):
        eng = ServeEngine(params, CFG, n_slots=2, max_cache_len=64,
                          max_new_tokens_cap=16, max_images=2,
                          prefill_buckets=(8, 16), steps_per_sync=3)
        for i, ids in enumerate(ids_list):
            if as_ids:
                eng.submit(Request(prompt_ids=ids, max_new_tokens=8, uid=i))
            else:
                pe = np.asarray(L.embed_tokens(params["llama"], ids[None])[0])
                eng.submit(Request(prompt_embeds=pe, max_new_tokens=8, uid=i))
        return {c.uid: c for c in eng.run()}

    a, b = run(True), run(False)
    assert sorted(a) == sorted(b) == [0, 1, 2]
    for uid in a:
        np.testing.assert_array_equal(a[uid].ids, b[uid].ids)
        np.testing.assert_allclose(a[uid].image_embeds, b[uid].image_embeds,
                                   rtol=1e-6, atol=1e-6)


def test_ids_path_image_splice_matches_host_fusion(params):
    """A multimodal ids request (image tokens spliced ON DEVICE by
    _embed_splice) decodes identically to the same prompt pre-fused
    host-side."""
    K = CFG.mm.num_image_tokens
    D = CFG.llama.hidden_size
    rng = np.random.default_rng(9)
    ids = rng.integers(10, 1000, (11,)).astype(np.int32)
    pos = 3
    img = rng.normal(size=(1, K, D)).astype(np.float32) * 0.02

    # host fusion: overwrite K rows of the embedded prompt
    pe = np.asarray(L.embed_tokens(params["llama"], ids[None])[0]).copy()
    pe[pos:pos + K] = img[0]

    def run(req):
        eng = ServeEngine(params, CFG, n_slots=1, max_cache_len=64,
                          max_new_tokens_cap=16, max_images=2,
                          prefill_buckets=(16,), steps_per_sync=2)
        eng.submit(req)
        return eng.run()[0]

    a = run(Request(prompt_ids=ids, image_embeds=img,
                    image_positions=np.asarray([pos]), max_new_tokens=8,
                    uid="ids"))
    b = run(Request(prompt_embeds=pe, max_new_tokens=8, uid="pe"))
    np.testing.assert_array_equal(a.ids, b.ids)
    np.testing.assert_allclose(a.image_embeds, b.image_embeds,
                               rtol=1e-6, atol=1e-6)


def test_chunked_fill_ids_matches_blocking(params):
    """Chunked fill driven by token ids (+ an image crossing a chunk
    boundary) == the blocking ids admission == host-fused decode."""
    K = CFG.mm.num_image_tokens      # 3
    D = CFG.llama.hidden_size
    rng = np.random.default_rng(13)
    ids = rng.integers(10, 1000, (14,)).astype(np.int32)
    pos = 3                          # image spans positions 3..5; chunk=4
    img = rng.normal(size=(1, K, D)).astype(np.float32) * 0.02

    def mk():
        return Request(prompt_ids=ids.copy(), image_embeds=img.copy(),
                       image_positions=np.asarray([pos]), max_new_tokens=9,
                       uid="x")

    # blocking path
    eng = ServeEngine(params, CFG, n_slots=1, max_cache_len=64,
                      max_new_tokens_cap=16, max_images=2,
                      prefill_buckets=(16,), steps_per_sync=2)
    eng.submit(mk())
    ref = eng.run()[0]

    # chunked-fill path: another request decodes while "x" streams in
    warm = _prompts(params, [5], seed=2)[0]
    eng2 = ServeEngine(params, CFG, n_slots=2, max_cache_len=64,
                       max_new_tokens_cap=16, max_images=2,
                       prefill_buckets=(16,), steps_per_sync=2, fill_chunk=4)
    eng2.submit(Request(prompt_embeds=warm, max_new_tokens=12, uid="warm"))
    eng2.step()
    eng2.submit(mk())
    eng2.step()
    assert eng2._fills or eng2.slot_uid.count(None) == 0
    done = {c.uid: c for c in eng2.run()}
    np.testing.assert_array_equal(done["x"].ids, ref.ids)
    np.testing.assert_allclose(done["x"].image_embeds, ref.image_embeds,
                               rtol=1e-5, atol=1e-5)


def test_serve_submit_validation_ids(params):
    eng = ServeEngine(params, CFG, n_slots=1, max_cache_len=32,
                      max_new_tokens_cap=8, max_images=1,
                      prefill_buckets=(8,), max_prefill_images=1)
    K, D = CFG.mm.num_image_tokens, CFG.llama.hidden_size
    ids = np.arange(10, 16, dtype=np.int32)
    with pytest.raises(ValueError):   # both transports set
        eng.submit(Request(prompt_ids=ids,
                           prompt_embeds=np.zeros((6, D), np.float32)))
    with pytest.raises(ValueError):   # neither set
        eng.submit(Request())
    with pytest.raises(ValueError):   # too many images
        eng.submit(Request(prompt_ids=ids,
                           image_embeds=np.zeros((2, K, D), np.float32),
                           image_positions=np.asarray([0, 3])))
    with pytest.raises(ValueError):   # bad image shape
        eng.submit(Request(prompt_ids=ids,
                           image_embeds=np.zeros((1, K + 1, D), np.float32),
                           image_positions=np.asarray([0])))
    with pytest.raises(ValueError):   # images on the embeds path
        eng.submit(Request(prompt_embeds=np.zeros((6, D), np.float32),
                           image_embeds=np.zeros((1, K, D), np.float32),
                           image_positions=np.asarray([0])))


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


def test_sample_rows_per_row_params():
    """Vectorized sampler unit behaviors: a tiny nucleus collapses to argmax
    regardless of temperature; a peaked distribution always returns its mode;
    every draw lands inside the top-k window."""
    from metamorph_tpu.inference.serve import _sample_rows

    rng = jax.random.PRNGKey(0)
    V = 300
    logits = np.zeros((3, V), np.float32)
    logits[0, 17] = 5.0                      # row 0: clear argmax
    logits[1, 42] = 50.0                     # row 1: overwhelming mode
    logits[2] = np.linspace(0, 3, V)         # row 2: flat-ish tail
    temp = jnp.asarray([4.0, 1.0, 1.0], jnp.float32)
    top_p = jnp.asarray([1e-6, 1.0, 0.5], jnp.float32)
    for i in range(20):
        tok = np.asarray(_sample_rows(jax.random.fold_in(rng, i),
                                      jnp.asarray(logits), temp, top_p))
        assert tok[0] == 17                  # nucleus keeps only the top-1
        assert tok[1] == 42                  # mode dominates
        assert tok[2] >= V - 64              # inside the top-k window


def test_serve_sampling_tiny_nucleus_equals_greedy(params):
    """temperature>0 with top_p→0 keeps exactly the top-1 token: the sampled
    stream must be bitwise the greedy stream (exercises the sampling=True
    compiled graphs end to end)."""
    p = _prompts(params, [6], seed=31)[0]
    eng = ServeEngine(params, CFG, n_slots=1, max_cache_len=64,
                      max_new_tokens_cap=16, max_images=2,
                      prefill_buckets=(8,), steps_per_sync=2)
    eng.submit(Request(prompt_embeds=p, max_new_tokens=8, uid="s",
                       temperature=3.0, top_p=1e-6))
    assert eng._sampling
    out = eng.run()[0]
    ref_ids, _ = _reference(params, p, 8)
    np.testing.assert_array_equal(out.ids, ref_ids)


def test_serve_sampling_deterministic_and_mixed(params):
    """Same engine seed -> identical sampled stream; a greedy request served
    NEXT TO a sampling request still decodes its exact greedy tokens (temp=0
    rows select argmax inside the sampling graph)."""
    prompts = _prompts(params, [6, 9], seed=37)

    def run(seed):
        eng = ServeEngine(params, CFG, n_slots=2, max_cache_len=64,
                          max_new_tokens_cap=16, max_images=2,
                          prefill_buckets=(8, 16), steps_per_sync=2,
                          seed=seed)
        eng.submit(Request(prompt_embeds=prompts[0], max_new_tokens=10,
                           uid="sample", temperature=0.8, top_p=0.95))
        eng.submit(Request(prompt_embeds=prompts[1], max_new_tokens=7,
                           uid="greedy"))
        return {c.uid: c for c in eng.run()}

    a, b = run(0), run(0)
    np.testing.assert_array_equal(a["sample"].ids, b["sample"].ids)
    ref_ids, _ = _reference(params, prompts[1], 7)
    np.testing.assert_array_equal(a["greedy"].ids, ref_ids)
    np.testing.assert_array_equal(b["greedy"].ids, ref_ids)


def test_serve_sampling_validation(params):
    eng = ServeEngine(params, CFG, n_slots=1, max_cache_len=32,
                      max_new_tokens_cap=8, max_images=1,
                      prefill_buckets=(8,))
    D = CFG.llama.hidden_size
    pe = np.zeros((4, D), np.float32)
    with pytest.raises(ValueError):
        eng.submit(Request(prompt_embeds=pe, temperature=-0.1,
                           max_new_tokens=4))
    with pytest.raises(ValueError):
        eng.submit(Request(prompt_embeds=pe, top_p=0.0, max_new_tokens=4))
    with pytest.raises(ValueError):
        eng.submit(Request(prompt_embeds=pe, top_p=1.5, max_new_tokens=4))
    assert not eng._sampling


def test_serve_streaming_tokens(params):
    """on_token streams each row's newly recorded ids per sync chunk, riding
    the existing packed snapshot: per-uid concatenation must equal the final
    Completed.ids, delivered across multiple callbacks (not one blob), and
    slot reuse must not leak one request's tokens into the next."""
    import collections
    chunks = collections.defaultdict(list)

    prompts = _prompts(params, [6, 9, 4], seed=41)
    budgets = [12, 7, 10]
    eng = ServeEngine(params, CFG, n_slots=2, max_cache_len=64,
                      max_new_tokens_cap=16, max_images=2,
                      prefill_buckets=(8, 16), steps_per_sync=2,
                      on_token=lambda uid, ids: chunks[uid].append(ids))
    for i, (p, b) in enumerate(zip(prompts, budgets)):
        eng.submit(Request(prompt_embeds=p, max_new_tokens=b, uid=i))
    done = {c.uid: c for c in eng.run()}

    assert sorted(chunks) == [0, 1, 2]
    for uid, c in done.items():
        streamed = np.concatenate(chunks[uid]) if chunks[uid] else np.array([])
        np.testing.assert_array_equal(streamed, c.ids)
    # 12 tokens at 2 steps/sync cannot arrive in one callback
    assert max(len(chunks[uid]) for uid in chunks) > 1


def test_serve_streaming_with_chunked_fill(params):
    """Streaming stays correct while a long prompt streams in through the
    chunked-fill path: the decoding slot keeps streaming, the filling slot
    emits nothing until admitted, and both match their final ids."""
    import collections
    chunks = collections.defaultdict(list)

    prompts = _prompts(params, [5, 13], seed=43)
    eng = ServeEngine(params, CFG, n_slots=2, max_cache_len=64,
                      max_new_tokens_cap=16, max_images=2,
                      prefill_buckets=(8, 16), steps_per_sync=2, fill_chunk=4,
                      on_token=lambda uid, ids: chunks[uid].append(ids))
    eng.submit(Request(prompt_embeds=prompts[0], max_new_tokens=12, uid="a"))
    eng.step()
    eng.submit(Request(prompt_embeds=prompts[1], max_new_tokens=9, uid="b"))
    done = {c.uid: c for c in eng.run()}
    for uid in ("a", "b"):
        streamed = np.concatenate(chunks[uid]) if chunks[uid] else np.array([])
        np.testing.assert_array_equal(streamed, done[uid].ids)


def test_multi_slot_fill_matches_blocking(params):
    """Multi-slot chunked fill (max_fills=2): two long ids-prompts stream
    their chunks through the SAME ticks (both fills observed in flight), and
    every completion exactly matches the no-fill engine's."""
    rng = np.random.default_rng(17)
    ids_a = rng.integers(10, 1000, (13,)).astype(np.int32)
    ids_b = rng.integers(10, 1000, (11,)).astype(np.int32)
    short = rng.integers(10, 1000, (4,)).astype(np.int32)

    def run(fill):
        eng = ServeEngine(params, CFG, n_slots=3, max_cache_len=64,
                          max_new_tokens_cap=16, max_images=1,
                          prefill_buckets=(8, 16), steps_per_sync=2,
                          fill_chunk=4 if fill else 0, max_fills=2)
        eng.submit(Request(prompt_ids=short.copy(), max_new_tokens=12,
                           uid="s"))
        eng.step()           # "s" admits blocking and starts decoding
        eng.submit(Request(prompt_ids=ids_a.copy(), max_new_tokens=9,
                           uid="a"))
        eng.submit(Request(prompt_ids=ids_b.copy(), max_new_tokens=8,
                           uid="b"))
        most_fills = 0
        while eng.pending or any(u is not None for u in eng.slot_uid):
            eng.step()
            most_fills = max(most_fills, len(eng._fills))
        return {str(c.uid): c for c in eng.completed}, most_fills

    plain, _ = run(False)
    filled, most = run(True)
    assert most == 2          # both fills were in flight together
    for uid in ("s", "a", "b"):
        np.testing.assert_array_equal(filled[uid].ids, plain[uid].ids)
