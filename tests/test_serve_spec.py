"""Speculative continuous batching: a ServeEngine(spec_k>1) must produce,
for every greedy request, exactly the completions of the plain engine
(which are themselves pinned against single-request decode in
test_serve.py) — drafts accepted or not — and accept for real on a
periodic forced model (fewer scheduler ticks for the same tokens)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig)
from metamorph_tpu.constants import IM_START_TOKEN_ID, LLAMA3_EOS_IDS
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
    return M.init_metamorph_params(jax.random.PRNGKey(7), CFG,
                                   dtype=jnp.float32)


def _engine(params, spec_k, **kw):
    base = dict(n_slots=2, max_cache_len=64, max_new_tokens_cap=16,
                max_images=2, prefill_buckets=(8, 16), steps_per_sync=3)
    base.update(kw)
    return ServeEngine(params, CFG, spec_k=spec_k, **base)


def _id_reqs(seed, lens, budgets):
    rng = np.random.default_rng(seed)
    return [Request(prompt_ids=rng.integers(10, 1000, (t0,)).astype(np.int32),
                    max_new_tokens=b, uid=i)
            for i, (t0, b) in enumerate(zip(lens, budgets))]


def _by_uid(done):
    return {c.uid: c for c in done}


def _assert_same(a, b):
    assert sorted(a) == sorted(b)
    for uid in a:
        np.testing.assert_array_equal(a[uid].ids, b[uid].ids)
        assert a[uid].image_embeds.shape == b[uid].image_embeds.shape
        if a[uid].image_embeds.size:
            np.testing.assert_allclose(a[uid].image_embeds,
                                       b[uid].image_embeds,
                                       rtol=1e-5, atol=1e-5)


def test_spec_engine_matches_plain_engine(params):
    """Greedy ids-path requests (drafting source = prompt + generated)."""
    lens, budgets = [6, 9, 4], [10, 7, 12]
    plain = _by_uid(_run(params, 0, lens, budgets))
    spec = _by_uid(_run(params, 4, lens, budgets))
    _assert_same(plain, spec)


def _run(params, spec_k, lens, budgets, seed=0):
    eng = _engine(params, spec_k)
    for r in _id_reqs(seed, lens, budgets):
        eng.submit(r)
    return eng.run()


def test_spec_engine_embeds_path(params):
    """Pre-fused embeds admissions draft from generated ids only — still
    exactly equivalent."""
    rng = np.random.default_rng(2)
    reqs = []
    for i, (t0, b) in enumerate(zip([5, 7], [8, 8])):
        ids = jnp.asarray(rng.integers(10, 1000, (1, t0)).astype(np.int32))
        pe = np.asarray(L.embed_tokens(params["llama"], ids)[0])
        reqs.append(Request(prompt_embeds=pe, max_new_tokens=b, uid=i))
    outs = []
    for spec_k in (0, 4):
        eng = _engine(params, spec_k)
        for r in reqs:
            eng.submit(r)
        outs.append(_by_uid(eng.run()))
    _assert_same(outs[0], outs[1])


def test_spec_engine_image_mode(params):
    """Rows that enter image-emission mode stay exactly equivalent through
    the spec engine (chain stops at the special token)."""
    p = jax.tree.map(lambda x: x, params)
    D, V = CFG.llama.hidden_size, CFG.llama.vocab_size
    kernel = np.zeros((D, V), np.float32)
    kernel[:, IM_START_TOKEN_ID] = 10.0
    kernel[:, LLAMA3_EOS_IDS[0]] = -10.0
    p["llama"]["lm_head"]["kernel"] = jnp.asarray(kernel)
    lens, budgets = [6, 4], [10, 10]
    plain = _by_uid(_run(p, 0, lens, budgets, seed=6))
    spec = _by_uid(_run(p, 4, lens, budgets, seed=6))
    _assert_same(plain, spec)
    assert max(c.image_embeds.shape[0] for c in plain.values()) > 0


def test_spec_engine_mixed_sampling(params):
    """A sampling request shares the batch with greedy rows: the greedy rows'
    outputs must still equal the plain engine's (the sampled row is
    stochastic either way — just has to complete and validate)."""
    lens, budgets = [6, 5], [8, 8]
    outs = []
    for spec_k in (0, 4):
        eng = _engine(params, spec_k)
        reqs = _id_reqs(9, lens, budgets)
        reqs[1].temperature = 0.8
        reqs[1].uid = "sampled"
        for r in reqs:
            eng.submit(r)
        outs.append(_by_uid(eng.run()))
    for o in outs:
        assert set(o) == {0, "sampled"}
        assert len(o["sampled"].ids) > 0
    np.testing.assert_array_equal(outs[0][0].ids, outs[1][0].ids)


def test_spec_engine_accepts_fewer_ticks(params):
    """Periodic forced model (output provably cycles): the spec engine must
    finish the same work in fewer scheduler ticks — the acceptance payoff."""
    p = jax.tree.map(lambda x: x, params)
    D, V = CFG.llama.hidden_size, CFG.llama.vocab_size
    emb = np.asarray(params["llama"]["embed"]["embedding"])
    kernel = np.zeros((D, V), np.float32)
    kernel[:, 111] = emb[222] * 5
    kernel[:, 222] = emb[111] * 5
    p["llama"]["lm_head"]["kernel"] = jnp.asarray(kernel)

    def ticks(spec_k):
        eng = _engine(p, spec_k, n_slots=1, steps_per_sync=2)
        eng.submit(Request(
            prompt_ids=np.asarray([111, 222, 111, 222, 111, 222], np.int32),
            max_new_tokens=14, uid="r"))
        t = 0
        while eng.pending or any(u is not None for u in eng.slot_uid):
            eng.step()
            t += 1
        (done,) = eng.completed
        return t, done

    t_plain, d_plain = ticks(0)
    t_spec, d_spec = ticks(6)
    np.testing.assert_array_equal(d_plain.ids, d_spec.ids)
    if len(d_plain.ids) >= 10:
        assert t_spec < t_plain, (t_spec, t_plain)


def test_spec_engine_multimodal_ids_request(params):
    """A multimodal ids-path request (on-device image splice; the drafting
    buffer holds placeholder ids at the image span) stays exactly equivalent
    through the spec engine."""
    K = CFG.mm.num_image_tokens
    D = CFG.llama.hidden_size
    rng = np.random.default_rng(21)
    ids = rng.integers(10, 1000, (11,)).astype(np.int32)
    img = rng.normal(size=(1, K, D)).astype(np.float32) * 0.02

    def run(spec_k):
        eng = _engine(params, spec_k, n_slots=1, prefill_buckets=(16,))
        eng.submit(Request(prompt_ids=ids.copy(), image_embeds=img.copy(),
                           image_positions=np.asarray([3]),
                           max_new_tokens=8, uid="m"))
        return eng.run()[0]

    a, b = run(0), run(4)
    np.testing.assert_array_equal(a.ids, b.ids)
    np.testing.assert_allclose(a.image_embeds, b.image_embeds,
                               rtol=1e-6, atol=1e-6)


def test_spec_engine_adapts_off_on_zero_acceptance(params):
    """Random-weight model (drafts never verify): the scheduler must detect
    zero acceptance and route subsequent ticks through the plain program —
    outputs unchanged (both paths are exact)."""
    plain_eng = _engine(params, 0, n_slots=1, steps_per_sync=1)
    spec_eng = _engine(params, 4, n_slots=1, steps_per_sync=1)
    for eng in (plain_eng, spec_eng):
        for r in _id_reqs(31, [6, 5], [16, 16]):
            eng.submit(r)
    _assert_same(_by_uid(plain_eng.run()), _by_uid(spec_eng.run()))
    # fell back to plain mid-run: the per-row rates converged to ~0 and the
    # last ticks routed through the plain program
    assert spec_eng._ticks_since_spec > 0
    probed = spec_eng._row_rate[spec_eng._row_rate >= 0]
    assert probed.size and probed.max() < spec_eng.spec_overhead_frac


def test_spec_engine_stays_on_when_accepting(params):
    """Periodic forced model: acceptance flows, so the engine never falls
    back."""
    p = jax.tree.map(lambda x: x, params)
    D, V = CFG.llama.hidden_size, CFG.llama.vocab_size
    emb = np.asarray(params["llama"]["embed"]["embedding"])
    kernel = np.zeros((D, V), np.float32)
    kernel[:, 111] = emb[222] * 5
    kernel[:, 222] = emb[111] * 5
    p["llama"]["lm_head"]["kernel"] = jnp.asarray(kernel)
    eng = _engine(p, 6, n_slots=1, steps_per_sync=1)
    eng.submit(Request(
        prompt_ids=np.asarray([111, 222, 111, 222, 111, 222], np.int32),
        max_new_tokens=14, uid="r"))
    eng.run()
    assert eng._ticks_since_spec == 0   # never routed a plain tick


def test_spec_engine_per_row_mixed_batch(params):
    """One echo-y row + one random row IN THE SAME BATCH: the per-row
    policy keeps speculation on (the echo row's extras alone beat the chunk
    overhead — the r3 engine-wide zero-accept counter could not see this),
    the per-row rates separate, and outputs stay exactly the plain
    engine's."""
    # two fully-forced deterministic behaviors on a zeroed kernel (a random
    # base kernel cannot host an echo row AND a drafting-proof row at tiny
    # scale): a 111<->222 cycle (prompt-lookup drafts verify forever) and a
    # strictly increasing chain t->t+1 (the suffix n-gram NEVER recurs, so
    # prompt-lookup can never draft for that row)
    p = jax.tree.map(lambda x: x, params)
    D, V = CFG.llama.hidden_size, CFG.llama.vocab_size
    emb = np.asarray(params["llama"]["embed"]["embedding"],
                     np.float32).copy()
    chain = list(range(300, 361))
    for t in [111, 222] + chain:
        emb[t] *= 64.0           # input-dominated residual stream
    kernel = np.zeros((D, V), np.float32)

    def force(src, dst):
        kernel[:, dst] = emb[src] * (5.0 / float(np.dot(emb[src], emb[src])))

    force(222, 111)
    force(111, 222)
    for t in chain[:-1]:
        force(t, t + 1)
    p["llama"]["embed"] = {"embedding": jnp.asarray(emb)}
    p["llama"]["lm_head"] = {"kernel": jnp.asarray(kernel)}
    reqs = [Request(prompt_ids=np.asarray([111, 222] * 4, np.int32),
                    max_new_tokens=24, uid="echo"),
            Request(prompt_ids=np.arange(300, 309, dtype=np.int32),
                    max_new_tokens=24, uid="chain")]

    def run(spec_k):
        eng = _engine(p, spec_k, n_slots=2, steps_per_sync=2,
                      max_new_tokens_cap=24)
        for r in reqs:
            eng.submit(Request(prompt_ids=r.prompt_ids.copy(),
                               max_new_tokens=r.max_new_tokens, uid=r.uid))
        done = _by_uid(eng.run())
        return done, eng

    plain, _ = run(0)
    spec, eng = run(4)
    _assert_same(plain, spec)
    # the echo row kept speculation paying while it was active: most of its
    # 24 tokens arrived as accepted drafts (engine-wide zero-accept counters
    # would have seen mixed evidence)
    assert eng.spec_accepted > 10
    rates = eng._row_rate
    assert rates.max() > 0.5                # the echo row drafts well
    assert rates.min() < 0.2                # the chain row never does
    # once the echo row completed, only the chain row remained and the
    # engine fell back to the plain program — per-row adaptivity in both
    # directions
    assert eng._ticks_since_spec > 0


# ---- draft-model serving ---------------------------------------------------


def _drafter(seed=11):
    from metamorph_tpu.models.llama import init_llama_params

    dcfg = LlamaConfig.tiny(vocab_size=128258)
    return init_llama_params(jax.random.PRNGKey(seed), dcfg,
                             jnp.float32), dcfg


def test_draft_engine_matches_plain_engine(params):
    """Random (uncorrelated) drafter in the engine: outputs must be exactly
    the plain engine's."""
    lens, budgets = [6, 9, 4], [10, 7, 12]
    plain = _by_uid(_run(params, 0, lens, budgets))
    eng = _engine(params, 4, draft=_drafter())
    for r in _id_reqs(0, lens, budgets):
        eng.submit(r)
    spec = _by_uid(eng.run())
    _assert_same(plain, spec)


def test_draft_engine_accepts_and_saves_ticks(params):
    """Drafter == the main llama with a forced periodic head: per-slot
    drafter caches accept across continuous-batching admissions; fewer
    scheduler ticks for the same tokens."""
    p = jax.tree.map(lambda x: x, params)
    D, V = CFG.llama.hidden_size, CFG.llama.vocab_size
    emb = np.asarray(params["llama"]["embed"]["embedding"])
    kernel = np.zeros((D, V), np.float32)
    kernel[:, 111] = emb[222] * 5
    kernel[:, 222] = emb[111] * 5
    p["llama"]["lm_head"]["kernel"] = jnp.asarray(kernel)

    def run(spec_k, draft):
        eng = _engine(p, spec_k, n_slots=1, steps_per_sync=2, draft=draft)
        eng.submit(Request(
            prompt_ids=np.asarray([111, 222, 111, 222], np.int32),
            max_new_tokens=14, uid="a"))
        eng.submit(Request(
            prompt_ids=np.asarray([222, 111, 222], np.int32),
            max_new_tokens=12, uid="b"))
        t = 0
        while eng.pending or any(u is not None for u in eng.slot_uid):
            eng.step()
            t += 1
        return t, _by_uid(eng.completed), eng.spec_accepted

    t_plain, d_plain, _ = run(0, None)
    t_spec, d_spec, accepted = run(6, (p["llama"], CFG.llama))
    _assert_same(d_plain, d_spec)
    if min(len(c.ids) for c in d_plain.values()) >= 10:
        assert accepted > 0
        assert t_spec < t_plain, (t_spec, t_plain)


def test_draft_engine_resyncs_after_losing_drafter_state(params):
    """Force the drafter fully out of sync mid-run (d_len back to 0, as after
    a fallback window or a fill admission): catch-up ticks must not count as
    zero-acceptance evidence, the drafter must resync, and the output stays
    exact with no spurious fallback on an accepting workload."""
    p = jax.tree.map(lambda x: x, params)
    D, V = CFG.llama.hidden_size, CFG.llama.vocab_size
    emb = np.asarray(params["llama"]["embed"]["embedding"])
    kernel = np.zeros((D, V), np.float32)
    kernel[:, 111] = emb[222] * 5
    kernel[:, 222] = emb[111] * 5
    p["llama"]["lm_head"]["kernel"] = jnp.asarray(kernel)

    def run(spec_k, draft, desync):
        eng = _engine(p, spec_k, n_slots=1, steps_per_sync=1, draft=draft)
        eng.submit(Request(
            prompt_ids=np.asarray([111, 222, 111, 222], np.int32),
            max_new_tokens=14, uid="r"))
        first = True
        while eng.pending or any(u is not None for u in eng.slot_uid):
            eng.step()
            if first and desync:
                eng.state = eng.state._replace(
                    d_len=jnp.zeros_like(eng.state.d_len))
                first = False
        return _by_uid(eng.completed), eng._ticks_since_spec

    plain, _ = run(0, None, False)
    spec, ticks_since_spec = run(6, (p["llama"], CFG.llama), True)
    _assert_same(plain, spec)
    assert ticks_since_spec == 0   # catch-up ticks were not misjudged


# ---- shared-prefix KV reuse -------------------------------------------------


def test_shared_prefix_engine_matches_plain(params):
    """Prefix engine (prefix KV computed once, suffix-only admission) ==
    plain engine given the identical full prompts — incl. an image in the
    suffix and a second wave of admissions reusing freed slots."""
    rng = np.random.default_rng(41)
    prefix = rng.integers(10, 1000, (11,)).astype(np.int32)
    K = CFG.mm.num_image_tokens
    D = CFG.llama.hidden_size
    img = rng.normal(size=(1, K, D)).astype(np.float32) * 0.02

    sufs = [rng.integers(10, 1000, (n,)).astype(np.int32)
            for n in (5, 9, 3, 6)]
    budgets = [8, 6, 9, 7]

    plain = ServeEngine(params, CFG, n_slots=2, max_cache_len=64,
                        max_new_tokens_cap=16, max_images=2,
                        prefill_buckets=(8, 16, 32), steps_per_sync=3)
    pref = ServeEngine(params, CFG, n_slots=2, max_cache_len=64,
                       max_new_tokens_cap=16, max_images=2,
                       prefill_buckets=(8, 16, 32), steps_per_sync=3,
                       shared_prefix_ids=prefix)
    for i, (suf, b) in enumerate(zip(sufs, budgets)):
        kw = {}
        if i == 1:  # an image inside the suffix (suffix-relative position 1)
            kw = dict(image_embeds=img.copy(),
                      image_positions=np.asarray([1]))
            # plain engine gets the same image at full-prompt position
            plain.submit(Request(
                prompt_ids=np.concatenate([prefix, suf]), max_new_tokens=b,
                uid=i, image_embeds=img.copy(),
                image_positions=np.asarray([len(prefix) + 1])))
        else:
            plain.submit(Request(prompt_ids=np.concatenate([prefix, suf]),
                                 max_new_tokens=b, uid=i))
        pref.submit(Request(prompt_ids=suf, max_new_tokens=b, uid=i, **kw))
    _assert_same(_by_uid(plain.run()), _by_uid(pref.run()))


def test_shared_prefix_with_spec_and_draft(params):
    """Prefix reuse composes with speculative decoding (both drafters)."""
    rng = np.random.default_rng(42)
    prefix = rng.integers(10, 1000, (7,)).astype(np.int32)
    sufs = [rng.integers(10, 1000, (n,)).astype(np.int32) for n in (5, 4)]

    def run(**kw):
        eng = ServeEngine(params, CFG, n_slots=2, max_cache_len=64,
                          max_new_tokens_cap=16, max_images=2,
                          prefill_buckets=(8, 16), steps_per_sync=3,
                          shared_prefix_ids=prefix, **kw)
        for i, suf in enumerate(sufs):
            eng.submit(Request(prompt_ids=suf, max_new_tokens=8, uid=i))
        return _by_uid(eng.run())

    base = run()
    _assert_same(base, run(spec_k=4))
    _assert_same(base, run(spec_k=4, draft=_drafter()))


def test_shared_prefix_rejects_embeds_requests(params):
    rng = np.random.default_rng(43)
    prefix = rng.integers(10, 1000, (4,)).astype(np.int32)
    eng = ServeEngine(params, CFG, n_slots=1, max_cache_len=64,
                      max_new_tokens_cap=8, max_images=2,
                      prefill_buckets=(8,), shared_prefix_ids=prefix)
    pe = np.zeros((4, CFG.llama.hidden_size), np.float32)
    with pytest.raises(ValueError, match="prompt_ids"):
        eng.submit(Request(prompt_embeds=pe, max_new_tokens=4, uid="x"))


def test_shared_prefix_odd_room_top_bucket(params):
    """Odd (max_cache_len - P): the appended top bucket rounds down to a
    multiple of 64 so the admission chunk width never degenerates; a suffix
    landing in that bucket still decodes exactly like the plain engine."""
    rng = np.random.default_rng(44)
    prefix = rng.integers(10, 1000, (37,)).astype(np.int32)  # room = 219
    suf = rng.integers(10, 1000, (100,)).astype(np.int32)

    plain = ServeEngine(params, CFG, n_slots=1, max_cache_len=256,
                        max_new_tokens_cap=8, max_images=2,
                        prefill_buckets=(64, 128), steps_per_sync=2)
    pref = ServeEngine(params, CFG, n_slots=1, max_cache_len=256,
                       max_new_tokens_cap=8, max_images=2,
                       prefill_buckets=(64, 128), steps_per_sync=2,
                       shared_prefix_ids=prefix)
    assert pref.prefill_buckets[-1] == 192 and \
        all(b % 64 == 0 or b < 128 for b in pref.prefill_buckets)
    plain.submit(Request(prompt_ids=np.concatenate([prefix, suf]),
                         max_new_tokens=6, uid="x"))
    pref.submit(Request(prompt_ids=suf, max_new_tokens=6, uid="x"))
    a, b = plain.run()[0], pref.run()[0]
    np.testing.assert_array_equal(a.ids, b.ids)


def test_shared_prefix_rejects_fill_chunk(params):
    with pytest.raises(ValueError, match="fill_chunk"):
        ServeEngine(params, CFG, n_slots=1, max_cache_len=64,
                    max_new_tokens_cap=8, prefill_buckets=(8,),
                    fill_chunk=8,
                    shared_prefix_ids=np.asarray([5, 6, 7], np.int32))
