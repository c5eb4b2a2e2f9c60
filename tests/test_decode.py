"""Decode tests: KV-cache state-machine decode == reference-style
full-recompute decode (emulated per `metamorph_llama.py:502-597`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig)
from metamorph_tpu.constants import (IM_END_TOKEN_ID, IM_START_TOKEN_ID,
                                     LLAMA3_EOS_IDS)
from metamorph_tpu.models import llama as L
from metamorph_tpu.models import metamorph as M
from metamorph_tpu.inference.decode import greedy_decode, _project_pred

CFG = MetaMorphConfig(
    llama=LlamaConfig.tiny(vocab_size=128258),
    siglip=SiglipConfig.tiny(),
    mm=MultimodalConfig(num_image_tokens=3),
    train=TrainConfig(max_seq_len=64),
)
K = CFG.mm.num_image_tokens


@pytest.fixture(scope="module")
def params():
    return M.init_metamorph_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)


def reference_decode(params, prompt_embeds, max_new):
    """Direct emulation of the reference greedy loop: full-sequence recompute
    each token, decoding-flag hidden replacement, same branch order."""
    embeds = prompt_embeds
    in_image, count = False, 0
    ids, img_embeds = [], []
    steps = 0
    while True:
        T = embeds.shape[1]
        pos = jnp.arange(T, dtype=jnp.int32)[None]
        hidden = L.llama_forward(params["llama"], CFG.llama, embeds, pos,
                                 jnp.ones((1, T), jnp.int32))
        h_last = hidden[:, -1]
        pred_z = M.apply_vision_head(params, CFG, h_last)
        prediction = _project_pred(params, CFG, pred_z)
        logits = L.lm_head(params["llama"], CFG.llama, h_last)
        tok = int(jnp.argmax(logits, axis=-1)[0])
        tok_embed = L.embed_tokens(params["llama"], jnp.asarray([tok]))

        if (not in_image) and tok == IM_START_TOKEN_ID:
            in_image = True
            ids.append(tok)
            nxt = tok_embed
        elif in_image and count < K:
            count += 1
            img_embeds.append(np.asarray(pred_z[0]))
            nxt = prediction
            if count == K:
                in_image = False
        elif tok == IM_END_TOKEN_ID:
            in_image = False
            count = 0
            ids.append(tok)
            nxt = tok_embed
        else:
            ids.append(tok)
            nxt = tok_embed
        steps += 1
        if tok in LLAMA3_EOS_IDS or steps >= max_new:
            break
        embeds = jnp.concatenate([embeds, nxt[None]], axis=1)
    return ids, img_embeds


def test_kv_decode_matches_full_recompute(params):
    rng = np.random.default_rng(0)
    prompt_ids = jnp.asarray(rng.integers(10, 1000, (1, 6)).astype(np.int32))
    prompt = L.embed_tokens(params["llama"], prompt_ids)
    max_new = 12

    ref_ids, ref_imgs = reference_decode(params, prompt, max_new)
    out = greedy_decode(params, CFG, prompt, max_new_tokens=max_new, max_images=2)

    n = int(out["n_ids"])
    got_ids = [int(x) for x in np.asarray(out["ids"][:n])]
    assert got_ids == ref_ids
    assert int(out["n_image_tokens"]) == len(ref_imgs)
    for i, ref in enumerate(ref_imgs):
        np.testing.assert_allclose(np.asarray(out["image_embeds"][i]), ref,
                                   rtol=1e-4, atol=1e-4)


def test_image_mode_emission(params):
    """Force the model into image mode by seeding the prompt with hidden states
    that argmax to <image_start>: instead, directly verify the machine by
    patching lm_head bias-free behavior — here we simply run long enough and
    check invariants (ids never contain more than recorded, buffers bounded)."""
    rng = np.random.default_rng(1)
    prompt_ids = jnp.asarray(rng.integers(10, 1000, (1, 4)).astype(np.int32))
    prompt = L.embed_tokens(params["llama"], prompt_ids)
    out = greedy_decode(params, CFG, prompt, max_new_tokens=8, max_images=1)
    assert int(out["n_ids"]) <= 8
    assert int(out["n_image_tokens"]) <= K


def test_forced_image_mode(params):
    """Craft params so the model deterministically emits <image_start> first:
    overwrite lm_head to constant logits favoring <image_start>, then eos after
    image completes. Validates enter-emit-exit transitions with the KV path."""
    p = jax.tree.map(lambda x: x, params)  # shallow copy
    D, V = CFG.llama.hidden_size, CFG.llama.vocab_size
    # lm_head that always prefers <image_start>
    kernel = np.zeros((D, V), np.float32)
    kernel[:, IM_START_TOKEN_ID] = 1.0  # h sums positive? not guaranteed…
    # make it h-independent: zero kernel + bias trick is unavailable (no bias),
    # so use a rank-1 kernel on a constant direction: logits = (h@1)*e_start.
    # Instead simpler: kernel[:, start] = 0 except large constant via embed norm
    # — use abs trick: set every column tiny except start column large times
    # sum(h). sum(h) can be negative; use both start and eos candidates.
    kernel[:, IM_START_TOKEN_ID] = 10.0
    kernel[:, LLAMA3_EOS_IDS[0]] = -10.0
    p["llama"]["lm_head"]["kernel"] = jnp.asarray(kernel)

    rng = np.random.default_rng(2)
    prompt = L.embed_tokens(p["llama"], jnp.asarray(rng.integers(10, 1000, (1, 4)).astype(np.int32)))
    ref_ids, ref_imgs = reference_decode(p, prompt, 10)
    out = greedy_decode(p, CFG, prompt, max_new_tokens=10, max_images=2)
    n = int(out["n_ids"])
    assert [int(x) for x in np.asarray(out["ids"][:n])] == ref_ids
    assert int(out["n_image_tokens"]) == len(ref_imgs)
    # the machine must have emitted exactly K continuous tokens per image cycle
    assert len(ref_imgs) % K == 0


def test_sampling_decode(params):
    """do_sample with temperature/top_p runs and differs across seeds; at
    near-zero temperature it reproduces greedy."""
    rng = np.random.default_rng(3)
    prompt = L.embed_tokens(params["llama"],
                            jnp.asarray(rng.integers(10, 1000, (1, 4)), jnp.int32))
    greedy = greedy_decode(params, CFG, prompt, max_new_tokens=8, max_images=1)
    cold = greedy_decode(params, CFG, prompt, max_new_tokens=8, max_images=1,
                         do_sample=True, temperature=1e-4,
                         sample_rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(greedy["ids"]), np.asarray(cold["ids"]))

    hot1 = greedy_decode(params, CFG, prompt, max_new_tokens=8, max_images=1,
                         do_sample=True, temperature=2.0, top_p=0.9,
                         sample_rng=jax.random.PRNGKey(1))
    hot2 = greedy_decode(params, CFG, prompt, max_new_tokens=8, max_images=1,
                         do_sample=True, temperature=2.0, top_p=0.9,
                         sample_rng=jax.random.PRNGKey(2))
    assert int(hot1["n_ids"]) > 0
    assert not np.array_equal(np.asarray(hot1["ids"]), np.asarray(hot2["ids"]))


def test_batched_decode_matches_per_row(params):
    """batched_greedy_decode over left-padded prompts of unequal lengths ==
    per-row greedy_decode (ids, counts, image buffers)."""
    from metamorph_tpu.inference.decode import batched_greedy_decode

    rng = np.random.default_rng(5)
    lens = [3, 6, 4]
    B, T0 = len(lens), max(lens)
    max_new = 8
    rows = [jnp.asarray(rng.integers(10, 1000, (1, n)), jnp.int32) for n in lens]

    # per-row references (unpadded, B=1 path)
    refs = [greedy_decode(params, CFG, L.embed_tokens(params["llama"], r),
                          max_new_tokens=max_new, max_images=1) for r in rows]

    # left-padded batch
    embeds = jnp.zeros((B, T0, CFG.llama.hidden_size),
                       L.embed_tokens(params["llama"], rows[0]).dtype)
    mask = np.zeros((B, T0), np.int32)
    for b, (r, n) in enumerate(zip(rows, lens)):
        e = L.embed_tokens(params["llama"], r)[0]
        embeds = embeds.at[b, T0 - n:].set(e)
        mask[b, T0 - n:] = 1
    out = batched_greedy_decode(params, CFG, embeds, jnp.asarray(mask),
                                max_new_tokens=max_new, max_images=1)

    for b, ref in enumerate(refs):
        n_ref = int(ref["n_ids"])
        n_got = int(out["n_ids"][b])
        assert n_got == n_ref, (b, n_got, n_ref)
        np.testing.assert_array_equal(np.asarray(out["ids"][b][:n_got]),
                                      np.asarray(ref["ids"][:n_ref]))
        assert int(out["n_image_tokens"][b]) == int(ref["n_image_tokens"])
        n_img = int(ref["n_image_tokens"])
        if n_img:
            np.testing.assert_allclose(
                np.asarray(out["image_embeds"][b][:n_img]),
                np.asarray(ref["image_embeds"][:n_img]), rtol=1e-4, atol=1e-4)


def test_batched_decode_forced_image_mode(params):
    """Batched path reproduces the enter-emit-exit image state machine."""
    from metamorph_tpu.inference.decode import batched_greedy_decode

    p = jax.tree.map(lambda x: x, params)
    D, V = CFG.llama.hidden_size, CFG.llama.vocab_size
    kernel = np.zeros((D, V), np.float32)
    kernel[:, IM_START_TOKEN_ID] = 10.0
    kernel[:, LLAMA3_EOS_IDS[0]] = -10.0
    p["llama"]["lm_head"]["kernel"] = jnp.asarray(kernel)

    rng = np.random.default_rng(6)
    rows = [jnp.asarray(rng.integers(10, 1000, (1, n)), jnp.int32)
            for n in (4, 2)]
    refs = [greedy_decode(p, CFG, L.embed_tokens(p["llama"], r),
                          max_new_tokens=10, max_images=2) for r in rows]
    T0 = 4
    embeds = jnp.zeros((2, T0, D), jnp.float32)
    mask = np.zeros((2, T0), np.int32)
    for b, (r, n) in enumerate(zip(rows, (4, 2))):
        embeds = embeds.at[b, T0 - n:].set(L.embed_tokens(p["llama"], r)[0])
        mask[b, T0 - n:] = 1
    out = batched_greedy_decode(p, CFG, embeds, jnp.asarray(mask),
                                max_new_tokens=10, max_images=2)
    for b, ref in enumerate(refs):
        assert int(out["n_image_tokens"][b]) == int(ref["n_image_tokens"])
        n = int(ref["n_ids"])
        np.testing.assert_array_equal(np.asarray(out["ids"][b][:n]),
                                      np.asarray(ref["ids"][:n]))


def test_flash_prefill_matches_xla(params):
    """greedy_decode(prefill_attn_impl='flash') produces the same generation
    as the XLA prefill path."""
    rng = np.random.default_rng(8)
    prompt_ids = jnp.asarray(rng.integers(10, 1000, (1, 8)), jnp.int32)
    prompt = L.embed_tokens(params["llama"], prompt_ids)
    a = greedy_decode(params, CFG, prompt, max_new_tokens=6, max_images=1)
    b = greedy_decode(params, CFG, prompt, max_new_tokens=6, max_images=1,
                      prefill_attn_impl="flash")
    np.testing.assert_array_equal(np.asarray(a["ids"]), np.asarray(b["ids"]))
    np.testing.assert_allclose(np.asarray(a["image_embeds"]),
                               np.asarray(b["image_embeds"]), rtol=2e-4,
                               atol=2e-4)


def test_sharded_batched_decode_matches_single_device(params):
    """Multi-chip serving: batched decode with fsdp x tensor sharded params
    (how an 8B that does not fit one chip is served) == unsharded decode,
    bitwise on token ids. GSPMD propagates the param shardings through the
    unrolled decode step; the KV cache shards its head dim over tensor."""
    from metamorph_tpu.config import MeshConfig
    from metamorph_tpu.inference.decode import batched_greedy_decode
    from metamorph_tpu.parallel.context import set_current_mesh
    from metamorph_tpu.parallel.mesh import build_mesh
    from metamorph_tpu.parallel.sharding import shard_params

    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(10, 1000, (4, 6)).astype(np.int32))
    prompt = L.embed_tokens(params["llama"], ids)
    mask = jnp.ones((4, 6), jnp.int32)

    ref = batched_greedy_decode(params, CFG, prompt, mask, max_new_tokens=8,
                                max_images=2)
    mesh = build_mesh(MeshConfig(data=1, fsdp=4, tensor=2))
    sp = shard_params(params, mesh)
    set_current_mesh(mesh)
    try:
        out = batched_greedy_decode(sp, CFG, prompt, mask, max_new_tokens=8,
                                    max_images=2)
    finally:
        set_current_mesh(None)
    np.testing.assert_array_equal(np.asarray(ref["ids"]), np.asarray(out["ids"]))
    np.testing.assert_allclose(np.asarray(ref["image_embeds"]),
                               np.asarray(out["image_embeds"]),
                               rtol=1e-4, atol=1e-5)


def test_batched_flash_prefill_rejects_padded_batch(params):
    """prefill_attn_impl='flash' assumes right-padded length masking, but
    batched_greedy_decode LEFT-pads — a padded batch must be rejected loudly
    instead of silently prefilling with wrong attention."""
    from metamorph_tpu.inference.decode import batched_greedy_decode

    D = CFG.llama.hidden_size
    embeds = jnp.zeros((2, 8, D), jnp.float32)
    mask = jnp.asarray([[0, 0, 1, 1, 1, 1, 1, 1],
                        [1, 1, 1, 1, 1, 1, 1, 1]], jnp.int32)
    with pytest.raises(ValueError):
        batched_greedy_decode(params, CFG, embeds, mask, max_new_tokens=2,
                              prefill_attn_impl="flash")
