"""Benchmark: interleaved multimodal train-step throughput on one TPU chip.

Measures the full fused pipeline per optimizer step — SigLIP encode of the
batch's images, projector, static splice, LLaMA forward+backward with the dual
loss (text CE + visual-AR cosine), AdamW update — and reports packed
tokens/sec/chip. Prints ONE JSON line.

The north-star metric (BASELINE.md) is >=3000 interleaved tokens/sec/chip at 8B
on v5p. This harness auto-sizes the LLM to the local chip's HBM (a v5e-16GB
dev chip can't hold 8B + Adam states) and reports, alongside raw tok/s/chip:
  * MFU (analytic model FLOPs/step vs the chip's bf16 peak), and
  * when the model is not 8B, a projected 8B tok/s/chip derived from the
    measured MFU through the 8B-recipe FLOPs/token — vs_baseline then refers
    to that projection and the metric string says so explicitly.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def salt_base():
    """Per-run salt base in [0, 8.9) from real entropy.

    The remote-TPU runtime caches results of identical (executable, inputs)
    executions ACROSS processes; timed inputs are offset by
    (salt_base() + 1 + i) so no two runs serve byte-identical inputs. A
    pid-derived base is 0.1-spaced while rep offsets are integers, which
    lets runs whose bases differ by an exact integer overlap — urandom
    makes the base effectively continuous (traced input value, so it costs
    no recompiles). Bounded < 8.9 so downstream *1e-3 offsets stay <=
    ~0.012 and the echo regime's forced margins hold.
    """
    return int.from_bytes(os.urandom(4), "little") / 2**32 * 8.9


def build_cfg():
    from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                      MultimodalConfig, TrainConfig)

    size = os.environ.get("BENCH_MODEL_SIZE", "auto")
    if size == "auto":
        import jax
        try:
            mem = jax.devices()[0].memory_stats().get("bytes_limit", 16 << 30)
        except Exception:
            mem = 16 << 30
        size = "8b" if mem > 80 << 30 else "600m"

    if size == "8b":
        llama = LlamaConfig()  # 8B
        batch, seqlen = 8, 4096
    elif size == "1b":
        llama = LlamaConfig(vocab_size=128258, hidden_size=2048,
                            intermediate_size=8192, num_layers=16,
                            num_heads=16, num_kv_heads=8, head_dim=128,
                            rope_scaling=False)
        batch, seqlen = 4, 2048
    else:  # 600m — fits one 16GB chip with Adam states
        llama = LlamaConfig(vocab_size=128258, hidden_size=1280,
                            intermediate_size=5120, num_layers=12,
                            num_heads=10, num_kv_heads=5, head_dim=128,
                            rope_scaling=False)
        batch, seqlen = 4, 2048

    batch = int(os.environ.get("BENCH_BATCH", batch))
    seqlen = int(os.environ.get("BENCH_SEQLEN", seqlen))
    cfg = MetaMorphConfig(
        llama=llama,
        siglip=SiglipConfig(),  # real SO400M tower, frozen
        mm=MultimodalConfig(num_image_tokens=64),
        train=TrainConfig(max_seq_len=seqlen, batch_size=batch,
                          max_images_per_batch=2 * batch,
                          # BENCH_REMAT=off disables checkpointing entirely
                          # (XLA keeps whatever the backward needs)
                          remat=os.environ.get("BENCH_REMAT") != "off",
                          remat_policy=os.environ.get("BENCH_REMAT",
                                                      "dots_no_batch"),
                          ce_chunk=int(os.environ.get("BENCH_CE_CHUNK", 512)),
                          total_steps=1000, learning_rate=1e-5,
                          offload_optimizer=bool(int(os.environ.get("BENCH_OFFLOAD", "0")))),
    )
    return cfg, size


PEAK_BF16_TFLOPS = {
    # per-chip dense bf16 peak (public spec sheets)
    "TPU v5 lite": 197.0, "TPU v5e": 197.0,
    "TPU v5": 459.0, "TPU v5p": 459.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0, "TPU v6e": 918.0,
    "TPU v3": 123.0,
}

HBM_GBPS = {
    # per-chip HBM bandwidth (public spec sheets)
    "TPU v5 lite": 819.0, "TPU v5e": 819.0,
    "TPU v5": 2765.0, "TPU v5p": 2765.0,
    "TPU v4": 1228.0,
    "TPU v6 lite": 1640.0, "TPU v6e": 1640.0,
    "TPU v3": 900.0,
}


def hbm_gbps_this_chip():
    import jax

    kind = jax.devices()[0].device_kind
    for name, bw in HBM_GBPS.items():
        if kind.startswith(name):
            return bw
    return 819.0


def chip_peak_tflops():
    import jax

    if os.environ.get("BENCH_PEAK_TFLOPS"):
        return float(os.environ["BENCH_PEAK_TFLOPS"])
    kind = jax.devices()[0].device_kind
    for name, peak in PEAK_BF16_TFLOPS.items():
        if kind.startswith(name):
            return peak
    return None


def train_step_flops(cfg, n_images: int) -> float:
    """Model FLOPs per optimizer step (MFU convention: 6*params*tokens for
    trained matmuls, 2x for frozen forward-only, causal attention scores at
    half the full quadratic) — remat recompute is intentionally NOT counted."""
    B, T = cfg.train.batch_size, cfg.train.max_seq_len
    l, s = cfg.llama, cfg.siglip
    D, F, Dh = l.hidden_size, l.intermediate_size, l.head_dim
    H, KV, L = l.num_heads, l.num_kv_heads, l.num_layers
    dec = L * (D * H * Dh + 2 * D * KV * Dh + H * Dh * D + 3 * D * F)
    flops = 6.0 * B * T * dec
    flops += 6.0 * B * T * D * l.vocab_size            # lm_head + chunked CE
    flops += 6.0 * B * H * T * T * Dh * L * 0.5        # causal attn scores
    # SigLIP tower: frozen (stop-gradient), forward only, 729 patch tokens/img
    Ds, Fs, Ls = s.hidden_size, s.intermediate_size, s.num_layers
    sig = Ls * (4 * Ds * Ds + 2 * Ds * Fs) + (s.patch_size ** 2 * 3 * Ds)
    flops += 2.0 * n_images * s.num_patches * sig
    # connector (fwd+bwd on image tokens) + vision head (fwd+bwd on B*T)
    K = cfg.mm.num_image_tokens
    proj = Ds * D + D * D
    flops += 6.0 * n_images * K * proj
    head = D * D + D * Ds
    flops += 6.0 * B * T * head
    return flops


def build_batch(cfg):
    """Interleaved ImageQA+generation style rows: a prompt image, QA text, and
    an answer image (AR-supervised) per sample — BASELINE config 2/4 shape."""
    import jax.numpy as jnp

    from metamorph_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX, IM_START_TOKEN_ID
    from metamorph_tpu.multimodal.packing import pack_sequences, batch_to_arrays

    rng = np.random.default_rng(0)
    B, T, K = cfg.train.batch_size, cfg.train.max_seq_len, cfg.mm.num_image_tokens
    ids, labs = [], []
    for b in range(B):
        n_text = T - 2 * K - 8  # fill the context
        text = rng.integers(10, 100000, n_text).tolist()
        row = ([128000] + text[: n_text // 2] + [IMAGE_TOKEN_INDEX]
               + text[n_text // 2:] + [IM_START_TOKEN_ID, IMAGE_TOKEN_INDEX,
                                       128257, 128009])
        lab = ([IGNORE_INDEX] * (1 + n_text // 2) + [IGNORE_INDEX]
               + text[n_text // 2:] + [IM_START_TOKEN_ID, 0, 128257, 128009])
        ids.append(row)
        labs.append(lab)
    packed = pack_sequences(ids, labs, K, T, 2 * B)
    batch = {k: jnp.asarray(v) for k, v in batch_to_arrays(packed).items()}
    S = cfg.siglip.image_size
    pixels = jnp.asarray(rng.normal(size=(2 * B, S, S, 3)).astype(np.float32))
    return batch, pixels


def reference_recompute_tok_s(params, cfg, mean_T: int) -> float:
    """Measured reference-decode rate: the reference generates each token
    with a FULL forward over the growing sequence (use_cache=False,
    `metamorph_llama.py:510,526-535`), so its per-token cost at mean
    generation-window length Tm is one Tm-long forward + lm_head on the last
    position. Time that forward on this chip and invert — replaces the old
    hardcoded '~10 tok/s class' constant with a measurement."""
    import jax
    import jax.numpy as jnp

    from metamorph_tpu.models import llama as L

    Tm = max(int(mean_T), 8)
    D = cfg.llama.hidden_size

    @jax.jit
    def fwd(p, x):
        pos = jnp.arange(Tm, dtype=jnp.int32)[None]
        h = L.llama_forward(p, cfg.llama, x, pos,
                            jnp.ones((1, Tm), jnp.int32))
        return L.lm_head(p, cfg.llama, h[:, -1:]).sum()

    x = jnp.zeros((1, Tm, D), jnp.bfloat16)
    float(fwd(params["llama"], x))  # compile
    # short-T forwards are sub-ms: 3 reps was dominated by per-call dispatch
    # jitter over the remote tunnel (observed +-30% run-to-run); 12 reps
    # with a warm first call stabilizes the baseline
    reps = 12
    s0 = salt_base()  # cross-process result-cache defeat
    float(fwd(params["llama"], x + jnp.bfloat16(s0 * 1e-3)))  # warm dispatch
    t0 = time.time()
    for i in range(reps):
        float(fwd(params["llama"], x + jnp.bfloat16((s0 + 1 + i) * 1e-3)))
    t_fwd = (time.time() - t0) / reps
    return 1.0 / t_fwd


def bench_decode(cfg, size):
    """KV-cache greedy decode tokens/sec (the reference recomputes the full
    sequence per token — use_cache=False, metamorph_llama.py:510).
    BENCH_DECODE_BATCH>1 measures the batched serving path (left-padded)."""
    import jax
    import jax.numpy as jnp

    from metamorph_tpu.inference.decode import (batched_greedy_decode,
                                                greedy_decode)
    from metamorph_tpu.models import llama as L
    from metamorph_tpu.models.metamorph import init_metamorph_params

    params = init_metamorph_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params_ref = params  # baseline is ALWAYS the bf16 full-recompute loop
    quant = bool(int(os.environ.get("BENCH_DECODE_QUANT", "0")))
    kv_int8 = bool(int(os.environ.get("BENCH_KV_INT8", "0")))
    if quant:
        from metamorph_tpu.ops.quant import quantize_llama_decode

        params = dict(params)
        params["llama"] = quantize_llama_decode(params["llama"])
    rng = np.random.default_rng(0)
    T0 = int(os.environ.get("BENCH_DECODE_T0", 256))
    NEW = int(os.environ.get("BENCH_DECODE_NEW", 128))
    B = int(os.environ.get("BENCH_DECODE_BATCH", 1))
    prompt_ids = jnp.asarray(rng.integers(10, 100000, (B, T0)).astype(np.int32))
    prompt = L.embed_tokens(params["llama"], prompt_ids)

    # the decode kernel pays off once cache attention traffic matters
    S_cache = T0 + NEW + 8
    attn = os.environ.get(
        "BENCH_DECODE_ATTN",
        "pallas" if jax.default_backend() == "tpu" and S_cache >= 1024
        else "xla")

    def run(i, new):
        # i salts the prompt: the remote-TPU runtime caches results of
        # identical (executable, inputs) executions
        p = prompt + jnp.bfloat16(i * 1e-3)
        if B > 1:
            mask = jnp.ones((B, T0), jnp.int32)
            out = batched_greedy_decode(params, cfg, p, mask,
                                        max_new_tokens=new, max_images=1,
                                        attn_impl=attn, kv_int8=kv_int8)
        else:
            out = greedy_decode(params, cfg, p, max_new_tokens=new,
                                max_images=1, attn_impl=attn,
                                kv_int8=kv_int8)
        jax.block_until_ready(out["ids"])
        return out

    t0 = time.time()
    out = run(0, NEW)
    log(f"decode compile: {time.time()-t0:.1f}s steps={int(out['steps'])}")
    run(0, 1)  # compile the prefill-only variant

    n_rep = 3
    # per-process salt base (see bench_spec_decode: the remote runtime's
    # result cache hits across processes on identical inputs)
    s0 = salt_base()
    # prefill-only timing (TTFT), then full runs; decode rate = difference
    t0 = time.time()
    for i in range(n_rep):
        run(s0 + 1 + i, 1)
    t_prefill = (time.time() - t0) / n_rep
    t0 = time.time()
    total_steps = 0
    for i in range(n_rep):
        out = run(s0 + 100 + i, NEW)
        total_steps += (int(out["steps"]) - 1) * B
    t_full = (time.time() - t0) / n_rep
    tok_s = total_steps / max(n_rep * (t_full - t_prefill), 1e-9)
    ref_tok_s = reference_recompute_tok_s(params_ref, cfg, T0 + NEW // 2)
    label = f"greedy decode new tokens/sec ({size} LLM, KV cache" + (
        ", int8 weights" if quant else "") + (
        ", int8 KV" if kv_int8 else "") + (
        f", batch={B}, T0={T0})" if B > 1 else f", T0={T0})")
    print(json.dumps({
        "metric": label + f"; prefill (TTFT) reported separately; "
                  f"vs_baseline = speedup over the reference's measured "
                  f"full-recompute-per-token loop on this chip",
        "value": round(tok_s, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(tok_s / ref_tok_s, 2),
        "reference_recompute_tok_s": round(ref_tok_s, 1),
        "prefill_ms": round(t_prefill * 1e3, 1),
        "attn_impl": attn,
    }))


def bench_spec_decode(cfg, size):
    """Speculative decode (prompt-lookup drafting + chunk verification,
    inference/spec_decode.py): B=1 tok/s in two regimes on this chip.

    (a) random-weight model: ~zero accept — measures the chunk-step
        overhead vs plain greedy (the worst case).
    (b) periodic-output crafted model (lm_head columns chained through the
        embedding table, so the stream provably cycles with LARGE logit
        margins): prompt-lookup drafts verify for real — the echo-heavy
        regime (VQA answers / readback) where spec decode pays.
    A random-weight model can NOT fairly measure acceptance: its 128k
    logits are dense near-ties, and bf16 reduction-order differences
    between the chunk and single-token compilations flip argmax, so drafts
    never verify. Real checkpoints have decisive margins (regime b)."""
    import jax
    import jax.numpy as jnp

    from metamorph_tpu.inference.decode import greedy_decode
    from metamorph_tpu.inference.spec_decode import greedy_decode_spec
    from metamorph_tpu.models import llama as L
    from metamorph_tpu.models.metamorph import init_metamorph_params

    params = init_metamorph_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if bool(int(os.environ.get("BENCH_DECODE_QUANT", "0"))):
        from metamorph_tpu.ops.quant import quantize_llama_decode

        params = dict(params)
        params["llama"] = quantize_llama_decode(params["llama"])
    kv_int8 = bool(int(os.environ.get("BENCH_KV_INT8", "0")))
    rng = np.random.default_rng(0)
    T0 = int(os.environ.get("BENCH_DECODE_T0", 256))
    NEW = int(os.environ.get("BENCH_DECODE_NEW", 128))
    SPEC_K = int(os.environ.get("BENCH_SPEC_K", 8))
    S_cache = T0 + NEW + SPEC_K + 8
    attn = os.environ.get(
        "BENCH_DECODE_ATTN",
        "pallas" if jax.default_backend() == "tpu" and S_cache >= 1024
        else "xla")
    common = dict(max_new_tokens=NEW, max_images=1, attn_impl=attn,
                  kv_int8=kv_int8)

    B = int(os.environ.get("BENCH_DECODE_BATCH", 1))

    # per-process salt base: the remote-TPU runtime caches results of
    # identical (executable, inputs) executions ACROSS processes, so fixed
    # salts can replay a previous invocation's results at ~0 ms and inflate
    # tok/s. Offsets stay <= ~0.012 so the echo regime's forced margins hold.
    salt0 = salt_base()

    def timed(fn, reps=3):
        out = fn(salt0)
        jax.block_until_ready(out["ids"])   # compile
        t0 = time.time()
        tot = 0
        last = out
        for i in range(reps):
            last = fn(salt0 + 1 + i)
            jax.block_until_ready(last["ids"])
            tot += int(np.sum(last["steps"])) * (
                B if np.ndim(last["steps"]) == 0 else 1)
        return tot / (time.time() - t0), last

    if B > 1:
        # batched: equal-length unpadded rows (starts=0 -> the Pallas chunk
        # path's contract holds); spec amortizes the per-row cache read too
        from metamorph_tpu.inference.decode import batched_greedy_decode
        from metamorph_tpu.inference.spec_decode import \
            batched_greedy_decode_spec
        mask = jnp.ones((B, T0), jnp.int32)

        def greedy_fn(p, pe, _ids):
            return lambda i: batched_greedy_decode(
                p, cfg, pe + jnp.bfloat16(i * 1e-3), mask, **common)

        def spec_fn(p, pe, ids2):
            return lambda i: batched_greedy_decode_spec(
                p, cfg, pe + jnp.bfloat16(i * 1e-3), mask, ids2,
                spec_k=SPEC_K, **common)

        ids_np = rng.integers(10, 100000, (B, T0)).astype(np.int32)
    else:
        def greedy_fn(p, pe, _ids):
            return lambda i: greedy_decode(
                p, cfg, pe + jnp.bfloat16(i * 1e-3), **common)

        def spec_fn(p, pe, ids2):
            return lambda i: greedy_decode_spec(
                p, cfg, pe + jnp.bfloat16(i * 1e-3), ids2[0],
                spec_k=SPEC_K, **common)

        ids_np = rng.integers(10, 100000, (1, T0)).astype(np.int32)

    # BENCH_SPEC_REGIMES limits the compile surface on a cold/flaky remote
    # compile service: "all" | "echo" (skip the random-model pair) |
    # "echo_nodraft" (also skip the draft-model ceiling)
    regimes = os.environ.get("BENCH_SPEC_REGIMES", "all")

    # regime (a): random weights
    ids = jnp.asarray(ids_np)
    prompt = L.embed_tokens(params["llama"], ids)
    greedy_tok_s = ngram_tok_s = None
    if regimes == "all":
        greedy_tok_s, _ = timed(greedy_fn(params, prompt, ids))
        ngram_tok_s, _ = timed(spec_fn(params, prompt, ids))

    # regime (b): crafted periodic model — the cycle tokens' embedding rows
    # are scaled 64x so the residual stream at those positions is dominated
    # by the input embedding (a random transformer does NOT otherwise keep
    # its final hidden aligned with the input embedding — measured: the
    # un-scaled crafting drops cycle tokens and acceptance collapses), and
    # the lm_head column of t_{j+1} is the (normalized) embedding row of t_j
    # — so the greedy stream provably cycles with decisive margins.
    cycle = [111, 222, 333, 444]
    emb = np.asarray(params["llama"]["embed"]["embedding"], np.float32).copy()
    for t in cycle:
        emb[t] *= 64.0
    D, V = cfg.llama.hidden_size, cfg.llama.vocab_size
    kernel = np.zeros((D, V), np.float32)
    for j, t in enumerate(cycle):
        kernel[:, cycle[(j + 1) % len(cycle)]] += emb[t] * (
            5.0 / max(1.0, float(np.dot(emb[t], emb[t]))))
    p_echo = dict(params)
    p_echo["llama"] = dict(params["llama"])
    p_echo["llama"]["embed"] = {"embedding": jnp.asarray(emb, jnp.bfloat16)}
    p_echo["llama"]["lm_head"] = {"kernel": jnp.asarray(kernel, jnp.bfloat16)}
    e_row = (cycle * (T0 // len(cycle) + 1))[:T0]
    # stagger rows so batched rows cycle at different phases
    e_ids_np = np.stack([np.roll(np.asarray(e_row, np.int32), b)
                         for b in range(max(B, 1))])
    e_ids = jnp.asarray(e_ids_np)
    e_prompt = L.embed_tokens(p_echo["llama"], e_ids)
    echo_greedy_tok_s, _ = timed(greedy_fn(p_echo, e_prompt, e_ids))
    echo_spec_tok_s, out_e = timed(spec_fn(p_echo, e_prompt, e_ids))
    accept = float(np.mean(np.asarray(out_e["steps"]))) \
        / max(int(out_e["iters"]), 1)

    # regime (c), B=1 only: draft-MODEL speculation ceiling — a small random
    # drafter given the same periodic forced head (built over ITS embedding
    # table) agrees with the main model on every token, so this measures the
    # real cost structure (drafter steps + chunk verify) at full acceptance
    draft_tok_s = None
    if B == 1 and regimes != "echo_nodraft":
        from metamorph_tpu.config import LlamaConfig
        from metamorph_tpu.inference.spec_decode import \
            greedy_decode_spec_draft_model
        from metamorph_tpu.models.llama import init_llama_params

        dcfg = LlamaConfig(vocab_size=cfg.llama.vocab_size, hidden_size=512,
                           intermediate_size=2048, num_layers=4, num_heads=8,
                           num_kv_heads=4, head_dim=64, rope_scaling=False)
        dparams = init_llama_params(jax.random.PRNGKey(1), dcfg,
                                    jnp.bfloat16)
        demb = np.asarray(dparams["embed"]["embedding"], np.float32).copy()
        for t in cycle:
            demb[t] *= 64.0
        dk = np.zeros((dcfg.hidden_size, V), np.float32)
        for j, t in enumerate(cycle):
            dk[:, cycle[(j + 1) % len(cycle)]] += demb[t] * (
                5.0 / max(1.0, float(np.dot(demb[t], demb[t]))))
        dparams = dict(dparams)
        dparams["embed"] = {"embedding": jnp.asarray(demb, jnp.bfloat16)}
        dparams["lm_head"] = {"kernel": jnp.asarray(dk, jnp.bfloat16)}
        draft_tok_s, _ = timed(lambda i: greedy_decode_spec_draft_model(
            p_echo, dparams, cfg, dcfg,
            e_prompt + jnp.bfloat16(i * 1e-3), e_ids[0],
            spec_k=SPEC_K, **common))

    print(json.dumps({
        "metric": (f"speculative B={B} decode tok/s ({size} LLM, T0={T0}, "
                   f"spec_k={SPEC_K}; echo regime = periodic-output model "
                   f"where prompt-lookup drafts verify, the workload spec "
                   f"decode targets); vs_baseline = echo-regime speedup "
                   f"over plain greedy on the same model"),
        "value": round(echo_spec_tok_s, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(echo_spec_tok_s / echo_greedy_tok_s, 3),
        "echo_greedy_tok_s": round(echo_greedy_tok_s, 1),
        "echo_tokens_per_chunk_step": round(accept, 2),
        **({"random_model_greedy_tok_s": round(greedy_tok_s, 1),
            "random_model_ngram_tok_s": round(ngram_tok_s, 1)}
           if greedy_tok_s is not None else {}),
        "attn_impl": attn,
        **({"echo_draft_model_tok_s": round(draft_tok_s, 1)}
           if draft_tok_s is not None else {}),
    }))


def bench_decode_decomp(cfg, size):
    """B=1 per-token cost decomposition: bare decode_step / +lm_head+embed /
    the full greedy loop (state machine included). Quantifies how much of the
    per-token budget the non-math plumbing costs (round-2: ~0.27 ms)."""
    import jax
    import jax.numpy as jnp

    from metamorph_tpu.inference.decode import greedy_decode
    from metamorph_tpu.models import llama as L
    from metamorph_tpu.models.metamorph import init_metamorph_params

    params = init_metamorph_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    if bool(int(os.environ.get("BENCH_DECODE_QUANT", "1"))):
        from metamorph_tpu.ops.quant import quantize_llama_decode

        params = dict(params)
        params["llama"] = quantize_llama_decode(params["llama"])
    T0, NEW = 256, 128
    S = T0 + NEW + 8
    D = cfg.llama.hidden_size
    attn = "pallas" if jax.default_backend() == "tpu" and S >= 1024 else "xla"
    steps = 128

    s0 = salt_base()  # cross-process result-cache defeat

    def timed(fn, p, x0):
        # salt x0 per rep: identical (executable, inputs) executions can be
        # replayed from the remote runtime's result cache at ~0 ms
        fn(p, x0 + jnp.bfloat16(s0 * 1e-3))        # compile
        reps = 3
        t0 = time.time()
        for i in range(reps):
            fn(p, x0 + jnp.bfloat16((s0 + 1 + i) * 1e-3))
        return (time.time() - t0) / reps / steps * 1e3   # ms/token

    @jax.jit
    def loop_step_only(p, x0):
        cache = L.init_kv_cache(cfg.llama, 1, S, dtype=jnp.bfloat16)

        def body(i, carry):
            x, cache = carry
            h, cache = L.decode_step(p, cfg.llama, x, jnp.full((1, 1), T0 + i),
                                     cache, jnp.int32(T0 + i), attn_impl=attn)
            return (h, cache)

        x, _ = jax.lax.fori_loop(0, steps, body, (x0, cache))
        return x.sum()

    @jax.jit
    def loop_with_head(p, x0):
        cache = L.init_kv_cache(cfg.llama, 1, S, dtype=jnp.bfloat16)

        def body(i, carry):
            x, cache = carry
            h, cache = L.decode_step(p, cfg.llama, x, jnp.full((1, 1), T0 + i),
                                     cache, jnp.int32(T0 + i), attn_impl=attn)
            tok = jnp.argmax(L.lm_head(p, cfg.llama, h[:, 0]), -1)
            return (L.embed_tokens(p, tok)[:, None].astype(x.dtype), cache)

        x, _ = jax.lax.fori_loop(0, steps, body, (x0, cache))
        return x.sum()

    x0 = jnp.zeros((1, 1, D), jnp.bfloat16)
    ms_step = timed(lambda p, x: float(loop_step_only(p, x)), params["llama"], x0)
    ms_head = timed(lambda p, x: float(loop_with_head(p, x)), params["llama"], x0)

    prompt = jnp.zeros((1, T0, D), jnp.bfloat16)

    def full(i):
        out = greedy_decode(params, cfg, prompt + jnp.bfloat16(i * 1e-3),
                            max_new_tokens=steps, max_images=1,
                            max_cache_len=S, attn_impl=attn)
        jax.block_until_ready(out["ids"])

    full(s0)
    t0 = time.time()
    for i in range(3):
        full(s0 + i + 1)
    ms_full = (time.time() - t0) / 3 / steps * 1e3
    print(json.dumps({
        "metric": (f"B=1 {size} per-token ms (fori-loop, S={S}): decode_step "
                   f"/ +lm_head+embed / full greedy loop (state machine)"),
        "decode_step_ms": round(ms_step, 3),
        "plus_head_ms": round(ms_head, 3),
        "full_loop_ms": round(ms_full, 3),
        "state_machine_overhead_ms": round(ms_full - ms_head, 3),
        "attn_impl": attn,
        "unit": "ms/token",
    }))


def bench_serve(cfg, size):
    """Continuous-batching serving throughput: mixed prompt/generation
    lengths through an N-slot ServeEngine (new requests are admitted the
    moment a slot frees). Reported as aggregate new tokens/sec; the static
    batched path (batched_greedy_decode) would stall every row on the
    batch's longest budget."""
    import jax
    import jax.numpy as jnp

    from metamorph_tpu.inference.serve import Request, ServeEngine
    from metamorph_tpu.models import llama as L
    from metamorph_tpu.models.metamorph import init_metamorph_params

    params = init_metamorph_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    # the reference baseline is ALWAYS the bf16 full-recompute loop (the
    # reference has no TPU int8 path); timing it with quantized weights
    # produced the r03 broken 0.3 tok/s row (int8 full-T forward is
    # pathological) and a meaningless vs_baseline
    params_ref = params
    if os.environ.get("BENCH_SERVE_CONTENT") == "mixed":
        # mixed-workload crafting: cycle-token embeddings are scaled so the
        # residual stream is input-dominated and the lm_head gains FORCED
        # cycle->next mappings ON TOP of its random kernel — rows whose
        # prompts are periodic generate the cycle forever (prompt-lookup
        # drafts verify), rows with random prompts keep decoding randomly
        # (drafts never verify). The per-row adaptive speculation scenario.
        cyc = [11, 22, 33, 44]
        emb = np.asarray(params["llama"]["embed"]["embedding"],
                         np.float32).copy()
        for t in cyc:
            emb[t] *= 64.0
        kern = np.asarray(params["llama"]["lm_head"]["kernel"],
                          np.float32).copy()
        for j, t in enumerate(cyc):
            kern[:, cyc[(j + 1) % 4]] += emb[t] * (
                5.0 / max(1.0, float(np.dot(emb[t], emb[t]))))
        params = dict(params)
        params["llama"] = dict(params["llama"])
        params["llama"]["embed"] = {"embedding": jnp.asarray(emb,
                                                             jnp.bfloat16)}
        params["llama"]["lm_head"] = {"kernel": jnp.asarray(kern,
                                                            jnp.bfloat16)}
    kv_int8 = bool(int(os.environ.get("BENCH_KV_INT8", "0")))
    if bool(int(os.environ.get("BENCH_SERVE_QUANT", "0"))):
        from metamorph_tpu.ops.quant import quantize_llama_decode

        params = dict(params)
        params["llama"] = quantize_llama_decode(params["llama"])
    rng = np.random.default_rng(0)
    n_slots = int(os.environ.get("BENCH_SERVE_SLOTS", 8))
    n_req = int(os.environ.get("BENCH_SERVE_REQUESTS", 32))
    t0_max = int(os.environ.get("BENCH_SERVE_T0", 256))
    new_max = int(os.environ.get("BENCH_SERVE_NEW", 128))
    cache = int(os.environ.get("BENCH_SERVE_CACHE", 512))
    # requests enter as TOKEN IDS (the realistic serving input): embedding
    # lookup happens on device, so host->device traffic per prompt is KBs,
    # not MBs. BENCH_SERVE_EMBEDS=1 measures the legacy pre-fused path.
    use_embeds = bool(int(os.environ.get("BENCH_SERVE_EMBEDS", "0")))
    # BENCH_SERVE_PREFIX=P: shared-prefix engine — a P-token system prompt
    # whose KV is computed once; requests submit only their suffixes
    prefix_len = int(os.environ.get("BENCH_SERVE_PREFIX", 0))
    if prefix_len and use_embeds:
        raise SystemExit("BENCH_SERVE_PREFIX requires the ids transport "
                         "(unset BENCH_SERVE_EMBEDS)")
    # prefix + longest suffix + largest budget must fit the cache
    cache = max(cache, prefix_len + t0_max + new_max)
    # lengths come from a FIXED seed (stable workload shape run-to-run);
    # token content is salted per run — the remote runtime caches results of
    # identical (executable, inputs) executions across runs AND processes,
    # so re-serving byte-identical prompts can replay instead of compute
    lengths = [(int(rng.integers(t0_max // 5, t0_max)),
                int(rng.integers(new_max // 4, new_max)))
               for _ in range(n_req)]

    # BENCH_SERVE_CONTENT=mixed: odd-uid requests carry PERIODIC content
    # (prompt-lookup drafts verify on an echo-crafted model) while even ones
    # stay random — the per-row adaptive speculation scenario
    content = os.environ.get("BENCH_SERVE_CONTENT", "random")

    def make_reqs(salt):
        rng_c = np.random.default_rng(os.getpid() * 1000 + salt)
        pfx = (rng_c.integers(10, 100000, (prefix_len,)).astype(np.int32)
               if prefix_len else None)
        reqs = []
        for i, (t0, budget) in enumerate(lengths):
            if content == "mixed" and i % 2:
                cyc = [11, 22, 33, 44]
                ids = np.asarray((cyc * (t0 // 4 + 1))[:t0], np.int32)
                ids[0] += salt % 4      # salt the phase, keep the period
            else:
                ids = rng_c.integers(10, 100000, (t0,)).astype(np.int32)
            if use_embeds:
                pe = np.asarray(L.embed_tokens(params["llama"], ids[None])[0])
                reqs.append(Request(prompt_embeds=pe, max_new_tokens=budget,
                                    uid=i))
            else:
                reqs.append(Request(prompt_ids=ids, max_new_tokens=budget,
                                    uid=i))
        return reqs, pfx

    def run(reqs, prefix_ids):
        buckets = tuple(b for b in (64, 128, 256, 512, 1024, 2048)
                        if b <= t0_max) or (t0_max,)
        eng = ServeEngine(params, cfg, n_slots=n_slots, max_cache_len=cache,
                          max_new_tokens_cap=new_max, max_images=1,
                          prefill_buckets=buckets,
                          steps_per_sync=int(os.environ.get(
                              "BENCH_SERVE_SYNC", 16)),
                          fill_chunk=int(os.environ.get(
                              "BENCH_SERVE_FILL", 0)),
                          max_fills=int(os.environ.get(
                              "BENCH_SERVE_MAX_FILLS", 2)),
                          kv_int8=kv_int8,
                          spec_k=int(os.environ.get("BENCH_SERVE_SPEC_K",
                                                    0)),
                          shared_prefix_ids=prefix_ids)
        # BENCH_SERVE_SPEC_FORCE=always disables the per-row adaptive
        # routing (baseline for the mixed-content scenario)
        if os.environ.get("BENCH_SERVE_SPEC_FORCE") == "always":
            eng.spec_overhead_frac = -1e9
        for r in reqs:
            eng.submit(r)
        done = eng.run()
        q = [c.queue_s for c in done]
        return (sum(c.steps for c in done), eng.spec_accepted,
                float(np.mean(q)), float(np.max(q)))

    reqs_a, pfx_a = make_reqs(0)
    reqs_b, pfx_b = make_reqs(1)
    t0 = time.time()
    total, _, _, _ = run(reqs_a, pfx_a)
    log(f"serve compile+run: {time.time()-t0:.1f}s total_new={total}")
    t0 = time.time()
    total, spec_accepted, mean_queue_s, max_queue_s = run(reqs_b, pfx_b)
    dt = time.time() - t0
    tok_s = total / dt
    mean_T = int(np.mean([prefix_len + t0_i + budget / 2
                          for t0_i, budget in lengths]))
    ref_tok_s = reference_recompute_tok_s(params_ref, cfg, mean_T)
    print(json.dumps({
        "metric": (f"continuous-batching serve throughput ({size} LLM, "
                   f"{n_slots} slots, {n_req} mixed-length requests, "
                   f"T0<{t0_max}, cache={cache}"
                   + (f", shared prefix P={prefix_len}" if prefix_len else "")
                   + "); vs_baseline = speedup over "
                   f"the reference's measured full-recompute B=1 loop"),
        "value": round(tok_s, 1),
        "unit": "new tokens/sec",
        "vs_baseline": round(tok_s / ref_tok_s, 2),
        "reference_recompute_tok_s": round(ref_tok_s, 1),
        "mean_queue_s": round(mean_queue_s, 3),
        "max_queue_s": round(max_queue_s, 3),
        **({"spec_accepted_drafts": spec_accepted}
           if int(os.environ.get("BENCH_SERVE_SPEC_K", 0)) else {}),
    }))


def bench_render(cfg, size):
    """Visualizer render throughput: SD-1.5-shaped UNet denoise steps/sec at
    512px (latent 64x64) with CFG (2x batch), plus the VAE decode, on one
    chip — the reference runs this through torch diffusers on GPU
    (`inference/demo.py:137-180`)."""
    import jax
    import jax.numpy as jnp

    from metamorph_tpu.visualizer.unet import (UNetConfig, init_unet_params,
                                               unet_apply)
    from metamorph_tpu.visualizer.vae import (VAEConfig, init_vae_params,
                                              vae_decode)

    ucfg, vcfg = UNetConfig(), VAEConfig()
    uparams = init_unet_params(jax.random.PRNGKey(0), ucfg, jnp.bfloat16)
    vparams = init_vae_params(jax.random.PRNGKey(1), vcfg, jnp.bfloat16)
    B = int(os.environ.get("BENCH_RENDER_BATCH", 1))
    lat = jnp.asarray(np.random.default_rng(0).normal(
        size=(2 * B, 64, 64, ucfg.sample_channels)), jnp.bfloat16)
    ctx = jnp.asarray(np.random.default_rng(1).normal(
        size=(2 * B, 77, ucfg.cross_attention_dim)), jnp.bfloat16)

    @jax.jit
    def eps_step(p, lat, ctx, t):
        tt = jnp.full((2 * B,), t, jnp.int32)
        return unet_apply(p, ucfg, lat, tt, ctx)

    @jax.jit
    def decode(p, lat, salt):
        return vae_decode(p, vcfg, (lat[:B] + salt).astype(jnp.bfloat16)
                          ).astype(jnp.float32).sum()

    e = eps_step(uparams, lat, ctx, jnp.int32(500))
    jax.block_until_ready(e)
    t0 = time.time()
    n = 10
    for i in range(n):
        # feed the output back: defeats result caching AND matches the real
        # denoise dependency chain
        lat = (lat - 0.001 * eps_step(uparams, lat, ctx,
                                      jnp.int32(500 - i))).astype(jnp.bfloat16)
    jax.block_until_ready(lat)
    step_s = n / (time.time() - t0)

    s0 = salt_base()  # cross-process result-cache defeat
    float(decode(vparams, lat, jnp.float32(s0)))
    t0 = time.time()
    for i in range(3):
        d = decode(vparams, lat, jnp.float32(s0 + 1 + i))
    jax.block_until_ready(d)
    vae_ms = (time.time() - t0) / 3 * 1e3

    sec_per_image = 50 / step_s + vae_ms / 1e3
    sec_per_image_20 = 20 / step_s + vae_ms / 1e3
    print(json.dumps({
        "metric": (f"SD-1.5 visualizer render (512px, CFG, batch={B}): UNet "
                   f"denoise steps/sec; vs_baseline = images/min at 50 steps "
                   f"(PNDM, the reference demo's sampler)"),
        "value": round(step_s, 2),
        "unit": "denoise steps/sec",
        "vs_baseline": round(60.0 / sec_per_image, 2),
        "vae_decode_ms": round(vae_ms, 1),
        "sec_per_image_50steps": round(sec_per_image, 2),
        # DPM-Solver++ (2M) reaches comparable quality at ~20 steps
        # (scheduler='dpmpp' in visualizer/pipeline.py)
        "images_per_min_20steps_dpmpp": round(60.0 / sec_per_image_20, 2),
    }))


def bench_encode(cfg, size):
    """Fused preprocess+encode images/sec/chip (BASELINE metric 2): uint8
    frames -> on-device resize+normalize -> SigLIP SO400M -> 64 tokens."""
    import jax
    import jax.numpy as jnp

    from metamorph_tpu.models.siglip import init_siglip_params, vision_tower_forward
    from metamorph_tpu.ops.preprocess import fused_resize_normalize

    params = init_siglip_params(jax.random.PRNGKey(0), cfg.siglip, jnp.bfloat16)
    N = int(os.environ.get("BENCH_IMAGES", 32))
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (N, 480, 640, 3)).astype(np.uint8))

    @jax.jit
    def run(params, frames, salt):
        # params as an ARG, not a closure: closed-over arrays embed as HLO
        # constants (0.86GB) and stall the compiler. `salt` defeats any
        # result caching; the scalar output keeps host fetches tiny.
        px = fused_resize_normalize(frames, cfg.siglip.image_size)
        out = vision_tower_forward(params, cfg.siglip, cfg.mm, px)
        return jnp.sum(out.astype(jnp.float32)) + salt

    frames = jax.device_put(frames)
    params = jax.device_put(params)
    s0 = salt_base()  # cross-process result-cache defeat
    float(run(params, frames, jnp.float32(s0)))  # warmup
    reps = 10
    t0 = time.time()
    for i in range(reps):
        r = run(params, frames, jnp.float32(s0 + 1 + i))
    jax.block_until_ready(r)
    dt = time.time() - t0
    img_s = N * reps / dt
    print(json.dumps({
        "metric": "SigLIP preprocess+encode images/sec/chip (SO400M, 480x640 uint8 in)",
        "value": round(img_s, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / 100.0, 3),
    }))


def _measure_adam_tail(cfg, _dc):
    """Per-parameter optimizer-update cost, measured on a 2-layer-slice state
    in an EMPTY HBM (run before the MFU phase: measured after it, allocator
    pressure/fragmentation inflated the number 17x on B=2 runs). The update
    is a pure per-leaf memory stream, so ps/param transfers to 8B exactly."""
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from metamorph_tpu.models.metamorph import init_metamorph_params
    from metamorph_tpu.train.optimizer import make_optimizer, trainable_mask

    cfg_tail = _dc.replace(cfg, llama=_dc.replace(cfg.llama, num_layers=2))
    params = init_metamorph_params(jax.random.PRNGKey(1), cfg_tail,
                                   jnp.bfloat16)
    tx = make_optimizer(cfg_tail.train, params)
    opt_state = tx.init(params)
    mask = trainable_mask(params, cfg_tail.train)
    grads = jax.tree.map(
        lambda p, m: jnp.full_like(p, 1e-4 if m else 0.0), params, mask)
    n_tr = sum(int(np.prod(p.shape))
               for p, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask))
               if m)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def opt_step(p, o, g, salt):
        g = jax.tree.map(lambda x: x + salt.astype(x.dtype), g)
        u, o2 = tx.update(g, o, p)
        p2 = optax.apply_updates(p, u)
        probe = sum(x.astype(jnp.float32).sum()
                    for x in jax.tree.leaves(p2)[:1])
        return p2, o2, probe

    params, opt_state, probe = opt_step(params, opt_state, grads,
                                        jnp.float32(0))
    float(probe)
    t0 = time.time()
    opt_reps = 5
    for i in range(opt_reps):
        params, opt_state, probe = opt_step(params, opt_state, grads,
                                            jnp.float32(i) * 1e-9)
    float(probe)
    tail_dt = (time.time() - t0) / opt_reps
    per_param_s = tail_dt / n_tr
    log(f"adam tail: {tail_dt*1e3:.1f} ms for {n_tr/1e9:.2f}B trainable "
        f"({per_param_s*1e12:.2f} ps/param)")
    del params, opt_state, grads
    return tail_dt, per_param_s


def bench_8b_slice(cfg, size):
    """Direct 8B-geometry evidence on a small chip: the TRUE 8B layer shapes
    (D=4096, F=14336, H=32/KV=8, Dh=128, V=128258, T=4096) with num_layers=4
    so params+grads fit 16GB; measures fused-forward+backward MFU, PLUS the
    real optimizer update (make_optimizer Adam + global-norm clip) timed at
    slice state sizes so the 8B projection's tail term is measured, not
    asserted. Projection is reported as a RANGE: the upper bound carries the
    measured MFU to v5p unchanged; the lower bound applies a 15% MFU haircut
    for the v5e->v5p carryover uncertainty. Both bounds include the measured
    per-parameter optimizer cost scaled to 8B state on a v5p-8 (FSDP: 1/8 of
    the state per chip, spec HBM-bandwidth ratio for the chip change)."""
    import dataclasses as _dc
    import functools

    import jax
    import jax.numpy as jnp

    from metamorph_tpu.config import LlamaConfig, TrainConfig as TC
    from metamorph_tpu.models.metamorph import init_metamorph_params
    from metamorph_tpu.train.train_step import loss_fn

    L = int(os.environ.get("BENCH_SLICE_LAYERS", 4))
    B, T = int(os.environ.get("BENCH_BATCH", 1)), 4096
    llama = LlamaConfig(num_layers=L)  # all other dims = 8B defaults
    cfg = _dc.replace(cfg, llama=llama,
                      train=TC(max_seq_len=T, batch_size=B,
                               max_images_per_batch=2 * B, remat=True,
                               remat_policy=os.environ.get(
                                   "BENCH_REMAT", "dots_no_batch"),
                               ce_chunk=int(os.environ.get("BENCH_CE_CHUNK",
                                                           512))))
    tail_dt, per_param_s = _measure_adam_tail(cfg, _dc)  # empty-HBM measurement
    params = init_metamorph_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    log(f"8b-slice: layers={L} B={B} T={T} params={n_params/1e9:.2f}B")
    batch, pixels = build_batch(cfg)

    # reduce grads to one scalar INSIDE the jit and float() it: through the
    # remote-TPU tunnel, block_until_ready on a large pytree does not reliably
    # fence execution — a host scalar fetch does
    @jax.jit
    def grad_fn(p, b, px):
        g = jax.grad(lambda p: loss_fn(p, cfg, b, px, "flash")[0])(p)
        return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(g))

    def run():
        return float(grad_fn(params, batch, pixels))

    t0 = time.time(); run(); log(f"compile: {time.time()-t0:.1f}s")
    run()
    n_steps = int(os.environ.get("BENCH_STEPS", 5))
    t0 = time.time()
    for _ in range(n_steps):
        run()
    dt = (time.time() - t0) / n_steps
    flops = train_step_flops(cfg, 2 * B)
    peak = chip_peak_tflops()
    mfu = flops / dt / (peak * 1e12) if peak else None

    # convert to full-32-layer 8B tokens/sec at this measured MFU, optimizer
    # tail included: v5p-8 FSDP shards the 8B state 8 ways; the per-param
    # streaming cost carries over by the spec HBM-bandwidth ratio
    cfg8 = _dc.replace(cfg, llama=LlamaConfig(),
                       train=TC(max_seq_len=4096, batch_size=8))
    f8_per_tok = train_step_flops(cfg8, 16) / (8 * 4096)
    v5p = PEAK_BF16_TFLOPS["TPU v5p"]
    bw_ratio = HBM_GBPS["TPU v5p"] / hbm_gbps_this_chip()
    n_8b = 8.03e9 + 0.1e9          # llama + projector/head trainables
    tail_8b_s = (n_8b / 8) * per_param_s / bw_ratio
    tokens_per_step_chip = 6 * 4096   # reference stage-2 recipe: 6/GPU, T=4096
    def proj(mfu_val):
        t_compute = tokens_per_step_chip * f8_per_tok / (mfu_val * v5p * 1e12)
        return tokens_per_step_chip / (t_compute + tail_8b_s)
    lo, hi = (proj(mfu * 0.85), proj(mfu)) if mfu else (None, None)
    print(json.dumps({
        "metric": (f"8B-geometry {L}-layer slice fwd+bwd MFU (D=4096 F=14336 "
                   f"H=32/KV=8 T=4096, full 128k vocab head); vs_baseline = "
                   f"full-8B-on-v5p projection (incl measured Adam tail, "
                   f"15% MFU haircut) vs the 3k bar"),
        "value": round(mfu, 4) if mfu else None,
        "unit": "MFU",
        "vs_baseline": round(lo / 3000.0, 3) if lo else None,
        "tok_s_chip_this_chip": round(B * T / dt, 1),
        "slice_tflops_per_step": round(flops / 1e12, 2),
        "adam_tail_ms_slice": round(tail_dt * 1e3, 2),
        "adam_ps_per_param": round(per_param_s * 1e12, 2),
        "adam_tail_ms_8b_v5p8": round(tail_8b_s * 1e3, 2),
        "projected_8b_v5p_tok_s_chip": round(hi, 1) if hi else None,
        "projected_8b_v5p_tok_s_chip_range": [round(lo, 1), round(hi, 1)]
                                             if lo else None,
    }))


def _enable_compile_cache():
    """Persistent compilation cache: repeated bench runs (and the driver's)
    skip the remote-compile round trip, which can be minutes when cold."""
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/metamorph_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from metamorph_tpu.models.metamorph import init_metamorph_params
    from metamorph_tpu.train.optimizer import make_optimizer
    from metamorph_tpu.train.train_step import train_step, init_train_state
    import functools

    cfg, size = build_cfg()
    if os.environ.get("BENCH_MODE") == "decode":
        bench_decode(cfg, size)
        return
    if os.environ.get("BENCH_MODE") == "spec_decode":
        bench_spec_decode(cfg, size)
        return
    if os.environ.get("BENCH_MODE") == "decode_decomp":
        bench_decode_decomp(cfg, size)
        return
    if os.environ.get("BENCH_MODE") == "encode":
        bench_encode(cfg, size)
        return
    if os.environ.get("BENCH_MODE") == "8b_slice":
        bench_8b_slice(cfg, size)
        return
    if os.environ.get("BENCH_MODE") == "serve":
        bench_serve(cfg, size)
        return
    if os.environ.get("BENCH_MODE") == "render":
        bench_render(cfg, size)
        return
    n_chips = len(jax.devices())
    log(f"bench: model={size} chips={n_chips} B={cfg.train.batch_size} "
        f"T={cfg.train.max_seq_len} attn={os.environ.get('BENCH_ATTN', 'flash')} "
        f"backend={jax.default_backend()}")

    params = init_metamorph_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    log(f"params: {n_params/1e9:.3f}B total")

    attn_impl = os.environ.get("BENCH_ATTN", "flash")
    if cfg.train.offload_optimizer:
        from metamorph_tpu.config import MeshConfig
        from metamorph_tpu.parallel.mesh import build_mesh
        from metamorph_tpu.train.train_step import make_sharded_train_step

        mesh = build_mesh(MeshConfig(data=1, fsdp=1, tensor=1),
                          devices=jax.devices()[:1])
        step, tx, state_sh, _ = make_sharded_train_step(
            cfg, mesh, params, attn_impl=attn_impl)
        state = {"params": params,
                 "opt_state": jax.device_put(tx.init(params), state_sh["opt_state"]),
                 "step": jnp.zeros((), jnp.int32)}
    else:
        state = init_train_state(params, cfg)
        tx = make_optimizer(cfg.train, params)
        step = jax.jit(functools.partial(train_step, cfg=cfg, tx=tx,
                                         attn_impl=attn_impl), donate_argnums=(0,))
    batch, pixels = build_batch(cfg)

    # BENCH_ACCUM=A: run A microbatches per optimizer step (accum_train_step)
    # — amortizes the Adam/allocator tail over A x the tokens at long T
    accum = int(os.environ.get("BENCH_ACCUM", "1"))
    if accum > 1:
        import dataclasses as _dc
        from metamorph_tpu.train.train_step import accum_train_step
        cfg = _dc.replace(cfg, train=_dc.replace(cfg.train,
                                                 grad_accum_steps=accum))
        step = jax.jit(functools.partial(accum_train_step, cfg=cfg, tx=tx,
                                         attn_impl=attn_impl),
                       donate_argnums=(0,))
        batch = jax.tree.map(lambda x: jnp.stack([x] * accum), batch)
        pixels = jnp.stack([pixels] * accum)

    t0 = time.time()
    state, metrics = step(state, batch, pixels)
    jax.block_until_ready(metrics["loss"])
    log(f"compile+first step: {time.time()-t0:.1f}s loss={float(metrics['loss']):.3f}")

    # warmup one more, then timed steps
    state, metrics = step(state, batch, pixels)
    jax.block_until_ready(metrics["loss"])

    n_steps = int(os.environ.get("BENCH_STEPS", 10))
    t0 = time.time()
    for _ in range(n_steps):
        state, metrics = step(state, batch, pixels)
    jax.block_until_ready(metrics["loss"])
    # offload pipelines the optimizer update/write-back past the loss fetch;
    # fence the full state so the timed window includes the final update
    jax.block_until_ready(jax.tree.leaves(state["params"])[0])
    dt = time.time() - t0

    tokens_per_step = cfg.train.batch_size * cfg.train.max_seq_len * accum
    tok_s_chip = tokens_per_step * n_steps / dt / n_chips

    # ---- MFU + 8B projection (BASELINE bar is 3000 tok/s/chip AT 8B) ----
    n_images = 2 * cfg.train.batch_size
    flops_step = train_step_flops(cfg, n_images) * accum
    peak = chip_peak_tflops()
    baseline = 3000.0
    if size == "8b":
        # the bar measured directly
        vs = tok_s_chip / baseline
        label = f"interleaved train tokens/sec/chip (8B LLM + SigLIP-SO400M, dual loss)"
        projected = tok_s_chip
        mfu = (flops_step * n_steps / dt / n_chips / (peak * 1e12)
               if peak else None)
    else:
        # Honest extrapolation: measured MFU at this size, converted through
        # the 8B-recipe FLOPs/token (B=8, T=4096). vs_baseline is labeled as
        # projected — the raw small-model tok/s is NOT compared to the 8B bar.
        mfu = (flops_step * n_steps / dt / n_chips / (peak * 1e12)
               if peak else None)
        from metamorph_tpu.config import LlamaConfig, TrainConfig as TC
        import dataclasses as _dc

        cfg8 = _dc.replace(cfg, llama=LlamaConfig(),
                           train=TC(max_seq_len=4096, batch_size=8))
        f8_per_tok = train_step_flops(cfg8, 16) / (8 * 4096)
        # The 3000 tok/s/chip bar is defined on v5p (BASELINE.md); project the
        # measured MFU through v5p's bf16 peak (v5p has a better byte/FLOP
        # ratio than v5e, so carrying MFU over is conservative-to-neutral).
        v5p_peak = PEAK_BF16_TFLOPS["TPU v5p"]
        projected = (mfu * v5p_peak * 1e12 / f8_per_tok) if mfu else None
        vs = (projected / baseline) if projected else None
        label = (f"interleaved train tokens/sec/chip ({size} LLM + "
                 f"SigLIP-SO400M, dual loss; vs_baseline = 8B-on-v5p "
                 f"projection from measured MFU)")
    result = {
        "metric": label,
        "value": round(tok_s_chip, 1),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "model_size": size,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "chip_peak_tflops_bf16": peak,
        "model_tflops_per_step": round(flops_step / 1e12, 2),
        "projected_8b_v5p_tok_s_chip": (round(projected, 1)
                                        if projected is not None else None),
        "baseline_8b_v5p_tok_s_chip": baseline,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
