#!/usr/bin/env python
"""Measure the prompt-lookup drafter's ORACLE acceptance per match policy on
structured-but-aperiodic text (VERDICT r4 item 6 / the r4 advisor's open ask:
the 3/4 recent-match threshold in `make_ngram_draft` was tuned on synthetic
regimes only — certify it on code and JSONL before locking it in).

Oracle acceptance: at each evaluation position t in a real token stream, draft
n_draft tokens from ids[:t] and count the longest matching prefix against the
TRUE continuation ids[t:t+n_draft]. This isolates the drafter from the model:
greedy speculative decoding accepts exactly the drafted tokens the target
model would itself emit, so on a stream the model reproduces (echo/teacher
regimes) oracle acceptance IS the measured acceptance; on free generation it
is an upper bound with identical policy ordering.

Policies (all the same kernel, `inference/spec_decode.py::make_ngram_draft`):
  threshold  - default recent_len_threshold = 3*n_draft//4
  recent     - recent_len_threshold = 1      (most recent match always wins)
  full       - recent_len_threshold = n_draft (recent wins only when its
               continuation is full, i.e. latest-full-match-always)

Regimes:
  code      - this repo's own Python source, tokenized by the locally trained
              byte-level BPE (scripts/make_bpe_tokenizer.py)
  jsonl     - structured metric records: fixed keys, drifting values (the
              serving-logs shape the advisor asked about)
  periodic  - sanity anchor: a 5-token cycle (period < n_draft, the regime
              the threshold exists for): the most recent match always sits
              within n_draft of the history end, so recent-always drafts a
              truncated 5-token continuation while threshold/full fall back
              to the latest FULL match and reach n_draft

    python scripts/measure_drafter.py [--out BENCH_EXTRA_r05.json]
Emits one JSON row per (regime) with per-policy accepted-tokens/chunk and
merges them into --out under drafter_<regime> keys (stdout: the rows).
"""

import argparse
import glob
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from metamorph_tpu.inference.spec_decode import make_ngram_draft  # noqa: E402

N_DRAFT = 8
CAP = 4096          # drafter history window (matches serve's ids_all cap)
WARMUP = 512        # first positions carry too little history to be fair
STRIDE = 7          # prime stride decorrelates eval positions from structure


def _bpe_tokenizer(workdir):
    path = os.path.join(workdir, "tokenizer_bpe")
    if not os.path.exists(os.path.join(path, "tokenizer.json")):
        import subprocess
        subprocess.run([sys.executable, "scripts/make_bpe_tokenizer.py",
                        "--out", path], cwd=REPO, check=True, timeout=1800)
    from tokenizers import Tokenizer
    return Tokenizer.from_file(os.path.join(path, "tokenizer.json"))


def stream_code(workdir) -> np.ndarray:
    tok = _bpe_tokenizer(workdir)
    srcs = sorted(glob.glob(os.path.join(REPO, "metamorph_tpu/**/*.py"),
                            recursive=True))
    text = "\n\n".join(open(p).read() for p in srcs)
    return np.asarray(tok.encode(text).ids[:6 * CAP], np.int32)


def stream_jsonl(workdir) -> np.ndarray:
    tok = _bpe_tokenizer(workdir)
    rng = np.random.default_rng(0)
    hosts = [f"tpu-{i:02d}" for i in range(12)]
    rows = []
    for i in range(3000):
        rows.append(json.dumps({
            "ts": 1700000000 + i * 37 + int(rng.integers(0, 9)),
            "host": hosts[int(rng.integers(0, len(hosts)))],
            "step": 41200 + i,
            "loss": round(float(2.31 * np.exp(-i / 4000)
                                + rng.normal(0, 0.02)), 4),
            "tok_s": int(27000 + rng.normal(0, 350)),
            "status": "ok" if rng.random() > 0.03 else "retry",
        }))
    return np.asarray(tok.encode("\n".join(rows)).ids[:6 * CAP], np.int32)


def stream_periodic(_) -> np.ndarray:
    cycle = np.asarray([11, 5, 9, 2, 14], np.int32)
    return np.tile(cycle, 6 * CAP // len(cycle) + 1)[:6 * CAP]


REGIMES = {"code": stream_code, "jsonl": stream_jsonl,
           "periodic": stream_periodic}
POLICIES = {"threshold": None, "recent": 1, "full": N_DRAFT}


def measure(ids: np.ndarray, thresh) -> dict:
    draft_fn = make_ngram_draft(
        N_DRAFT, recent_len_threshold=thresh) if thresh else \
        make_ngram_draft(N_DRAFT)

    @jax.jit
    def seg_stats(seg, positions):
        def one(t):
            d = draft_fn(seg, t)
            actual = jax.lax.dynamic_slice(seg, (t,), (N_DRAFT,))
            ok = d == actual
            # longest matching prefix (speculative acceptance semantics)
            acc = jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))
            return acc, (d[0] >= 0).astype(jnp.int32)
        acc, drafted = jax.vmap(one)(positions)
        return jnp.sum(acc), jnp.sum(drafted), positions.shape[0]

    tot_acc = tot_drafted = tot_n = 0
    for s0 in range(0, len(ids) - CAP - N_DRAFT + 1, CAP):
        seg = jnp.asarray(ids[s0:s0 + CAP + N_DRAFT][:CAP])   # drafter window
        positions = jnp.arange(WARMUP, CAP - N_DRAFT, STRIDE, jnp.int32)
        a, d, n = seg_stats(seg, positions)
        tot_acc += int(a); tot_drafted += int(d); tot_n += int(n)
    return {"accepted_per_chunk": round(tot_acc / max(tot_n, 1), 3),
            "tokens_per_chunk": round(1 + tot_acc / max(tot_n, 1), 3),
            "draft_rate": round(tot_drafted / max(tot_n, 1), 3),
            "chunks": tot_n}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None,
                   help="BENCH_EXTRA json to merge drafter_<regime> rows into")
    p.add_argument("--workdir", default="/tmp/metamorph_parity")
    args = p.parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)

    rows = {}
    for regime, mk in REGIMES.items():
        ids = mk(args.workdir)
        row = {"n_draft": N_DRAFT, "cap": CAP, "stream_tokens": int(len(ids))}
        for pol, thresh in POLICIES.items():
            row[pol] = measure(ids, thresh)
        best = max(POLICIES, key=lambda k: row[k]["accepted_per_chunk"])
        row["winner"] = best
        row["threshold_regret_tokens"] = round(
            row[best]["accepted_per_chunk"]
            - row["threshold"]["accepted_per_chunk"], 3)
        rows[f"drafter_{regime}"] = row
        print(json.dumps({f"drafter_{regime}": row}), flush=True)

    if args.out:
        merged = json.load(open(args.out)) if os.path.exists(args.out) else {}
        merged.update(rows)
        with open(args.out, "w") as f:
            json.dump(merged, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
