#!/usr/bin/env python
"""Offline parity certification runner -> one JSON artifact.

Real LLaMA-3.1-8B / SigLIP-SO400M / SD-1.5 weights are unobtainable here (no
network egress, no HF cache — recorded in ROADMAP). This runs the strongest
offline fallback: implementation parity against REAL `transformers` modeling
code (`LlamaForCausalLM`, `SiglipVisionModel`) with shared random weights at
true model geometry:

  phase A  visual-token cosine at real SigLIP-SO400M-p14-384 geometry
           (north star: >= 0.99) — eval/visual_parity.py;
  phase B  full VQA pipeline (fusion -> greedy decode) answer parity + prompt
           logit cosine at 300M LLaMA geometry, bf16-free fp32 CPU both
           sides — eval/answer_parity.py --torch-reference;
  phase B' the same through the int8 weight-only decode path;
  phase C  prompt-logit cosine at TRUE LLaMA-3.1-8B geometry (rope-llama3
           scaling, GQA 32/8, 128k vocab) — forward-only (a full-recompute
           torch greedy loop at 8B on this 1-core host is impractical).

Each phase runs in a subprocess so the 8B fp32 copies don't accumulate.

    python scripts/run_parity.py --out PARITY_r03.json [--skip-8b]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args, timeout):
    """Run, return (rc, last JSON line or raw tail)."""
    # PREPEND the repo to PYTHONPATH: the ambient path carries the site dir
    # that registers the TPU backend plugin (sitecustomize) — replacing it
    # breaks every phase that needs the chip (e.g. logit_parity_8b_bf16_tpu,
    # train_parity_model) with "Unable to initialize backend 'axon'".
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(args, capture_output=True, text=True, timeout=timeout,
                       env=env, cwd=REPO)
    out = None
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            out = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    if out is None:
        out = {"error": f"rc={r.returncode}",
               "stderr_tail": r.stderr.strip().splitlines()[-3:]}
    return r.returncode, out


def _eval_rows_current(out, rows, no_images):
    """True iff eval.jsonl already has >= rows lines AND the r4 mixed kind
    set (generation rows) — older 12-row text/image-only sets regenerate."""
    path = os.path.join(out, "eval.jsonl")
    if not os.path.exists(path):
        return False
    lines = [l for l in open(path) if l.strip()]
    if len(lines) < rows:
        return False
    return no_images or any('"generate"' in l for l in lines)


def ensure_assets(workdir, llm, rows, no_images=False):
    out = os.path.join(workdir, llm)
    marker = os.path.join(out, "llama", "model.safetensors")
    if not os.path.exists(marker) or not _eval_rows_current(out, rows,
                                                            no_images):
        rc, res = sh([sys.executable, "scripts/make_parity_assets.py",
                      "--out", out, "--llm", llm, "--rows", str(rows)]
                     + (["--no-images"] if no_images else []),
                     timeout=7200)
        if rc != 0 or not os.path.exists(marker):
            raise RuntimeError(f"asset build failed: {res}")
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="PARITY_r03.json")
    p.add_argument("--workdir", default="/tmp/metamorph_parity")
    p.add_argument("--skip-8b", action="store_true")
    p.add_argument("--skip-int8", action="store_true")
    p.add_argument("--rows", type=int, default=60,
                   help="size of the 300m mixed-kind eval set (text / "
                        "single- / two- / three-image / video / generation "
                        "rows, cycling)")
    p.add_argument("--skip-trained", action="store_true",
                   help="skip the trained-model int8 exact-match phase "
                        "(training needs the TPU chip)")
    args = p.parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)

    result = {
        "note": ("offline certification: real LLaMA-3.1-8B/SigLIP/SD-1.5 "
                 "weights unobtainable in this environment (no egress, no HF "
                 "cache; see ROADMAP). Both sides share identical random "
                 "weights at true geometry; the torch side is unmodified "
                 "transformers modeling code, so divergence == "
                 "implementation bug."),
    }

    if os.path.exists(args.out):   # resume: completed phases are kept
        result.update(json.load(open(args.out)))

    def save():
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)

    def phase(key, fn):
        """Run one phase; checkpoint the artifact after it; never lose
        earlier phases to a later crash."""
        if key in result and "error" not in result.get(key, {}):
            return
        try:
            rc, result[key] = fn()
        except Exception as e:
            result[key] = {"error": f"{type(e).__name__}: {e}"}
        save()

    py = sys.executable
    a300 = ensure_assets(args.workdir, "300m", args.rows)

    def ensure_bpe():
        # The trained phases need this dir even when the tokenizer_bpe
        # phase itself is resume-skipped (its result row survives in the
        # artifact while /tmp does not survive the host).
        bpe = os.path.join(args.workdir, "tokenizer_bpe")
        if not os.path.exists(os.path.join(bpe, "tokenizer.json")):
            rc, res = sh([py, "scripts/make_bpe_tokenizer.py", "--out", bpe],
                         timeout=1800)
            if not os.path.exists(os.path.join(bpe, "tokenizer.json")):
                raise RuntimeError(f"bpe build failed: {res}")
        return bpe

    def run_bpe():
        # real byte-level BPE (LLaMA-3-style split regex + ByteLevel +
        # bos post-processor, trained locally): fuzz the masking round
        # arithmetic + bos-dedup splice vs a torch-side reimplementation of
        # the reference (train.py:501-597, mm_utils.py:191-214)
        bpe = ensure_bpe()
        return sh([py, "-m", "metamorph_tpu.eval.tokenizer_parity",
                   "--tokenizer", bpe, "--n", "1000"], timeout=3600)

    phase("tokenizer_bpe", run_bpe)

    phase("visual_parity_so400m", lambda: sh(
        [py, "-m", "metamorph_tpu.eval.visual_parity",
         "--siglip", os.path.join(a300, "siglip"), "--cpu"], timeout=3600))

    base = [py, "-m", "metamorph_tpu.eval.answer_parity",
            "--llama", os.path.join(a300, "llama"),
            "--siglip", os.path.join(a300, "siglip"),
            "--tokenizer", os.path.join(a300, "tokenizer"),
            "--eval-jsonl", os.path.join(a300, "eval.jsonl"),
            "--torch-reference", "--cpu", "--max-new-tokens", "12"]
    phase("answer_parity_300m", lambda: sh(base, timeout=21600))
    if not args.skip_int8:
        # int8 is a LOSSY path: random-weight argmax margins are noise-thin,
        # so the certification bar here is logit-cosine; the TRAINED phase
        # below holds int8 to exact answers (the r3 verdict's ask)
        phase("answer_parity_300m_int8",
              lambda: sh(base + ["--int8", "--cosine-only"], timeout=21600))

    if not args.skip_trained:
        def run_trained(int8):
            # train the 300m parity model to decisive margins (on the TPU
            # chip — scripts/train_parity_model.py), then require
            # exact_match == 1.0 through the int8 decode path: the same
            # criterion as the bf16 row, closing the r3 "cosine-only int8"
            # weakness. The export is the full HF layout, so this phase
            # ALSO certifies export_hf -> transformers round-trip.
            def go():
                bpe = ensure_bpe()
                trained = os.path.join(args.workdir, "300m_trained")
                marker = os.path.join(trained, "model.safetensors")
                if not os.path.exists(marker):
                    rc, res = sh([py, "scripts/train_parity_model.py",
                                  "--assets", a300, "--tokenizer", bpe,
                                  "--out", trained], timeout=7200)
                    if not os.path.exists(marker):
                        raise RuntimeError(
                            f"parity-model training failed: {res}")
                return sh([py, "-m", "metamorph_tpu.eval.answer_parity",
                           "--model-path", trained,
                           "--llama", trained,
                           "--siglip", os.path.join(trained, "vision_tower"),
                           "--tokenizer", trained,
                           "--eval-jsonl", os.path.join(trained,
                                                        "eval_trained.jsonl"),
                           "--torch-reference", "--cpu",
                           "--max-new-tokens", "12"]
                          + (["--int8"] if int8 else []), timeout=21600)
            return go
        phase("answer_parity_300m_trained", run_trained(False))
        phase("answer_parity_300m_trained_int8", run_trained(True))

    if not args.skip_8b:
        def run_8b():
            # 8B per-layer geometry at 2 layers: this host's kernel zeroes
            # large anonymous memory at ~15 MB/s (measured), making the
            # 64GB-resident full-depth fp32 pair infeasible; layer count
            # changes no per-layer math or weight layout
            a8b = ensure_assets(args.workdir, "8b2l", 3, no_images=True)
            return sh(
                [py, "-m", "metamorph_tpu.eval.answer_parity",
                 "--llama", os.path.join(a8b, "llama"),
                 "--tokenizer", os.path.join(a8b, "tokenizer"),
                 "--eval-jsonl", os.path.join(a8b, "eval.jsonl"),
                 "--torch-reference", "--cpu", "--forward-only"],
                timeout=14400)

        phase("logit_parity_8b_geometry", run_8b)

        def run_8b_bf16_tpu():
            # VERDICT r4 item 5: the round-4 snapshot moved rope/silu to
            # activation dtype (models/llama.py:103-160) and the flash fwd to
            # a log2-domain pre-scale — both perturb bf16 rounding. Certify
            # ON-CHIP: our side loads bf16 params and runs on the default
            # (TPU) backend, the torch side stays fp32 CPU truth; the bar is
            # min prompt-logit cosine >= 0.999 at true 8B per-layer geometry.
            probe = subprocess.run(
                [py, "-c", "import jax; print(jax.default_backend())"],
                capture_output=True, text=True, timeout=300, cwd=REPO)
            if probe.stdout.strip() == "cpu" or probe.returncode != 0:
                raise RuntimeError("no accelerator attached — rerun on the "
                                   "TPU host for the bf16 on-chip row")
            a8b = ensure_assets(args.workdir, "8b2l", 3, no_images=True)
            return sh(
                [py, "-m", "metamorph_tpu.eval.answer_parity",
                 "--llama", os.path.join(a8b, "llama"),
                 "--tokenizer", os.path.join(a8b, "tokenizer"),
                 "--eval-jsonl", os.path.join(a8b, "eval.jsonl"),
                 "--torch-reference", "--forward-only", "--bf16",
                 "--cosine-threshold", "0.999"],
                timeout=14400)

        phase("logit_parity_8b_bf16_tpu", run_8b_bf16_tpu)

    passes = [v.get("pass") for k, v in result.items()
              if isinstance(v, dict) and "pass" in v]
    errors = [k for k, v in result.items()
              if isinstance(v, dict) and "error" in v]
    result["all_pass"] = bool(passes) and all(passes) and not errors
    save()
    print(json.dumps(result))
    return 0 if result["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
