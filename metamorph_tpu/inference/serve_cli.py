"""Batch serving CLI: a JSONL of requests through the continuous-batching
engine.

Completes the serving surface next to the single-request demo
(`inference/demo.py`, reference `inference/demo.py:45-182`): each input row is
{"prompt": str, "image": path|null, "max_new_tokens": int?, "uid": any?};
output is one JSON line per completion with the decoded text and the number
of generated visual tokens (renderable via the visualizer exactly like the
demo path).

    python -m metamorph_tpu.inference.serve_cli --model-path CKPT \
        --tokenizer TOK --requests reqs.jsonl --out completions.jsonl \
        [--n-slots 8] [--int8]
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional

import numpy as np

from metamorph_tpu.constants import (DEFAULT_IM_END_TOKEN,
                                     DEFAULT_IM_START_TOKEN, IM_END_TOKEN_ID,
                                     IM_START_TOKEN_ID, LLAMA3_EOS_IDS)


def fuse_request(params, cfg, tokenize, bos_token_id, prompt_text: str,
                 frames: List[np.ndarray], bucket: int) -> dict:
    """Build one request's admission payload. Text-only prompts ship as token
    ids (embedding lookup happens on device inside the engine — KBs across
    the host link instead of MBs); image prompts go through the host-side
    packer/fusion path (whose truncation/splice quirks match the reference)
    and ship pre-fused embeddings."""
    import jax.numpy as jnp

    from metamorph_tpu.inference.demo import build_prompt
    from metamorph_tpu.models import metamorph as mm_lib
    from metamorph_tpu.multimodal.mm_utils import (siglip_preprocess,
                                                   tokenizer_image_token)
    from metamorph_tpu.multimodal.packing import batch_to_arrays, pack_sequences

    prompt = build_prompt(prompt_text, len(frames))
    ids = tokenizer_image_token(prompt, tokenize, bos_token_id=bos_token_id)
    K = cfg.mm.num_image_tokens
    t0 = len(ids) + (K - 1) * sum(1 for i in ids if i == -200)
    if not frames:
        return {"prompt_ids": np.asarray(ids, np.int32)}
    packed = pack_sequences([ids], None, K, max(bucket, t0), len(frames))
    batch = {k: jnp.asarray(v) for k, v in batch_to_arrays(packed).items()}
    pixels = jnp.asarray(np.stack([
        siglip_preprocess(f, cfg.siglip.image_size) for f in frames]))
    projected, _ = mm_lib.encode_images(params, cfg, pixels)
    embeds = mm_lib.fuse_embeddings(params, cfg, batch, projected)
    return {"prompt_embeds": np.asarray(embeds[0, :t0])}


def _load_draft(args):
    """(draft_params, draft_cfg) from --draft-model, or None."""
    if not getattr(args, "draft_model", None):
        return None
    if args.spec_k <= 1:
        raise SystemExit("--draft-model requires --spec-k >= 2")
    import jax.numpy as jnp

    from metamorph_tpu.models.hf_import import load_hf_llama

    return load_hf_llama(args.draft_model, jnp.bfloat16)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--siglip", default=None, help="HF SigLIP weights dir")
    p.add_argument("--requests", required=True, help="JSONL of requests")
    p.add_argument("--out", required=True, help="completions JSONL")
    p.add_argument("--n-slots", type=int, default=8)
    p.add_argument("--max-cache-len", type=int, default=4096)
    p.add_argument("--max-new-tokens", type=int, default=256,
                   help="default per-request budget (rows may override)")
    p.add_argument("--int8", action="store_true",
                   help="weight-only int8 quantized decode (ops/quant.py)")
    p.add_argument("--spec-k", type=int, default=0,
                   help=">1 enables speculative decoding for greedy rows "
                        "(prompt-lookup drafts, exact verification)")
    p.add_argument("--draft-model", default=None,
                   help="HF dir of a small shared-vocab LLaMA drafter "
                        "(with --spec-k > 1)")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 KV cache (halves cache HBM traffic)")
    p.add_argument("--fill-chunk", type=int, default=256,
                   help="chunked-prefill chunk size for long prompts "
                        "(0 disables; must divide --max-cache-len)")
    p.add_argument("--max-fills", type=int, default=2,
                   help="long-prompt admissions streaming concurrently "
                        "through the fused decode+chunk program")
    p.add_argument("--steps-per-sync", type=int, default=8,
                   help="decode steps per scheduler sync")
    p.add_argument("--temperature", type=float, default=0.0,
                   help="default sampling temperature (0 = greedy; rows may "
                        "override with a 'temperature' field)")
    p.add_argument("--top-p", type=float, default=1.0,
                   help="default nucleus mass (rows may override)")
    p.add_argument("--seed", type=int, default=0,
                   help="engine sampling seed")
    args = p.parse_args(argv)

    from transformers import AutoTokenizer

    from metamorph_tpu.inference.demo import load_frames
    from metamorph_tpu.inference.loader import load_pretrained_model
    from metamorph_tpu.inference.serve import Request, ServeEngine

    params, cfg = load_pretrained_model(args.model_path,
                                        hf_siglip_path=args.siglip)
    if args.int8:
        from metamorph_tpu.ops.quant import quantize_llama_decode

        params = dict(params)
        params["llama"] = quantize_llama_decode(params["llama"])

    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    tok.add_tokens([DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN],
                   special_tokens=True)

    eng = ServeEngine(params, cfg, n_slots=args.n_slots,
                      max_cache_len=args.max_cache_len,
                      max_new_tokens_cap=args.max_new_tokens,
                      fill_chunk=args.fill_chunk,
                      max_fills=args.max_fills,
                      steps_per_sync=args.steps_per_sync,
                      seed=args.seed, kv_int8=args.kv_int8,
                      spec_k=args.spec_k, draft=_load_draft(args))
    rows = [json.loads(l) for l in open(args.requests) if l.strip()]
    submit_order = {}
    for i, row in enumerate(rows):
        frames = load_frames(row["image"]) if row.get("image") else []
        payload = fuse_request(params, cfg, lambda s: tok(s).input_ids,
                               tok.bos_token_id, row["prompt"], frames,
                               bucket=eng.prefill_buckets[0])
        uid = row.get("uid", i)
        submit_order[uid] = i
        eng.submit(Request(**payload,
                           max_new_tokens=row.get("max_new_tokens",
                                                  args.max_new_tokens),
                           temperature=row.get("temperature",
                                               args.temperature),
                           top_p=row.get("top_p", args.top_p),
                           uid=uid))

    done = eng.run()
    # drop pads and the ids our state machine treats specially; the
    # tokenizer's own special tokens are removed by skip_special_tokens
    drop_ids = set(LLAMA3_EOS_IDS) | {IM_START_TOKEN_ID, IM_END_TOKEN_ID}
    with open(args.out, "w") as f:
        for c in sorted(done, key=lambda c: submit_order.get(c.uid, 0)):
            text_ids = [int(t) for t in c.ids
                        if t >= 0 and int(t) not in drop_ids]
            f.write(json.dumps({
                "uid": c.uid,
                "text": tok.decode(text_ids, skip_special_tokens=True),
                "n_image_tokens": int(c.image_embeds.shape[0]),
                "steps": c.steps,
            }) + "\n")
    print(f"served {len(done)} requests -> {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
