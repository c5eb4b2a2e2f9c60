"""VQA answer-parity / full-model parity harness vs the PyTorch reference.

BASELINE north-stars 2/3: visual-token + logit cosine >= 0.99 and VQA answer
parity against the reference path (`/root/reference/inference/demo.py:116-180`,
`metamorph/model/language_model/metamorph_llama.py:502-597`).

Given HF LLaMA-3 + SigLIP weight dirs (or an exported framework checkpoint)
and a JSONL of {"image": path|null, "question": ..., "answer": ...} rows, this
tool runs our fused-forward + KV-cache greedy decode and reports:

  * exact and VQA-normalized answer match (vs the JSONL's reference answers,
    or vs a live torch re-run of the reference fusion+greedy path when
    --torch-reference is set — both sides share the SAME weights, so this
    measures implementation parity, not model quality);
  * mean/min cosine between our next-token logits over the fused prompt and
    the torch reference's.

Prints ONE JSON line with pass/fail vs the >=0.99 cosine north star.

    python -m metamorph_tpu.eval.answer_parity --llama <hf-dir> \
        --siglip <hf-dir> --tokenizer <hf-dir> --eval-jsonl vqa.jsonl \
        --torch-reference
"""

from __future__ import annotations

import argparse
import json
import re
import string
import sys
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from metamorph_tpu.constants import (IM_END_TOKEN_ID, IM_START_TOKEN_ID,
                                     IMAGE_TOKEN_INDEX, LLAMA3_EOS_IDS)

_ARTICLES = re.compile(r"\b(a|an|the)\b")


def normalize_answer(s: str) -> str:
    """VQA-style normalization: lowercase, drop punctuation and articles,
    collapse whitespace."""
    s = s.lower()
    s = s.translate(str.maketrans("", "", string.punctuation))
    s = _ARTICLES.sub(" ", s)
    return " ".join(s.split())


def logit_cosine(a: np.ndarray, b: np.ndarray) -> Dict[str, float]:
    """Per-position cosine between two [T, V] logit matrices."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    a = a - a.mean(-1, keepdims=True)
    b = b - b.mean(-1, keepdims=True)
    na = np.maximum(np.linalg.norm(a, axis=-1), 1e-12)
    nb = np.maximum(np.linalg.norm(b, axis=-1), 1e-12)
    cos = (a * b).sum(-1) / (na * nb)
    return {"mean": float(cos.mean()), "min": float(cos.min())}


# ---------------------------------------------------------------------------
# our (TPU / JAX) side
# ---------------------------------------------------------------------------

def fuse_prompt(params, cfg, tokenize: Callable[[str], List[int]],
                frames: Sequence[np.ndarray], question: str):
    """Build the demo prompt and return (fused prompt embeds [1,T,D], pixels)."""
    import jax.numpy as jnp

    from metamorph_tpu.inference.demo import build_prompt
    from metamorph_tpu.models import metamorph as mm_lib
    from metamorph_tpu.models import llama as llama_lib
    from metamorph_tpu.multimodal.mm_utils import (siglip_preprocess,
                                                   tokenizer_image_token)
    from metamorph_tpu.multimodal.packing import batch_to_arrays, pack_sequences

    prompt = build_prompt(question, len(frames))
    ids = tokenizer_image_token(prompt, tokenize)
    if frames:
        pixels = jnp.asarray(np.stack(
            [siglip_preprocess(f, cfg.siglip.image_size) for f in frames]))
        T = len(ids) + len(frames) * cfg.mm.num_image_tokens
        packed = pack_sequences([ids], None, cfg.mm.num_image_tokens, T,
                                len(frames))
        batch = {k: jnp.asarray(v) for k, v in batch_to_arrays(packed).items()}
        projected, _ = mm_lib.encode_images(params, cfg, pixels)
        embeds = mm_lib.fuse_embeddings(params, cfg, batch, projected)
        n = int(np.asarray(batch["attn_mask"][0]).sum())
        return embeds[:, :n], ids
    embeds = llama_lib.embed_tokens(
        params["llama"], jnp.asarray([ids], jnp.int32))
    return embeds, ids


def our_vqa(params, cfg, tokenize, frames, question: str,
            max_new_tokens: int = 64,
            forward_only: bool = False,
            generate_image: bool = False) -> Dict[str, Any]:
    """Our path: fused prompt -> prompt logits + KV-cache greedy answer ids.
    forward_only skips the greedy decode (logit-cosine-only certification at
    geometries where an autoregressive loop is impractical on this host).
    generate_image certifies the continuous-emission loop: the prompt ends
    with <image_start> and the decode begins in image mode, returning the 64
    emitted 1152-d visual embeddings (`metamorph_llama.py:547-574`)."""
    import jax.numpy as jnp

    from metamorph_tpu.constants import DEFAULT_IM_START_TOKEN
    from metamorph_tpu.inference.decode import greedy_decode
    from metamorph_tpu.models import llama as llama_lib

    q_text = question + ("\n" + DEFAULT_IM_START_TOKEN if generate_image else "")
    embeds, _ = fuse_prompt(params, cfg, tokenize, frames, q_text)
    T = embeds.shape[1]
    pos = jnp.arange(T, dtype=jnp.int32)[None]
    hidden = llama_lib.llama_forward(params["llama"], cfg.llama, embeds, pos,
                                     jnp.ones((1, T), jnp.int32))
    logits = llama_lib.lm_head(params["llama"], cfg.llama, hidden[0])
    if forward_only:
        return {"answer_ids": [], "prompt_logits": np.asarray(logits,
                                                              np.float32)}
    K = cfg.mm.num_image_tokens
    mx = (K + 4) if generate_image else max_new_tokens
    out = greedy_decode(params, cfg, embeds, max_new_tokens=mx,
                        max_images=max(len(frames), 1) + int(generate_image),
                        start_in_image=generate_image)
    n = int(out["n_ids"])
    gen = [int(x) for x in np.asarray(out["ids"][:n])]
    answer_ids = [t for t in gen
                  if t not in LLAMA3_EOS_IDS
                  and t not in (IM_START_TOKEN_ID, IM_END_TOKEN_ID)]
    result = {"answer_ids": answer_ids,
              "prompt_logits": np.asarray(logits, np.float32)}
    if generate_image:
        n_img = int(out["n_image_tokens"])
        result["gen_embeds"] = np.asarray(out["image_embeds"][:n_img],
                                          np.float32)
    return result


# ---------------------------------------------------------------------------
# torch reference side (optional — needs transformers + HF weight dirs)
# ---------------------------------------------------------------------------

def _torch_projector(params_projector, acts):
    """Apply our projector weights in torch (identical math to apply_stack)."""
    import torch
    import torch.nn.functional as F

    def apply(x):
        for i, act in enumerate(acts):
            layer = params_projector[f"w{i}"]
            w = torch.from_numpy(np.asarray(layer["kernel"], np.float32))
            b = torch.from_numpy(np.asarray(layer["bias"], np.float32))
            x = x @ w + b
            if act == "gelu":
                x = F.gelu(x)
            elif act == "softmax":
                x = F.softmax(x, dim=-1)
        return x

    return apply


def torch_reference_vqa(llama_dir: str, siglip_dir: str, params, cfg,
                        tokenize, frames, question: str,
                        max_new_tokens: int = 64,
                        forward_only: bool = False,
                        generate_image: bool = False) -> Dict[str, Any]:
    """The reference pipeline in torch, sharing OUR weights for the connector:
    SigLIP tower + bilinear 729->K reduction + L2 norm
    (`siglip_encoder.py:138-213`) -> mm_projector -> per-sample splice at the
    -200 sentinels (`metamorph_arch.py:286-339`) -> LlamaForCausalLM on
    inputs_embeds -> full-recompute greedy (`metamorph_llama.py:502-597`,
    use_cache=False)."""
    import torch
    from transformers import LlamaForCausalLM

    from metamorph_tpu.eval.visual_parity import reference_visual_tokens
    from metamorph_tpu.inference.demo import build_prompt
    from metamorph_tpu.models.metamorph import _head_acts, _proj_acts
    from metamorph_tpu.multimodal.mm_utils import (siglip_preprocess,
                                                   tokenizer_image_token)

    from metamorph_tpu.constants import DEFAULT_IM_START_TOKEN

    model = LlamaForCausalLM.from_pretrained(
        llama_dir, torch_dtype=torch.float32).eval()
    q_text = question + ("\n" + DEFAULT_IM_START_TOKEN if generate_image else "")
    prompt = build_prompt(q_text, len(frames))
    ids = tokenizer_image_token(prompt, tokenize)

    with torch.no_grad():
        if frames:
            px = np.stack([siglip_preprocess(f, cfg.siglip.image_size)
                           for f in frames]).transpose(0, 3, 1, 2)
            feats = reference_visual_tokens(
                siglip_dir, px, num_tokens=cfg.mm.num_image_tokens,
                select_layer=cfg.siglip.select_layer,
                normalize=cfg.mm.normalize_vision)
            proj = _torch_projector(params["projector"], _proj_acts(cfg))
            img_emb = proj(torch.from_numpy(feats))      # [N, K, D]
        # splice text embeds around sentinels
        embed_table = model.get_input_embeddings()
        chunks: List[torch.Tensor] = []
        img_i = 0
        cur: List[int] = []
        for t in ids + [None]:
            if t == IMAGE_TOKEN_INDEX or t is None:
                if cur:
                    chunks.append(embed_table(torch.tensor(cur)))
                    cur = []
                if t is not None:
                    chunks.append(img_emb[img_i])
                    img_i += 1
            else:
                cur.append(t)
        embeds = torch.cat(chunks, dim=0)[None]          # [1, T, D]

        logits_prompt = model(inputs_embeds=embeds).logits[0].numpy()

        if forward_only:
            return {"answer_ids": [], "prompt_logits": logits_prompt}
        if generate_image:
            # the reference's image-mode loop (`metamorph_llama.py:547-574`
            # with decoding=True, :363-377): the post-final-norm hidden of the
            # newest position goes vision_head -> L2-normalize ->
            # mm_projector, the projected embed is appended as the next
            # continuous token, and the 1152-d embed is collected. Entry is
            # the harness convention (prompt ends with <image_start>, loop
            # starts in image mode) shared bit-for-bit with our side.
            proj = _torch_projector(params["projector"], _proj_acts(cfg))
            head = _torch_projector(params["vision_head"], _head_acts(cfg))
            K = cfg.mm.num_image_tokens
            gen_embeds: List[np.ndarray] = []
            seq = embeds
            for _ in range(K):
                h = model.model(inputs_embeds=seq).last_hidden_state[0, -1]
                z = head(h[None])                         # [1, Dv]
                if cfg.mm.normalize_vision:
                    z = z / torch.clamp(z.norm(dim=-1, keepdim=True), min=1e-12)
                gen_embeds.append(z[0].numpy())
                nxt = proj(z)[None]                       # [1, 1, D]
                seq = torch.cat([seq, nxt], dim=1)
            # after 64 emissions the loop exits image mode; take a few plain
            # greedy steps so the post-image ids compare too
            answer_ids = []
            for _ in range(4):
                logits = model(inputs_embeds=seq).logits[0, -1]
                tok = int(torch.argmax(logits))
                if tok in LLAMA3_EOS_IDS:
                    break
                if tok not in (IM_START_TOKEN_ID, IM_END_TOKEN_ID):
                    answer_ids.append(tok)
                seq = torch.cat([seq, embed_table(torch.tensor([[tok]]))], dim=1)
            return {"answer_ids": answer_ids, "prompt_logits": logits_prompt,
                    "gen_embeds": np.stack(gen_embeds).astype(np.float32)}
        # full-recompute greedy, text-only (stop at image mode like the demo
        # VQA flow; answers are text)
        answer_ids: List[int] = []
        margins: List[float] = []   # top1-top2 logit gap per greedy step
        seq = embeds
        for _ in range(max_new_tokens):
            logits = model(inputs_embeds=seq).logits[0, -1]
            top2 = torch.topk(logits, 2).values
            margins.append(float(top2[0] - top2[1]))
            tok = int(torch.argmax(logits))
            if tok in LLAMA3_EOS_IDS or tok == IM_START_TOKEN_ID:
                break
            if tok != IM_END_TOKEN_ID:
                answer_ids.append(tok)
            seq = torch.cat([seq, embed_table(torch.tensor([[tok]]))], dim=1)
    return {"answer_ids": answer_ids, "prompt_logits": logits_prompt,
            "margins": margins}


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def evaluate_rows(rows: Sequence[Dict[str, Any]], our_fn, ref_fn=None,
                  detokenize: Optional[Callable[[List[int]], str]] = None,
                  cosine_threshold: float = 0.99,
                  cosine_only: bool = False) -> Dict[str, Any]:
    """Compare our outputs against reference answers (from the JSONL) and,
    when ref_fn is given, against a live reference run (answers + logits)."""
    n = exact = norm = 0
    cosines: List[float] = []
    margins: List[float] = []
    gen_cosines: List[float] = []   # per-token cosine of emitted visual embeds
    n_gen = 0
    last_gen_embeds: Optional[np.ndarray] = None
    vqa_acc_sum, n_multi = 0.0, 0
    for row in rows:
        ours = our_fn(row)
        our_text = detokenize(ours["answer_ids"]) if detokenize else " ".join(
            map(str, ours["answer_ids"]))
        if "gen_embeds" in ours:
            n_gen += 1
            last_gen_embeds = ours["gen_embeds"]
        if ref_fn is not None:
            ref = ref_fn(row)
            ref_text = detokenize(ref["answer_ids"]) if detokenize else " ".join(
                map(str, ref["answer_ids"]))
            cos = logit_cosine(ours["prompt_logits"], ref["prompt_logits"])
            cosines.append(cos["mean"])
            margins.extend(ref.get("margins", []))
            if "gen_embeds" in ref and "gen_embeds" in ours:
                a, b = ours["gen_embeds"], ref["gen_embeds"]
                m = min(len(a), len(b))
                if len(a) != len(b):
                    gen_cosines.append(0.0)  # emission-count mismatch = fail
                if m:
                    num = (a[:m] * b[:m]).sum(-1)
                    den = np.maximum(np.linalg.norm(a[:m], axis=-1)
                                     * np.linalg.norm(b[:m], axis=-1), 1e-12)
                    gen_cosines.extend((num / den).tolist())
        else:
            ref_text = row.get("answer", "")
        n += 1
        exact += int(our_text.strip() == ref_text.strip())
        norm += int(normalize_answer(our_text) == normalize_answer(ref_text))
        # task-level VQAv2 accuracy when the row carries the 10 human answers:
        # acc = min(#matching-annotators / 3, 1) (the standard VQA metric)
        answers = row.get("answers")
        if answers:
            n_multi += 1
            matches = sum(normalize_answer(a) == normalize_answer(our_text)
                          for a in answers)
            vqa_acc_sum += min(matches / 3.0, 1.0)
    result = {
        "metric": "vqa_answer_parity",
        "n": n,
        "exact_match": exact / max(n, 1),
        "normalized_match": norm / max(n, 1),
    }
    if n_multi:
        result["vqa_accuracy"] = vqa_acc_sum / n_multi
        result["n_multi_annotator"] = n_multi
    if margins:
        # fp32-reference greedy top1-top2 logit gaps: documents whether the
        # model's answers are decisive (large gaps -> int8 noise cannot flip
        # the argmax; the trained-parity int8 row relies on this)
        result["ref_margin_min"] = float(np.min(margins))
        result["ref_margin_mean"] = float(np.mean(margins))
    if n_gen:
        result["n_generation_rows"] = n_gen
        result["last_gen_embeds_shape"] = (list(last_gen_embeds.shape)
                                           if last_gen_embeds is not None
                                           else None)
    if gen_cosines:
        # generation-mode parity: cosine per emitted 1152-d visual token
        # between our KV-cache image-mode loop and the torch full-recompute
        # reference loop (`metamorph_llama.py:547-574`)
        result["gen_embed_cosine_mean"] = float(np.mean(gen_cosines))
        result["gen_embed_cosine_min"] = float(np.min(gen_cosines))
    if cosines:
        result["mean_logit_cosine"] = float(np.mean(cosines))
        result["min_logit_cosine"] = float(np.min(cosines))
        # cosine_only: the bar for LOSSY paths (int8 weight-only quant) —
        # with random weights the argmax margins are noise-thin and
        # quantization legitimately flips tokens; the implementation is
        # certified by the logit direction, answer match stays informational
        result["pass"] = (result["min_logit_cosine"] >= cosine_threshold
                          and (cosine_only
                               or result["normalized_match"] == 1.0)
                          and (not gen_cosines
                               or result["gen_embed_cosine_min"]
                               >= cosine_threshold))
        result["criterion"] = ("min_logit_cosine" if cosine_only
                               else "cosine+answers")
    else:
        result["pass"] = result["normalized_match"] == 1.0
    return result


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", default=None,
                   help="exported framework checkpoint dir (else raw HF init)")
    p.add_argument("--llama", default=None, help="HF LLaMA-3 weights dir")
    p.add_argument("--siglip", default=None, help="HF SigLIP weights dir")
    p.add_argument("--tokenizer", required=True, help="HF tokenizer dir")
    p.add_argument("--eval-jsonl", required=True)
    p.add_argument("--torch-reference", action="store_true",
                   help="also run the torch reference path and compare logits")
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--cosine-threshold", type=float, default=0.99)
    p.add_argument("--int8", action="store_true",
                   help="evaluate the int8 weight-only decode path "
                        "(ops/quant.py) — certifies quantized serving "
                        "quality against the same reference")
    p.add_argument("--cosine-only", action="store_true",
                   help="pass criterion = logit cosine only (for lossy "
                        "paths like --int8, where random-weight argmax "
                        "margins make exact answer match meaningless)")
    p.add_argument("--forward-only", action="store_true",
                   help="compare prompt logits only (no greedy loop) — for "
                        "8B-geometry certification on hosts where an "
                        "autoregressive CPU loop is impractical")
    p.add_argument("--cpu", action="store_true",
                   help="force the JAX CPU backend (numeric parity needs "
                        "fp32 matmuls; TPU defaults fp32 inputs to bf16)")
    p.add_argument("--bf16", action="store_true",
                   help="load OUR params in bfloat16 (torch reference stays "
                        "fp32) — certifies the production activation dtype "
                        "on-chip: rope/silu in bf16 (models/llama.py:103-160) "
                        "and MXU bf16 matmuls, vs the fp32 truth")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from metamorph_tpu.constants import (DEFAULT_IM_END_TOKEN,
                                         DEFAULT_IM_START_TOKEN)
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    tok.add_tokens([DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN],
                   special_tokens=True)
    tokenize = lambda s: tok(s).input_ids  # noqa: E731
    detok = lambda ids: tok.decode(ids, skip_special_tokens=True)  # noqa: E731

    dt = jnp.bfloat16 if args.bf16 else jnp.float32

    if args.model_path:
        from metamorph_tpu.inference.loader import load_pretrained_model

        params, cfg = load_pretrained_model(args.model_path,
                                            dtype=dt,
                                            hf_siglip_path=args.siglip)
    else:
        import dataclasses

        from metamorph_tpu.config import MetaMorphConfig
        from metamorph_tpu.models.hf_import import (llama_config_from_hf,
                                                    llama_params_from_hf,
                                                    load_safetensors_dir,
                                                    siglip_params_from_hf)
        from metamorph_tpu.models.metamorph import init_metamorph_params

        cfg = MetaMorphConfig()
        if args.llama:  # geometry comes from the HF dir, not the default 8B
            cfg = dataclasses.replace(cfg,
                                      llama=llama_config_from_hf(args.llama))
        params = init_metamorph_params(jax.random.PRNGKey(0), cfg, dt)
        if args.llama:
            params["llama"] = llama_params_from_hf(
                load_safetensors_dir(args.llama), cfg.llama, dt)
        if args.siglip:
            params["siglip"] = siglip_params_from_hf(
                load_safetensors_dir(args.siglip), cfg.siglip, dt)

    if args.int8:
        from metamorph_tpu.ops.quant import quantize_llama_decode

        params = dict(params)
        params["llama"] = quantize_llama_decode(params["llama"])

    def load_frames(row):
        """Row media: "image" (one path), "images" (list — multi-image
        prompts), or "video" (file sampled at 1 FPS like the reference demo,
        `inference/demo.py:29-43`)."""
        if row.get("video"):
            from metamorph_tpu.inference.demo import load_frames as lf

            return lf(row["video"], max_frames=4)
        paths = row.get("images") or ([row["image"]] if row.get("image") else [])
        if not paths:
            return []
        from PIL import Image

        return [np.asarray(Image.open(pth).convert("RGB")) for pth in paths]

    def our_fn(row):
        return our_vqa(params, cfg, tokenize, load_frames(row),
                       row["question"], args.max_new_tokens,
                       forward_only=args.forward_only,
                       generate_image=bool(row.get("generate")))

    ref_fn = None
    if args.torch_reference:
        if not args.llama:
            p.error("--torch-reference requires --llama (and --siglip for images)")

        def ref_fn(row):  # noqa: F811
            return torch_reference_vqa(args.llama, args.siglip, params, cfg,
                                       tokenize, load_frames(row),
                                       row["question"], args.max_new_tokens,
                                       forward_only=args.forward_only,
                                       generate_image=bool(row.get("generate")))

    rows = [json.loads(l) for l in open(args.eval_jsonl) if l.strip()]
    result = evaluate_rows(rows, our_fn, ref_fn, detok, args.cosine_threshold,
                           cosine_only=args.cosine_only)
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
