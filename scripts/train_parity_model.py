#!/usr/bin/env python
"""Train the 300m parity model to DECISIVE logit margins, then export it.

PARITY_r03's int8 row passed only on logit cosine: with random weights the
argmax margins are noise-thin and weight quantization legitimately flips
tokens, so exact answer match was meaningless. This script closes that by
briefly training the parity model (ON the local TPU chip — a 300m CPU step
takes >100 s on this 1-core host; the chip does it in milliseconds) on a
synthetic copy-task VQA distribution until the answers are decisively peaked,
then exports a full HF-layout checkpoint (`train/checkpoint.export_hf`) that
BOTH parity sides share bit-for-bit. `eval/answer_parity.py --int8` can then
demand exact_match == 1.0 — the same criterion as the bf16 row.

The task: question = a few random words; answer = "<first> <last>" of the
question (a copy task: varies per row, so a splice/decode bug still breaks
parity; learnable to ~zero loss in a few hundred steps). Half the rows carry
a synthetic image through the full SigLIP->projector->splice path (decisive
answers must survive fused image context). Data flows through the REAL L5
stack: LazySupervisedDataset -> preprocess_llama3 (BPE tokenizer) ->
PackedCollator -> train_step.

    python scripts/train_parity_model.py \
        --assets /tmp/metamorph_parity/300m \
        --tokenizer /tmp/metamorph_parity/tokenizer_bpe \
        --out /tmp/metamorph_parity/300m_trained
"""

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = ("what is in this image describe the color shape animal object "
         "scene cat dog car tree red blue green small large answer "
         "question picture show tell me about of and or on under").split()


def synth_image(rng):
    h = w = 384
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None]
    img[..., 2] = np.linspace(255, 0, h, dtype=np.uint8)[:, None]
    for _ in range(3):
        y, x = rng.integers(0, h - 64), rng.integers(0, w - 64)
        img[y:y + 64, x:x + 64] = rng.integers(0, 255, 3)
    return img


def make_rows(out_dir, n, seed, tag):
    """Copy-task rows: answer = '<first> <last>' of the question."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(out_dir, f"images_{tag}")
    os.makedirs(img_dir, exist_ok=True)
    rows = []
    for i in range(n):
        words = rng.choice(WORDS, size=int(rng.integers(3, 8))).tolist()
        q = " ".join(words)
        a = f"{words[0]} {words[-1]}"
        row = {"id": f"{tag}{i}",
               "conversations": [
                   {"from": "human", "value": ("<image>\n" if i % 2 == 0
                                               else "") + q},
                   {"from": "gpt", "value": a}]}
        if i % 2 == 0:
            path = os.path.join(img_dir, f"{i}.png")
            Image.fromarray(synth_image(rng)).save(path)
            row["image"] = path
        rows.append(row)
    path = os.path.join(out_dir, f"{tag}.jsonl")
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return path, rows


def siglip_cfg_from_dir(siglip_dir):
    from metamorph_tpu.config import SiglipConfig

    with open(os.path.join(siglip_dir, "config.json")) as f:
        hf = json.load(f)
    return SiglipConfig(
        image_size=hf["image_size"], patch_size=hf["patch_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"], num_heads=hf["num_attention_heads"],
        layer_norm_eps=hf.get("layer_norm_eps", 1e-6))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--assets", required=True,
                   help="parity assets dir (llama/ siglip/ from "
                        "make_parity_assets.py)")
    p.add_argument("--tokenizer", required=True, help="BPE tokenizer dir")
    p.add_argument("--out", required=True)
    p.add_argument("--rows", type=int, default=256)
    p.add_argument("--eval-rows", type=int, default=24)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seqlen", type=int, default=160)
    p.add_argument("--stop-loss", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force CPU (tiny geometries / tests only)")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from metamorph_tpu.config import (MetaMorphConfig, MultimodalConfig,
                                      TrainConfig)
    from metamorph_tpu.constants import (DEFAULT_IM_END_TOKEN,
                                         DEFAULT_IM_START_TOKEN)
    from metamorph_tpu.models.hf_import import (llama_config_from_hf,
                                                llama_params_from_hf,
                                                load_safetensors_dir,
                                                siglip_params_from_hf)
    from metamorph_tpu.models.metamorph import init_metamorph_params
    from metamorph_tpu.train.checkpoint import export_hf
    from metamorph_tpu.train.data import (DataConfig, DataIterator,
                                          LazySupervisedDataset, PackedCollator)
    from metamorph_tpu.train.optimizer import make_optimizer
    from metamorph_tpu.train.train_step import init_train_state, train_step

    os.makedirs(args.out, exist_ok=True)
    llama_dir = os.path.join(args.assets, "llama")
    siglip_dir = os.path.join(args.assets, "siglip")
    scfg = siglip_cfg_from_dir(siglip_dir)
    cfg = MetaMorphConfig(
        llama=llama_config_from_hf(llama_dir),
        siglip=scfg,
        mm=MultimodalConfig(num_image_tokens=64),
        train=TrainConfig(
            learning_rate=args.lr, total_steps=args.steps,
            batch_size=args.batch, max_seq_len=args.seqlen,
            max_images_per_batch=args.batch, remat=False,
            warmup_ratio=0.05, weight_decay=0.0),
    )

    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    tok.add_tokens([DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN],
                   special_tokens=True)
    tokenize = lambda s: tok(s).input_ids  # noqa: E731

    train_jsonl, _ = make_rows(args.out, args.rows, args.seed, "train")
    # held-out rows from the SAME distribution for the parity eval (answer
    # field informational; --torch-reference compares live)
    _, eval_rows = make_rows(args.out, args.eval_rows, args.seed + 9999,
                             "eval")
    with open(os.path.join(args.out, "eval_trained.jsonl"), "w") as f:
        for r in eval_rows:
            q = r["conversations"][0]["value"].replace("<image>\n", "")
            f.write(json.dumps({
                "image": r.get("image"), "question": q,
                "answer": r["conversations"][1]["value"]}) + "\n")

    dcfg = DataConfig(data_path=train_jsonl, image_size=scfg.image_size,
                      model_max_length=args.seqlen)
    ds = LazySupervisedDataset(train_jsonl, tokenize, dcfg, seed=args.seed)
    col = PackedCollator(num_image_tokens=cfg.mm.num_image_tokens,
                         max_seq_len=args.seqlen,
                         num_image_slots=args.batch,
                         image_size=scfg.image_size)
    it = iter(DataIterator(ds, col, args.batch, seed=args.seed))

    t0 = time.time()
    # bf16 params (production dtype; fp32 params + fp32 Adam moments for
    # 300m LLaMA + SO400M SigLIP exceed a 16GB v5e); the export upcasts to
    # fp32 bit-exactly, so both parity sides still share identical weights
    dt = jnp.float32 if args.cpu else jnp.bfloat16
    params = init_metamorph_params(jax.random.PRNGKey(args.seed), cfg,
                                   dtype=dt)
    params["llama"] = llama_params_from_hf(
        load_safetensors_dir(llama_dir), cfg.llama, dt)
    params["siglip"] = siglip_params_from_hf(
        load_safetensors_dir(siglip_dir), scfg, dt)
    state = init_train_state(params, cfg)
    tx = make_optimizer(cfg.train, params)
    step_fn = jax.jit(functools.partial(train_step, cfg=cfg, tx=tx))
    print(f"init: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    from metamorph_tpu.multimodal.packing import batch_to_arrays

    loss = float("nan")
    n_steps = 0
    for i in range(args.steps):
        packed, pixels = next(it)
        batch = {k: jnp.asarray(v) for k, v in batch_to_arrays(packed).items()}
        state, metrics = step_fn(state, batch, jnp.asarray(pixels))
        n_steps = i + 1
        if i % 20 == 0 or i == args.steps - 1:
            loss = float(metrics["loss"])
            print(f"step {i} loss {loss:.4f} "
                  f"lang {float(metrics['loss_language']):.4f}",
                  file=sys.stderr, flush=True)
            if not np.isfinite(loss):
                raise SystemExit("loss diverged")
            if float(metrics["loss_language"]) < args.stop_loss and i > 40:
                break

    params = jax.device_get(state["params"])
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    export_hf(args.out, params, cfg, tokenizer_dir=args.tokenizer)
    print(json.dumps({"out": args.out, "steps": n_steps,
                      "final_loss": round(loss, 5),
                      "eval_jsonl": os.path.join(args.out,
                                                 "eval_trained.jsonl")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
