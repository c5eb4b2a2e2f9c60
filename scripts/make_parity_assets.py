#!/usr/bin/env python
"""Build offline parity assets for eval/answer_parity.py --torch-reference.

Real LLaMA-3.1-8B / SigLIP-SO400M / SD-1.5 weights are not obtainable in this
environment (no network egress, no local HF cache). The strongest offline
certification is implementation parity at TRUE model geometry against REAL
`transformers` modeling code: this script materializes

  * an HF-format LLaMA dir (config.json + model.safetensors) at a chosen
    geometry (8b = LLaMA-3.1-8B incl. rope-llama3 scaling; 1b; 300m) with
    random weights, loadable by `LlamaForCausalLM.from_pretrained`;
  * an HF-format SigLIP vision dir at the real SO400M-patch14-384 geometry,
    loadable by `SiglipVisionModel.from_pretrained`;
  * a 128256-entry word-level tokenizer dir (AutoTokenizer-loadable) so the
    <image_start>/<image_end> add_tokens land on ids 128256/128257 exactly
    like the reference's resize (`metamorph_arch.py:427-446`);
  * a synthetic VQA JSONL (+ PNG images).

Both parity sides then share these weights bit-for-bit, so any divergence is
an implementation bug, not model noise — the same property a real-weights run
would certify, minus tokenizer BPE edge cases (recorded in ROADMAP).

    python scripts/make_parity_assets.py --out /tmp/parity --llm 300m --rows 20
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def llm_config(size: str):
    from metamorph_tpu.config import LlamaConfig

    if size == "8b":
        return LlamaConfig()  # defaults are LLaMA-3.1-8B
    if size == "8b2l":
        # full 8B PER-LAYER geometry (D/F/H/KV/Dh/128k-vocab/rope-llama3
        # identical) at 2 layers: certifies the 8B-specific math/layout risks
        # (RoPE-3.1 at Dh=128, GQA 32/8, HF transposes at real shapes) on a
        # host whose kernel zeroes large anonymous memory at ~10 MB/s — the
        # true-32-layer fp32 pair (64 GB resident) is hours of page faults
        return dataclasses.replace(LlamaConfig(), num_layers=2)
    if size == "1b":
        return LlamaConfig(hidden_size=2048, intermediate_size=8192,
                           num_layers=16, num_heads=32, num_kv_heads=8,
                           head_dim=64)
    if size == "300m":
        return LlamaConfig(hidden_size=1024, intermediate_size=4096,
                           num_layers=12, num_heads=16, num_kv_heads=8,
                           head_dim=64)
    raise SystemExit(f"unknown --llm {size}")


def write_llama_dir(out, cfg, seed):
    """Generate the HF-layout tensors DIRECTLY with numpy (iid normals are
    layout-invariant, so this matches init_llama_params' distribution without
    materializing a jax tree + per-slice transposed copies — the jax route
    took hours at 8B on this 1-core host)."""
    from safetensors.numpy import save_file

    from metamorph_tpu.models.hf_import import llama_config_to_hf

    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    D, F = cfg.hidden_size, cfg.intermediate_size
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def w(shape, fan_in):
        return (rng.standard_normal(shape, np.float32)
                * np.float32(fan_in ** -0.5))

    tensors = {"model.embed_tokens.weight": w((cfg.vocab_size, D), D),
               "model.norm.weight": np.ones((D,), np.float32)}
    if not cfg.tie_word_embeddings:
        tensors["lm_head.weight"] = w((cfg.vocab_size, D), D)
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        tensors[p + "self_attn.q_proj.weight"] = w((H * Dh, D), D)
        tensors[p + "self_attn.k_proj.weight"] = w((KV * Dh, D), D)
        tensors[p + "self_attn.v_proj.weight"] = w((KV * Dh, D), D)
        tensors[p + "self_attn.o_proj.weight"] = w((D, H * Dh), H * Dh)
        tensors[p + "mlp.gate_proj.weight"] = w((F, D), D)
        tensors[p + "mlp.up_proj.weight"] = w((F, D), D)
        tensors[p + "mlp.down_proj.weight"] = w((D, F), F)
        tensors[p + "input_layernorm.weight"] = np.ones((D,), np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.ones((D,),
                                                                 np.float32)
    save_file(tensors, os.path.join(out, "model.safetensors"))
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump(llama_config_to_hf(cfg), f, indent=1)


def write_siglip_dir(out, params, cfg):
    from safetensors.numpy import save_file

    from metamorph_tpu.models.hf_import import siglip_params_to_hf

    os.makedirs(out, exist_ok=True)
    tensors = siglip_params_to_hf(params, cfg)
    save_file({k: np.ascontiguousarray(v, np.float32)
               for k, v in tensors.items()},
              os.path.join(out, "model.safetensors"))
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump({
            "architectures": ["SiglipVisionModel"],
            "model_type": "siglip_vision_model",
            "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "image_size": cfg.image_size,
            "patch_size": cfg.patch_size,
            "layer_norm_eps": cfg.layer_norm_eps,
            "hidden_act": "gelu_pytorch_tanh",
            "num_channels": 3,
            "torch_dtype": "float32",
        }, f, indent=1)


WORDS = ("what is in this image describe the color shape animal object "
         "scene a an the cat dog car tree red blue green small large "
         "answer question picture show tell me about of and or on under "
         "user assistant system you are helpful").split()


def write_tokenizer_dir(out):
    """Word-level tokenizer with EXACTLY 128256 base entries, so the
    harness's add_tokens([<image_start>, <image_end>]) lands on 128256/7."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<unk>": 0, "<|begin_of_text|>": 1, "<|end_of_text|>": 2,
             "<|start_header_id|>": 3, "<|end_header_id|>": 4,
             "<|eot_id|>": 5}
    for w in WORDS:
        vocab.setdefault(w, len(vocab))
    for ch in "abcdefghijklmnopqrstuvwxyz0123456789.,?!:;|<>_-":
        vocab.setdefault(ch, len(vocab))
    i = 0
    while len(vocab) < 128256:
        vocab.setdefault(f"tok_{i}", len(vocab))
        i += 1
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>",
        bos_token="<|begin_of_text|>", eos_token="<|end_of_text|>")
    os.makedirs(out, exist_ok=True)
    fast.save_pretrained(out)


def _synth_image(rng, i, img_dir):
    """Structured synthetic image: gradient + random rectangles."""
    from PIL import Image

    h = w = 384
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None]
    img[..., 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    for _ in range(4):
        y, x = rng.integers(0, h - 64), rng.integers(0, w - 64)
        img[y:y + 64, x:x + 64] = rng.integers(0, 255, (3,))
    path = os.path.join(img_dir, f"img_{i}.png")
    Image.fromarray(img).save(path)
    return path


def _synth_video(rng, img_dir, seconds=3, fps=4):
    """Short synthetic video (moving square over a gradient) — exercises the
    1-FPS frame-sampling path (`inference/demo.py:29-43`)."""
    import cv2

    h = w = 256
    path = os.path.join(img_dir, "vid_0.avi")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    base = np.zeros((h, w, 3), np.uint8)
    base[..., 2] = np.linspace(0, 255, w, dtype=np.uint8)[None]
    n = seconds * fps
    for t in range(n):
        fr = base.copy()
        x = int((w - 48) * t / max(n - 1, 1))
        fr[96:144, x:x + 48] = (255, 255, 0)
        vw.write(fr)
    vw.release()
    return path


def write_eval_rows(out_dir, n_rows, seed, with_images=True):
    """>= n_rows mixed-kind parity prompts. Kinds cycle over: text-only,
    single-image, two-image, three-image, video (1-FPS sampled), and
    image-GENERATION rows (the continuous-emission loop is certified on these
    — `inference/demo.py:116-180`, `metamorph_llama.py:547-574`)."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    video_path = _synth_video(rng, img_dir) if with_images else None
    rows = []
    for i in range(n_rows):
        row = {"question": " ".join(
            rng.choice(WORDS, size=int(rng.integers(3, 9))).tolist())}
        kind = i % 6
        if with_images and kind == 1:
            row["image"] = _synth_image(rng, i, img_dir)
        elif with_images and kind == 2:
            row["images"] = [_synth_image(rng, f"{i}_{j}", img_dir)
                             for j in range(2)]
        elif with_images and kind == 3:
            row["images"] = [_synth_image(rng, f"{i}_{j}", img_dir)
                             for j in range(3)]
        elif with_images and kind == 4:
            row["video"] = video_path
        elif with_images and kind == 5:
            row["generate"] = True
            if (i // 6) % 2 == 1:   # alternate text-only / image-conditioned
                row["image"] = _synth_image(rng, i, img_dir)
        rows.append(row)
    path = os.path.join(out_dir, "eval.jsonl")
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return path


def write_demo_assets(out_dir, lcfg, scfg, seed):
    """Framework checkpoint dir + SD-1.5-geometry visualizer dir so
    `inference/demo.py` runs end-to-end to a PNG with no external weights."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from metamorph_tpu.config import MetaMorphConfig
    from metamorph_tpu.inference.loader import save_visualizer
    from metamorph_tpu.models.metamorph import init_metamorph_params
    from metamorph_tpu.train.checkpoint import export_hf
    from metamorph_tpu.visualizer.adapter import init_adapter
    from metamorph_tpu.visualizer.unet import UNetConfig, init_unet_params
    from metamorph_tpu.visualizer.vae import VAEConfig, init_vae_params

    cfg = MetaMorphConfig()
    cfg = dataclasses.replace(cfg, llama=lcfg, siglip=scfg)
    params = init_metamorph_params(jax.random.PRNGKey(seed), cfg,
                                   jnp.bfloat16)
    ck = os.path.join(out_dir, "framework_ckpt")
    export_hf(ck, params, cfg)
    ucfg, vcfg = UNetConfig(), VAEConfig()   # real SD-1.5 geometry
    adapter = init_adapter(jax.random.PRNGKey(seed + 7), mode="mlp",
                           output_dim=ucfg.cross_attention_dim,
                           num_tokens=cfg.mm.num_image_tokens,
                           dtype=jnp.bfloat16)
    unet = init_unet_params(jax.random.PRNGKey(seed + 8), ucfg, jnp.bfloat16)
    vae = init_vae_params(jax.random.PRNGKey(seed + 9), vcfg, jnp.bfloat16)
    vz = os.path.join(out_dir, "visualizer")
    save_visualizer(vz, adapter, unet, vae, ucfg, vcfg, "mlp")
    return ck, vz


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--llm", default="300m", choices=["8b", "8b2l", "1b", "300m"])
    p.add_argument("--rows", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-images", action="store_true")
    p.add_argument("--demo-assets", action="store_true",
                   help="also write a framework checkpoint + SD-1.5-geometry "
                        "visualizer dir for an end-to-end demo run")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from metamorph_tpu.config import SiglipConfig
    from metamorph_tpu.models.siglip import init_siglip_params

    lcfg = llm_config(args.llm)
    scfg = SiglipConfig()  # real SO400M-patch14-384 geometry
    # modest init scale keeps fp32 activations tame through 27+12 layers
    write_llama_dir(os.path.join(args.out, "llama"), lcfg, args.seed)
    siglip = init_siglip_params(jax.random.PRNGKey(args.seed + 1), scfg,
                                dtype=jnp.float32)
    write_siglip_dir(os.path.join(args.out, "siglip"), siglip, scfg)
    del siglip
    write_tokenizer_dir(os.path.join(args.out, "tokenizer"))
    rows = write_eval_rows(args.out, args.rows, args.seed,
                           with_images=not args.no_images)
    if args.demo_assets:
        write_demo_assets(args.out, lcfg, scfg, args.seed)
    D, F, L = lcfg.hidden_size, lcfg.intermediate_size, lcfg.num_layers
    per_layer = (D * (lcfg.num_heads + 2 * lcfg.num_kv_heads) * lcfg.head_dim
                 + lcfg.num_heads * lcfg.head_dim * D + 3 * D * F + 2 * D)
    total = lcfg.vocab_size * D * 2 + L * per_layer + D
    print(json.dumps({"llama": os.path.join(args.out, "llama"),
                      "siglip": os.path.join(args.out, "siglip"),
                      "tokenizer": os.path.join(args.out, "tokenizer"),
                      "eval_jsonl": rows, "llm_geometry": args.llm,
                      "llm_params_b": round(total / 1e9, 2)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
