"""Interactive demo CLI: image/video VQA + unified image generation.

Equivalent of `inference/demo.py:45-182`: load an image (or 1-FPS video
frames), build the LLaMA-3 prompt with <image_start><image><image_end>, run the
multimodal greedy decode, print the text, and render any generated 64-token
visual embedding chunks through the diffusion visualizer at several guidance
scales.

Usage:
    python -m metamorph_tpu.inference.demo --model-path CKPT \
        --tokenizer META_LLAMA3_TOKENIZER [--visualizer VIS_CKPT] \
        --image cat.jpg --prompt "What is in this image?"
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

import numpy as np

from metamorph_tpu.constants import (DEFAULT_IM_END_TOKEN, DEFAULT_IM_START_TOKEN,
                                     DEFAULT_IMAGE_TOKEN, IM_END_TOKEN_ID,
                                     IM_START_TOKEN_ID)


def load_frames(path: str, max_frames: int = 8) -> List[np.ndarray]:
    """Image file -> [1 frame]; video -> 1-FPS samples (`demo.py:29-43`)."""
    from metamorph_tpu.train.data import VIDEO_EXTS, decode_video_frames

    if any(path.endswith(e) for e in VIDEO_EXTS):
        frames, _ = decode_video_frames(path, cutoff=max_frames, interval_t=1)
        return frames
    from PIL import Image

    return [np.asarray(Image.open(path).convert("RGB"))]


def build_prompt(question: str, n_images: int) -> str:
    from metamorph_tpu.multimodal.conversation import conv_llama_3

    conv = conv_llama_3.copy()
    tags = (DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN + DEFAULT_IM_END_TOKEN) * n_images
    conv.append_message(conv.roles[0], tags + "\n" + question)
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--tokenizer", required=True,
                        help="HF tokenizer dir for LLaMA-3")
    parser.add_argument("--siglip", default=None, help="HF SigLIP weights dir")
    parser.add_argument("--visualizer", default=None)
    parser.add_argument("--image", required=True)
    parser.add_argument("--image-aspect-ratio", default="square",
                        choices=["square", "pad", "anyres"])
    parser.add_argument("--prompt", default="What is in this image?")
    parser.add_argument("--max-new-tokens", type=int, default=256)
    parser.add_argument("--spec-k", type=int, default=1,
                        help=">1 enables speculative decoding (prompt-lookup "
                             "drafts, exact verification; same output)")
    parser.add_argument("--draft-model", default=None,
                        help="HF dir of a small shared-vocab LLaMA: with "
                             "--spec-k > 1, drafts come from this model "
                             "instead of prompt-lookup (same output)")
    parser.add_argument("--render-scheduler", default="pndm",
                        choices=["pndm", "ddim", "dpmpp"],
                        help="dpmpp reaches pndm@50 quality at ~20 steps")
    parser.add_argument("--render-steps", type=int, default=50)
    parser.add_argument("--out-dir", default="./demo_out")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from metamorph_tpu.inference.decode import generate
    from metamorph_tpu.inference.loader import load_pretrained_model
    from metamorph_tpu.multimodal.mm_utils import (siglip_preprocess,
                                                   tokenizer_image_token)
    from metamorph_tpu.multimodal.packing import batch_to_arrays, pack_sequences

    params, cfg = load_pretrained_model(args.model_path,
                                        hf_siglip_path=args.siglip)

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    tok.add_tokens([DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN],
                   special_tokens=True)

    frames = load_frames(args.image)
    prompt = build_prompt(args.prompt, len(frames))
    ids = tokenizer_image_token(prompt, lambda s: tok(s).input_ids,
                                bos_token_id=tok.bos_token_id)

    if args.image_aspect_ratio == "anyres":
        from metamorph_tpu.multimodal.anyres import (build_batch_plan,
                                                     preprocess_anyres)

        S = cfg.siglip.image_size
        P = S // cfg.siglip.patch_size
        views, sizes = zip(*[
            preprocess_anyres(f, list(cfg.mm.image_grid_pinpoints), S)
            for f in frames])
        pixels = np.concatenate(views, axis=0)
        view_map, tokens_per_image = build_batch_plan(
            list(sizes), [v.shape[0] for v in views],
            list(cfg.mm.image_grid_pinpoints), S, P,
            cfg.mm.mm_patch_merge_type, capacity=pixels.shape[0] * (P * P + P))
        packed = pack_sequences([ids], None, cfg.mm.num_image_tokens,
                                len(ids) + sum(tokens_per_image), len(frames),
                                tokens_per_image=tokens_per_image,
                                gather_capacity=view_map.shape[0])
        import dataclasses as _dc

        packed = _dc.replace(packed, view_map=view_map)
    else:
        if args.image_aspect_ratio == "pad":
            from metamorph_tpu.multimodal.mm_utils import SIGLIP_MEAN, expand2square

            bg = tuple(int(x * 255) for x in SIGLIP_MEAN)
            frames = [expand2square(f, bg) for f in frames]
        pixels = np.stack([siglip_preprocess(f, cfg.siglip.image_size)
                           for f in frames])
        packed = pack_sequences([ids], None, cfg.mm.num_image_tokens,
                                len(ids) + len(frames) * cfg.mm.num_image_tokens,
                                len(frames))
    batch = {k: jnp.asarray(v) for k, v in batch_to_arrays(packed).items()}
    draft = None
    if args.draft_model:
        if args.spec_k <= 1:
            raise SystemExit("--draft-model requires --spec-k >= 2")
        import jax

        from metamorph_tpu.models.hf_import import load_hf_llama

        draft = load_hf_llama(args.draft_model,
                              jax.tree_util.tree_leaves(params)[0].dtype)
    out = generate(params, cfg, batch, jnp.asarray(pixels),
                   max_new_tokens=args.max_new_tokens, spec_k=args.spec_k,
                   draft=draft)

    n = int(out["n_ids"])
    gen_ids = [int(x) for x in np.asarray(out["ids"][:n])]
    text_ids = [i for i in gen_ids if i < 128000]
    print(tok.decode(text_ids, skip_special_tokens=True))

    n_img_tokens = int(out["n_image_tokens"])
    if n_img_tokens and args.visualizer:
        import jax

        from metamorph_tpu.inference.loader import load_visualization
        from metamorph_tpu.visualizer.pipeline import render_multi_scale

        adapter, unet, vae, unet_cfg, vae_cfg, mode = load_visualization(
            args.visualizer)
        K = cfg.mm.num_image_tokens
        os.makedirs(args.out_dir, exist_ok=True)
        embeds = np.asarray(out["image_embeds"][:n_img_tokens])
        for c in range(n_img_tokens // K):
            chunk = jnp.asarray(embeds[c * K:(c + 1) * K])[None]
            imgs = render_multi_scale(adapter, unet, vae, unet_cfg, vae_cfg,
                                      chunk, jax.random.PRNGKey(c),
                                      adapter_mode=mode,
                                      scheduler=args.render_scheduler,
                                      num_inference_steps=args.render_steps)
            from PIL import Image

            for gi in range(imgs.shape[1]):
                arr = (np.asarray(imgs[0, gi]) * 255).astype(np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(args.out_dir, f"gen_{c}_scale{gi}.png"))
        print(f"rendered {n_img_tokens // K} image(s) to {args.out_dir}")


if __name__ == "__main__":
    main()
