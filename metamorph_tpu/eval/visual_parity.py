"""Visual-token parity evaluator: our SigLIP pipeline vs the torch reference.

The BASELINE north-star requires visual-token cosine similarity >= 0.99 vs the
PyTorch reference. Given an HF `google/siglip-so400m-patch14-384` weights dir,
this tool runs the same image through:
  (a) our preprocess -> JAX tower -> 729->64 bilinear reduction -> L2 norm;
  (b) torch transformers SiglipVisionModel + torch F.interpolate reduction
      (exactly `siglip_encoder.py:138-213`);
and reports per-token cosine similarity.

    python -m metamorph_tpu.eval.visual_parity --siglip <hf-dir> --image cat.jpg
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def reference_visual_tokens(siglip_dir: str, pixels_nchw, num_tokens=64,
                            select_layer=-1, normalize=True):
    """Torch path (the reference pipeline)."""
    import torch
    import torch.nn.functional as F
    from transformers import SiglipVisionModel

    model = SiglipVisionModel.from_pretrained(siglip_dir).eval()
    with torch.no_grad():
        out = model(torch.from_numpy(pixels_nchw), output_hidden_states=True)
        feats = out.hidden_states[select_layer]
        b, n, d = feats.shape
        side = int(n ** 0.5)
        tgt = int(num_tokens ** 0.5)
        grid = feats.view(b, side, side, d).permute(0, 3, 1, 2)
        red = F.interpolate(grid.float(), size=(tgt, tgt), mode="bilinear",
                            align_corners=False)
        red = red.permute(0, 2, 3, 1).reshape(b, tgt * tgt, d)
        if normalize:
            red = F.normalize(red, p=2, dim=-1)
        return red.numpy()


def our_visual_tokens(siglip_dir: str, pixels_nhwc, cfg=None, mm=None):
    import jax
    import jax.numpy as jnp

    from metamorph_tpu.config import MultimodalConfig, SiglipConfig
    from metamorph_tpu.models.hf_import import (load_safetensors_dir,
                                                siglip_params_from_hf)
    from metamorph_tpu.models.siglip import vision_tower_forward

    cfg = cfg or SiglipConfig()
    mm = mm or MultimodalConfig(num_image_tokens=64, normalize_vision=True)
    tensors = load_safetensors_dir(siglip_dir)
    params = siglip_params_from_hf(tensors, cfg, dtype=jnp.float32)
    return np.asarray(vision_tower_forward(params, cfg, mm,
                                           jnp.asarray(pixels_nhwc)))


def cosine_parity(a: np.ndarray, b: np.ndarray) -> dict:
    a = a.reshape(-1, a.shape[-1]).astype(np.float64)
    b = b.reshape(-1, b.shape[-1]).astype(np.float64)
    a = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    b = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    cos = (a * b).sum(-1)
    return {"mean_cosine": float(cos.mean()), "min_cosine": float(cos.min()),
            "n_tokens": int(cos.shape[0])}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--siglip", required=True, help="HF SigLIP weights dir")
    p.add_argument("--image", default=None, help="image path (random if absent)")
    p.add_argument("--threshold", type=float, default=0.99)
    p.add_argument("--cpu", action="store_true",
                   help="force the JAX CPU backend (fp32 parity; TPU matmuls "
                        "default fp32 inputs to bf16)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from metamorph_tpu.multimodal.mm_utils import siglip_preprocess

    if args.image:
        from PIL import Image

        arr = np.asarray(Image.open(args.image).convert("RGB"))
    else:
        arr = np.random.default_rng(0).integers(0, 256, (480, 640, 3)).astype(np.uint8)
    px = siglip_preprocess(arr, 384)[None]            # [1, 384, 384, 3]
    ref = reference_visual_tokens(args.siglip, px.transpose(0, 3, 1, 2))
    ours = our_visual_tokens(args.siglip, px)
    result = cosine_parity(ours, ref)
    result["pass"] = result["min_cosine"] >= args.threshold
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
