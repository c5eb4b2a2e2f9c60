"""End-to-end visual-token parity on a tiny random SigLIP: our full pipeline
(jax) vs the torch reference pipeline must exceed the 0.99 cosine bar."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_tiny_siglip_pipeline_cosine(tmp_path):
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                                num_hidden_layers=2, num_attention_heads=4,
                                image_size=56, patch_size=14,
                                layer_norm_eps=1e-6)
    torch.manual_seed(0)
    model = SiglipVisionModel(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    from metamorph_tpu.config import MultimodalConfig, SiglipConfig
    from metamorph_tpu.eval.visual_parity import (cosine_parity,
                                                  our_visual_tokens,
                                                  reference_visual_tokens)

    cfg = SiglipConfig(image_size=56, patch_size=14, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=4)
    mm = MultimodalConfig(num_image_tokens=4, normalize_vision=True)

    px = np.random.default_rng(0).normal(size=(2, 56, 56, 3)).astype(np.float32)
    ours = our_visual_tokens(str(tmp_path), px, cfg, mm)
    ref = reference_visual_tokens(str(tmp_path), px.transpose(0, 3, 1, 2),
                                  num_tokens=4)
    result = cosine_parity(ours, ref)
    assert result["min_cosine"] >= 0.999, result
