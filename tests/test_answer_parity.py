"""Answer-parity harness test: our fused-forward + KV greedy vs the torch
reference pipeline (tiny random-weight HF models saved to disk), full loop —
weights dir -> prompt -> logit cosine + answer match (BASELINE north-stars
2/3 at tiny scale)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig)
from metamorph_tpu.eval.answer_parity import (evaluate_rows, logit_cosine,
                                              normalize_answer, our_vqa,
                                              torch_reference_vqa)


def fake_tokenize(s):
    return [10 + (hash(w) % 400) for w in s.split()]


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Tiny HF LLaMA + SigLIP saved to disk + our imported params."""
    d = tmp_path_factory.mktemp("parity")
    from transformers import (LlamaConfig as HFLlamaConfig, LlamaForCausalLM,
                              SiglipVisionConfig, SiglipVisionModel)

    torch.manual_seed(0)
    hf_llama = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, attention_bias=False,
        tie_word_embeddings=False)).eval()
    hf_llama.save_pretrained(d / "llama")
    torch.manual_seed(1)
    hf_sig = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        layer_norm_eps=1e-6)).eval()
    hf_sig.save_pretrained(d / "siglip")

    cfg = MetaMorphConfig(
        llama=LlamaConfig(vocab_size=512, hidden_size=64,
                          intermediate_size=128, num_layers=2, num_heads=4,
                          num_kv_heads=2, head_dim=16, rope_theta=10000.0,
                          rope_scaling=False, tie_word_embeddings=False),
        siglip=SiglipConfig(image_size=28, patch_size=14, hidden_size=32,
                            intermediate_size=64, num_layers=2, num_heads=4),
        mm=MultimodalConfig(num_image_tokens=4),
        train=TrainConfig(max_seq_len=64))

    from metamorph_tpu.models.hf_import import (llama_params_from_hf,
                                                load_safetensors_dir,
                                                siglip_params_from_hf)
    from metamorph_tpu.models.metamorph import init_metamorph_params

    params = init_metamorph_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    params["llama"] = llama_params_from_hf(
        load_safetensors_dir(str(d / "llama")), cfg.llama, jnp.float32)
    params["siglip"] = siglip_params_from_hf(
        load_safetensors_dir(str(d / "siglip")), cfg.siglip, jnp.float32)
    return d, cfg, params


def test_normalize_answer():
    assert normalize_answer("The  Cat.") == "cat"
    assert normalize_answer("a red apple!") == "red apple"


def test_logit_cosine_identity():
    x = np.random.default_rng(0).normal(size=(5, 100))
    out = logit_cosine(x, x)
    assert out["min"] > 0.999999


def test_full_model_answer_parity(assets):
    """Our TPU path vs the torch reference path, same weights: logit cosine
    >= 0.99 and greedy answers identical — the north-star contract."""
    d, cfg, params = assets
    img = np.random.default_rng(3).integers(0, 256, (40, 50, 3)).astype(np.uint8)
    rows = [
        {"frames": [img], "question": "what is in this image"},
        {"frames": [], "question": "say something"},
    ]

    def our_fn(row):
        return our_vqa(params, cfg, fake_tokenize, row["frames"],
                       row["question"], max_new_tokens=5)

    def ref_fn(row):
        return torch_reference_vqa(str(d / "llama"), str(d / "siglip"),
                                   params, cfg, fake_tokenize, row["frames"],
                                   row["question"], max_new_tokens=5)

    result = evaluate_rows(rows, our_fn, ref_fn)
    assert result["n"] == 2
    assert result["min_logit_cosine"] >= 0.99, result
    assert result["exact_match"] == 1.0, result
    assert result["normalized_match"] == 1.0
    assert result["pass"] is True
    json.dumps(result)  # one-line JSON serializable


def test_generation_mode_parity(assets):
    """Image-GENERATION parity: both sides run the continuous-emission loop
    (vision_head -> L2-norm -> projector feedback) from a forced image-mode
    start and the emitted K visual embeddings must match (cosine >= 0.99) —
    the `metamorph_llama.py:547-574` / `:363-377` loop under our KV cache vs
    the torch full-recompute loop."""
    d, cfg, params = assets
    img = np.random.default_rng(5).integers(0, 256, (40, 50, 3)).astype(np.uint8)
    rows = [
        {"frames": [], "question": "draw me something", "generate": True},
        {"frames": [img], "question": "make a similar image", "generate": True},
        {"frames": [img, img], "question": "compare these two pictures"},
    ]

    def our_fn(row):
        return our_vqa(params, cfg, fake_tokenize, row["frames"],
                       row["question"], max_new_tokens=5,
                       generate_image=bool(row.get("generate")))

    def ref_fn(row):
        return torch_reference_vqa(str(d / "llama"), str(d / "siglip"),
                                   params, cfg, fake_tokenize, row["frames"],
                                   row["question"], max_new_tokens=5,
                                   generate_image=bool(row.get("generate")))

    result = evaluate_rows(rows, our_fn, ref_fn)
    assert result["n"] == 3
    assert result["n_generation_rows"] == 2
    assert result["gen_embed_cosine_min"] >= 0.99, result
    assert result["last_gen_embeds_shape"] == [cfg.mm.num_image_tokens,
                                               cfg.siglip.hidden_size]
    assert result["pass"] is True, result
    json.dumps(result)
