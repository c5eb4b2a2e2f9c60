"""Logit-parity tests vs HF torch implementations (tiny random-weight models).

This is the SURVEY §7.2 requirement: HF-checkpoint import with per-layer
parity so real LLaMA-3 / SigLIP weights drop in unchanged."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from metamorph_tpu.config import LlamaConfig, SiglipConfig
from metamorph_tpu.models import llama as L
from metamorph_tpu.models import siglip as S
from metamorph_tpu.models.hf_import import (llama_params_from_hf,
                                            llama_params_to_hf,
                                            siglip_params_from_hf,
                                            mlp_params_from_hf)


def make_hf_llama():
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    ours_cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, rope_theta=10000.0,
        rope_scaling=False, tie_word_embeddings=False)
    return model, ours_cfg


def test_llama_logit_parity():
    model, cfg = make_hf_llama()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = llama_params_from_hf(sd, cfg, dtype=jnp.float32)

    ids = np.random.default_rng(0).integers(0, 512, (2, 10)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long()).logits.numpy()

    emb = L.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(10, dtype=jnp.int32), (2, 10))
    hidden = L.llama_forward(params, cfg, emb, pos, jnp.ones((2, 10), jnp.int32))
    ours = np.asarray(L.lm_head(params, cfg, hidden))

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_llama_hf_roundtrip():
    model, cfg = make_hf_llama()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = llama_params_from_hf(sd, cfg, dtype=jnp.float32)
    back = llama_params_to_hf(params, cfg)
    for k, v in sd.items():
        if "rotary_emb" in k:
            continue
        np.testing.assert_allclose(back[k], v, rtol=1e-6, err_msg=k)


def test_llama31_rope_scaling_parity():
    """RoPE llama3.1 frequency scaling must match HF's implementation."""
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=500000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 128},
        attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(1)
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_layers=1,
        num_heads=4, num_kv_heads=2, head_dim=16, rope_theta=500000.0,
        rope_scaling=True, rope_scaling_factor=8.0, rope_low_freq_factor=1.0,
        rope_high_freq_factor=4.0, rope_original_max_position=128,
        tie_word_embeddings=False)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = llama_params_from_hf(sd, cfg, dtype=jnp.float32)

    ids = np.random.default_rng(2).integers(0, 256, (1, 40)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long()).logits.numpy()
    emb = L.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.arange(40, dtype=jnp.int32)[None]
    hidden = L.llama_forward(params, cfg, emb, pos, jnp.ones((1, 40), jnp.int32))
    ours = np.asarray(L.lm_head(params, cfg, hidden))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_siglip_encoder_parity():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        layer_norm_eps=1e-6)
    torch.manual_seed(3)
    model = SiglipVisionModel(hf_cfg).eval()
    cfg = SiglipConfig(image_size=28, patch_size=14, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=4,
                       select_layer=-1)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = siglip_params_from_hf(sd, cfg, dtype=jnp.float32)

    px = np.random.default_rng(4).normal(size=(2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(px.transpose(0, 3, 1, 2)),
                    output_hidden_states=True)
        ref = out.hidden_states[-1].numpy()  # last block output, pre-final-LN

    ours = np.asarray(S.siglip_encode(params, cfg, jnp.asarray(px)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_projector_import():
    torch.manual_seed(5)
    seq = torch.nn.Sequential(
        torch.nn.Linear(8, 16), torch.nn.GELU(), torch.nn.Linear(16, 16))
    sd = {f"mm_projector.{k}": v.detach().numpy() for k, v in seq.state_dict().items()}
    params = mlp_params_from_hf(sd, "mm_projector", dtype=jnp.float32)

    from metamorph_tpu.models.projector import apply_stack

    x = np.random.default_rng(6).normal(size=(3, 8)).astype(np.float32)
    with torch.no_grad():
        ref = seq(torch.from_numpy(x)).numpy()
    ours = np.asarray(apply_stack(params, ["gelu", None], jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
