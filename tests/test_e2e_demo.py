"""End-to-end demo smoke (SURVEY §4): tiny random-weight model exported to a
checkpoint dir, demo CLI pipeline on a synthetic image — tokenizer stubbed —
through fusion, KV-cache decode, and (tiny) diffusion rendering."""

import json
import os
import sys

import numpy as np
import pytest

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig)

CFG = MetaMorphConfig(
    llama=LlamaConfig.tiny(vocab_size=128258),
    siglip=SiglipConfig.tiny(),
    mm=MultimodalConfig(num_image_tokens=4),
    train=TrainConfig(max_seq_len=64),
)


class FakeTokenizer:
    bos_token_id = 128000

    def __call__(self, s):
        class R:
            pass

        r = R()
        r.input_ids = [self.bos_token_id] + [1000 + (hash(w) % 1000)
                                             for w in s.split()]
        return r

    def decode(self, ids, **kw):
        return " ".join(f"tok{i}" for i in ids)

    def add_tokens(self, toks, special_tokens=True):
        return len(toks)


def test_demo_pipeline_e2e(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from metamorph_tpu.models.metamorph import init_metamorph_params
    from metamorph_tpu.train.checkpoint import export_hf

    # 1. export a tiny model checkpoint
    params = init_metamorph_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    model_dir = tmp_path / "model"
    export_hf(str(model_dir), params, CFG)

    # 2. a tiny visualizer checkpoint
    from metamorph_tpu.inference.loader import save_visualizer
    from metamorph_tpu.visualizer.adapter import init_adapter
    from metamorph_tpu.visualizer.unet import UNetConfig, init_unet_params
    from metamorph_tpu.visualizer.vae import VAEConfig, init_vae_params

    unet_cfg, vae_cfg = UNetConfig.tiny(), VAEConfig.tiny()
    vis_dir = tmp_path / "vis"
    save_visualizer(str(vis_dir),
                    init_adapter(jax.random.PRNGKey(1), mode="mlp",
                                 input_dim=CFG.siglip.hidden_size,
                                 hidden_dim=16,
                                 output_dim=unet_cfg.cross_attention_dim,
                                 num_layers=2),
                    init_unet_params(jax.random.PRNGKey(2), unet_cfg),
                    init_vae_params(jax.random.PRNGKey(3), vae_cfg),
                    unet_cfg, vae_cfg, "mlp")

    # 3. a test image
    img_path = tmp_path / "cat.jpg"
    Image.fromarray(np.full((60, 80, 3), 77, np.uint8)).save(img_path)

    # 4. run the demo main with the tokenizer stubbed
    import metamorph_tpu.inference.demo as demo

    monkeypatch.setitem(sys.modules, "transformers", _FakeTransformers())
    demo.main([
        "--model-path", str(model_dir),
        "--tokenizer", "fake",
        "--image", str(img_path),
        "--prompt", "what is it",
        "--max-new-tokens", "6",
        "--visualizer", str(vis_dir),
        "--out-dir", str(tmp_path / "out"),
    ])
    # decode ran; if the random model emitted an image, renders exist — either
    # way the pipeline completed without error

    # 5. same pipeline with speculative decoding enabled (--spec-k): output
    # path is exact-verified so the pipeline must complete identically
    demo.main([
        "--model-path", str(model_dir),
        "--tokenizer", "fake",
        "--image", str(img_path),
        "--prompt", "what is it",
        "--max-new-tokens", "6",
        "--spec-k", "4",
        "--out-dir", str(tmp_path / "out_spec"),
    ])

    # 6. draft-model speculation via --draft-model: export a tiny HF-layout
    # drafter and run the same pipeline through the two-model path
    import json as _json

    from safetensors.numpy import save_file

    from metamorph_tpu.config import LlamaConfig
    from metamorph_tpu.models.hf_import import (llama_config_to_hf,
                                                llama_params_to_hf)
    from metamorph_tpu.models.llama import init_llama_params

    dcfg = LlamaConfig.tiny(vocab_size=CFG.llama.vocab_size)
    dparams = init_llama_params(jax.random.PRNGKey(5), dcfg, jnp.float32)
    draft_dir = tmp_path / "draft"
    draft_dir.mkdir()
    save_file({k: np.ascontiguousarray(np.asarray(v)) for k, v in
               llama_params_to_hf(dparams, dcfg).items()},
              str(draft_dir / "model.safetensors"))
    (draft_dir / "config.json").write_text(
        _json.dumps(llama_config_to_hf(dcfg)))
    demo.main([
        "--model-path", str(model_dir),
        "--tokenizer", "fake",
        "--image", str(img_path),
        "--prompt", "what is it",
        "--max-new-tokens", "6",
        "--spec-k", "4",
        "--draft-model", str(draft_dir),
        "--out-dir", str(tmp_path / "out_draft"),
    ])


class _FakeTransformers:
    class AutoTokenizer:
        @staticmethod
        def from_pretrained(path):
            return FakeTokenizer()


def test_loaded_model_generates(tmp_path):
    """Numerical check: a loaded export decodes identically to in-memory params."""
    import jax
    import jax.numpy as jnp

    from metamorph_tpu.inference.decode import generate
    from metamorph_tpu.inference.loader import load_pretrained_model
    from metamorph_tpu.models.metamorph import init_metamorph_params
    from metamorph_tpu.multimodal.packing import batch_to_arrays, pack_sequences
    from metamorph_tpu.train.checkpoint import export_hf
    from metamorph_tpu.constants import IMAGE_TOKEN_INDEX

    params = init_metamorph_params(jax.random.PRNGKey(5), CFG, jnp.float32)
    export_hf(str(tmp_path), params, CFG)
    loaded, cfg2 = load_pretrained_model(str(tmp_path), dtype=jnp.float32)
    loaded["siglip"] = params["siglip"]  # export stores LLM+heads; tower external

    ids = [[128000, 5, 6, IMAGE_TOKEN_INDEX, 7]]
    packed = pack_sequences(ids, None, CFG.mm.num_image_tokens, 32, 1)
    batch = {k: jnp.asarray(v) for k, v in batch_to_arrays(packed).items()}
    px = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 28, 28, 3)).astype(np.float32))

    out1 = generate(params, CFG, batch, px, max_new_tokens=5, max_images=1)
    out2 = generate(loaded, cfg2, batch, px, max_new_tokens=5, max_images=1)
    np.testing.assert_array_equal(np.asarray(out1["ids"]), np.asarray(out2["ids"]))
