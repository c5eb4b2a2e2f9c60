"""Loader roundtrips: export -> load_pretrained_model; visualizer save/load."""

import jax
import jax.numpy as jnp
import numpy as np

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig)
from metamorph_tpu.models import metamorph as M
from metamorph_tpu.train.checkpoint import export_hf
from metamorph_tpu.inference.loader import (load_pretrained_model,
                                            load_visualization, save_visualizer,
                                            flatten_tree, unflatten_tree)

CFG = MetaMorphConfig(
    llama=LlamaConfig.tiny(vocab_size=1024),
    siglip=SiglipConfig.tiny(),
    mm=MultimodalConfig(num_image_tokens=4),
    train=TrainConfig(max_seq_len=32),
)


def test_export_then_load(tmp_path):
    params = M.init_metamorph_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    export_hf(str(tmp_path), params, CFG)
    loaded, cfg2 = load_pretrained_model(str(tmp_path), dtype=jnp.float32)
    assert cfg2.llama == CFG.llama
    for key in ("llama", "projector", "vision_head"):
        for a, b in zip(jax.tree.leaves(params[key]), jax.tree.leaves(loaded[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_embeds_tower_and_hf_reload(tmp_path):
    """Full-export round trip (`/root/reference/metamorph/model/builder.py:
    85-136`): the save carries the SigLIP tower (in-checkpoint + standalone
    HF dir), an HF-style config.json with the reference's persisted mm
    fields, and reloads in UNMODIFIED transformers code with exact logits."""
    import json

    import torch
    from transformers import LlamaForCausalLM, SiglipVisionModel

    from metamorph_tpu.models import llama as L

    params = M.init_metamorph_params(jax.random.PRNGKey(1), CFG,
                                     dtype=jnp.float32)
    export_hf(str(tmp_path), params, CFG)

    # our loader recovers the tower from the checkpoint itself
    loaded, _ = load_pretrained_model(str(tmp_path), dtype=jnp.float32)
    for a, b in zip(jax.tree.leaves(params["siglip"]),
                    jax.tree.leaves(loaded["siglip"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # HF-style config.json with the reference's persisted mm fields
    hf_cfg = json.load(open(tmp_path / "config.json"))
    assert hf_cfg["model_type"] == "llama"
    assert hf_cfg["mm_projector_type"] == CFG.mm.projector_type
    assert hf_cfg["num_image_tokens"] == CFG.mm.num_image_tokens
    assert (tmp_path / "model.safetensors.index.json").exists()

    # unmodified transformers reloads: tower dir ...
    tower = SiglipVisionModel.from_pretrained(str(tmp_path / "vision_tower"))
    w = tower.vision_model.embeddings.patch_embedding.weight.detach().numpy()
    np.testing.assert_allclose(
        w, np.asarray(params["siglip"]["patch_embed"]["kernel"]).transpose(
            3, 2, 0, 1), rtol=1e-6)

    # ... and the LLaMA backbone, with logit parity vs our forward
    model = LlamaForCausalLM.from_pretrained(
        str(tmp_path), torch_dtype=torch.float32).eval()
    ids = np.random.default_rng(0).integers(
        0, CFG.llama.vocab_size, (1, 12)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long()).logits.numpy()
    emb = L.embed_tokens(loaded["llama"], jnp.asarray(ids))
    pos = jnp.arange(12, dtype=jnp.int32)[None]
    hidden = L.llama_forward(loaded["llama"], CFG.llama, emb, pos,
                             jnp.ones((1, 12), jnp.int32))
    ours = np.asarray(L.lm_head(loaded["llama"], CFG.llama, hidden))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": jnp.ones((2, 3)), "layers": [{"w": jnp.zeros((4,))},
                                                    {"w": jnp.ones((4,))}]}}
    flat = flatten_tree(tree)
    assert set(flat) == {"a/b", "a/layers/0/w", "a/layers/1/w"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(np.asarray(back["a"]["layers"][1]["w"]),
                                  np.ones((4,)))


def test_visualizer_save_load(tmp_path):
    from metamorph_tpu.visualizer.adapter import init_adapter
    from metamorph_tpu.visualizer.unet import UNetConfig, init_unet_params
    from metamorph_tpu.visualizer.vae import VAEConfig, init_vae_params

    unet_cfg, vae_cfg = UNetConfig.tiny(), VAEConfig.tiny()
    adapter = init_adapter(jax.random.PRNGKey(0), mode="xattn", input_dim=12,
                           output_dim=unet_cfg.cross_attention_dim,
                           num_tokens=7, num_layers=2, num_heads=4)
    unet = init_unet_params(jax.random.PRNGKey(1), unet_cfg)
    vae = init_vae_params(jax.random.PRNGKey(2), vae_cfg)
    save_visualizer(str(tmp_path), adapter, unet, vae, unet_cfg, vae_cfg, "xattn")
    a2, u2, v2, uc2, vc2, mode = load_visualization(str(tmp_path))
    assert mode == "xattn"
    assert uc2 == unet_cfg and vc2 == vae_cfg
    for t1, t2 in ((adapter, a2), (unet, u2), (vae, v2)):
        for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resolve_model_dir(tmp_path):
    """Local dirs pass through; non-dirs try the hub and raise a clear error
    when unreachable (this machine has no egress)."""
    import pytest

    from metamorph_tpu.inference.loader import resolve_model_dir

    assert resolve_model_dir(str(tmp_path)) == str(tmp_path)
    with pytest.raises(FileNotFoundError):
        resolve_model_dir("no-such-org/no-such-repo-xyz")
