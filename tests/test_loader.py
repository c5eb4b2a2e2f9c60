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
