"""diffusers-naming roundtrip tests for UNet/VAE weight interop + behavioral
checks after roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np

from metamorph_tpu.visualizer.hf_import import (unet_params_from_hf,
                                                unet_params_to_hf,
                                                vae_params_from_hf,
                                                vae_params_to_hf)
from metamorph_tpu.visualizer.unet import UNetConfig, init_unet_params, unet_apply
from metamorph_tpu.visualizer.vae import (VAEConfig, init_vae_params, vae_decode,
                                          vae_encode)


def leaves_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_unet_roundtrip():
    cfg = UNetConfig.tiny()
    p = init_unet_params(jax.random.PRNGKey(0), cfg)
    sd = unet_params_to_hf(p, cfg)
    # all torch conv weights are [out,in,kh,kw]
    assert sd["conv_in.weight"].shape == (32, 4, 3, 3)
    assert sd["down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight"].shape[1] == cfg.cross_attention_dim
    p2 = unet_params_from_hf(sd, cfg)
    leaves_equal(p, p2)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, cfg.cross_attention_dim))
    o1 = unet_apply(p, cfg, x, jnp.asarray([10]), ctx)
    o2 = unet_apply(p2, cfg, x, jnp.asarray([10]), ctx)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_vae_roundtrip():
    cfg = VAEConfig.tiny()
    p = init_vae_params(jax.random.PRNGKey(0), cfg)
    sd = vae_params_to_hf(p, cfg)
    assert sd["quant_conv.weight"].shape == (8, 8, 1, 1)
    assert sd["post_quant_conv.weight"].shape == (4, 4, 1, 1)
    p2 = vae_params_from_hf(sd, cfg)
    leaves_equal(p, p2)

    img = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    np.testing.assert_array_equal(
        np.asarray(vae_encode(p, cfg, img)), np.asarray(vae_encode(p2, cfg, img)))


def test_sd15_key_coverage():
    """Full-size SD-1.5 config emits the expected key families/counts."""
    cfg = UNetConfig()
    # count params instead of materializing full weights: just shape-check the
    # tiny path plus name coverage at full topology via init on small dims is
    # too big; instead verify the down/up/attn key pattern on a 4-level config
    small4 = UNetConfig(block_out_channels=(8, 16, 24, 24), layers_per_block=2,
                        cross_attention_dim=8, attention_head_dim=2,
                        norm_groups=4, attn_levels=(True, True, True, False))
    p = init_unet_params(jax.random.PRNGKey(0), small4)
    sd = unet_params_to_hf(p, small4)
    assert "down_blocks.3.resnets.1.conv2.weight" in sd
    assert "down_blocks.2.attentions.1.proj_out.weight" in sd
    assert "down_blocks.3.downsamplers.0.conv.weight" not in sd
    assert "up_blocks.0.resnets.2.conv1.weight" in sd
    assert "up_blocks.3.attentions.2.transformer_blocks.0.ff.net.2.weight" in sd
    assert "up_blocks.0.upsamplers.0.conv.weight" in sd
    assert "up_blocks.3.upsamplers.0.conv.weight" not in sd
    p2 = unet_params_from_hf(sd, small4)
    leaves_equal(p, p2)
