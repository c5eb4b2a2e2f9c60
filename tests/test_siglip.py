"""SigLIP tower tests: shapes, token reduction parity vs torch bilinear,
normalization, freeze_vision stop-gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.config import SiglipConfig, MultimodalConfig
from metamorph_tpu.models import siglip as S

CFG = SiglipConfig.tiny()  # 28px / patch14 -> 2x2=4 patches


@pytest.fixture(scope="module")
def params():
    return S.init_siglip_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def test_encode_shape(params):
    px = np.random.default_rng(0).normal(size=(3, 28, 28, 3)).astype(np.float32)
    out = S.siglip_encode(params, CFG, jnp.asarray(px))
    assert out.shape == (3, 4, CFG.hidden_size)


def test_select_layer(params):
    """select_layer=-1 runs all blocks; -(L+1) returns raw embeddings."""
    px = jnp.asarray(np.random.default_rng(1).normal(size=(1, 28, 28, 3)), jnp.float32)
    out_last = S.siglip_encode(params, CFG, px)
    cfg_embed = SiglipConfig.tiny().__class__(**{**CFG.__dict__, "select_layer": -(CFG.num_layers + 1)})
    out_embed = S.siglip_encode(params, cfg_embed, px)
    assert not np.allclose(np.asarray(out_last), np.asarray(out_embed))


def test_interpolation_matches_torch():
    """Bilinear 27x27 -> 8x8 reduction must match torch F.interpolate
    (align_corners=False), the reference op (`siglip_encoder.py:151-163`)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    feats = rng.normal(size=(2, 729, 16)).astype(np.float32)
    mm = MultimodalConfig(num_image_tokens=64, normalize_vision=False)
    ours = np.asarray(S.reduce_tokens(jnp.asarray(feats), mm))

    t = torch.from_numpy(feats).view(2, 27, 27, 16).permute(0, 3, 1, 2)
    ref = F.interpolate(t, size=(8, 8), mode="bilinear", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).reshape(2, 64, 16).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_concat_interpolation_shape():
    feats = jnp.asarray(np.random.default_rng(3).normal(size=(1, 729, 8)), jnp.float32)
    mm = MultimodalConfig(num_image_tokens=64, normalize_vision=False,
                          image_token_reduction="concat_interpolation")
    out = S.reduce_tokens(feats, mm)
    assert out.shape == (1, 64, 32)  # 4x hidden (`siglip_encoder.py:107-108`)


def test_normalize_and_freeze(params):
    px = jnp.asarray(np.random.default_rng(4).normal(size=(1, 28, 28, 3)), jnp.float32)
    mm = MultimodalConfig(num_image_tokens=4, normalize_vision=True,
                          image_token_reduction="interpolation", freeze_vision=True)
    out = S.vision_tower_forward(params, CFG, mm, px)
    norms = np.linalg.norm(np.asarray(out, np.float32), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    # freeze_vision: no grads to the tower
    def loss(p):
        return jnp.sum(S.vision_tower_forward(p, CFG, mm, px).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    assert all(float(jnp.abs(x).max()) == 0.0 for x in jax.tree.leaves(g))

    mm_hot = MultimodalConfig(num_image_tokens=4, freeze_vision=False)

    def loss2(p):
        return jnp.sum(S.vision_tower_forward(p, CFG, mm_hot, px).astype(jnp.float32) ** 2)

    g2 = jax.grad(loss2)(params)
    assert float(jnp.abs(g2["patch_embed"]["kernel"]).max()) > 0.0
