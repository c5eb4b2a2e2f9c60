"""Unified-model forward tests: fused embeddings, dual loss math, gradients.

Loss semantics checked against hand computation of the reference formulas
(`metamorph/model/language_model/metamorph_llama.py:401-474`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.config import MetaMorphConfig, LlamaConfig, SiglipConfig, MultimodalConfig, TrainConfig
from metamorph_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX, IM_START_TOKEN_ID
from metamorph_tpu.models import metamorph as M
from metamorph_tpu.models import llama as L
from metamorph_tpu.multimodal.packing import pack_sequences, batch_to_arrays

CFG = MetaMorphConfig(
    llama=LlamaConfig.tiny(vocab_size=128258),
    siglip=SiglipConfig.tiny(),
    mm=MultimodalConfig(num_image_tokens=4),
    train=TrainConfig(max_seq_len=32, batch_size=2, max_images_per_batch=2),
)
K = CFG.mm.num_image_tokens
IMG = IMAGE_TOKEN_INDEX


@pytest.fixture(scope="module")
def params():
    return M.init_metamorph_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def make_batch():
    ids = [
        [1, 2, IM_START_TOKEN_ID, IMG, 128257, 7, 8],   # answer image
        [4, 5, IMG, 6],                                 # prompt image
    ]
    labs = [
        [IGNORE_INDEX, IGNORE_INDEX, IM_START_TOKEN_ID, 0, 128257, 7, 8],
        [IGNORE_INDEX, IGNORE_INDEX, 0, 6],
    ]
    packed = pack_sequences(ids, labs, K, CFG.train.max_seq_len, 2)
    pixels = np.random.default_rng(0).normal(size=(2, 28, 28, 3)).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in batch_to_arrays(packed).items()}, jnp.asarray(pixels)


def test_forward_losses(params):
    batch, pixels = make_batch()
    total, metrics = M.metamorph_forward(params, CFG, batch, pixels)
    assert np.isfinite(float(total))
    assert float(metrics["n_image_ar_tokens"]) == K
    # cosine AR loss bounded in [-1, 1]
    assert -1.0 <= float(metrics["loss_image_ar"]) <= 1.0
    np.testing.assert_allclose(
        float(total),
        float(metrics["loss_language"]) + CFG.mm.vision_coef * float(metrics["loss_image_ar"]),
        rtol=1e-6)


def test_fused_embeddings_placement(params):
    batch, pixels = make_batch()
    projected, _ = M.encode_images(params, CFG, pixels)
    emb = M.fuse_embeddings(params, CFG, batch, projected)
    is_img = np.asarray(batch["is_image"])
    gidx = np.asarray(batch["img_gather_idx"])
    proj_flat = np.asarray(projected).reshape(-1, projected.shape[-1])
    emb_np = np.asarray(emb)
    # image positions carry projected features; text positions carry table rows
    b, t = np.argwhere(is_img)[0]
    np.testing.assert_allclose(emb_np[b, t], proj_flat[gidx[b, t]], rtol=1e-6)
    tok = np.asarray(batch["tokens"])
    table = np.asarray(params["llama"]["embed"]["embedding"])
    b2, t2 = 0, 0
    assert not is_img[b2, t2]
    np.testing.assert_allclose(emb_np[b2, t2], table[tok[b2, t2]], rtol=1e-6)


def test_ar_loss_hand_computed(params):
    """AR cosine loss == -mean cos(vision_head(hidden[t-1]), target[t]) over
    answer-image tokens, computed by hand from the pieces."""
    batch, pixels = make_batch()
    _, metrics = M.metamorph_forward(params, CFG, batch, pixels)

    projected, targets = M.encode_images(params, CFG, pixels)
    emb = M.fuse_embeddings(params, CFG, batch, projected)
    hidden = L.llama_forward(params["llama"], CFG.llama, emb,
                             batch["position_ids"], batch["attn_mask"])
    ar_mask = np.asarray(batch["image_ar_mask"])
    tgt_flat = np.asarray(targets, np.float32).reshape(-1, targets.shape[-1])
    gidx = np.asarray(batch["img_gather_idx"])
    coss = []
    for b, t in np.argwhere(ar_mask == 1):
        h = hidden[b, t - 1][None]
        pred = np.asarray(M.apply_vision_head(params, CFG, h))[0]
        tgt = tgt_flat[gidx[b, t]]
        tgt = tgt / np.linalg.norm(tgt)
        coss.append(float(pred @ tgt))
    expected = -float(np.mean(coss))
    np.testing.assert_allclose(float(metrics["loss_image_ar"]), expected, rtol=1e-5)


def test_no_answer_images_gives_zero_ar(params):
    ids = [[1, 2, 3], [4, 5, IMG, 6]]
    labs = [[1, 2, 3], [IGNORE_INDEX, IGNORE_INDEX, 0, 6]]
    packed = pack_sequences(ids, labs, K, CFG.train.max_seq_len, 2)
    batch = {k: jnp.asarray(v) for k, v in batch_to_arrays(packed).items()}
    pixels = jnp.zeros((2, 28, 28, 3), jnp.float32)
    total, metrics = M.metamorph_forward(params, CFG, batch, pixels)
    assert float(metrics["n_image_ar_tokens"]) == 0
    assert float(metrics["loss_image_ar"]) == 0.0
    assert np.isfinite(float(total))


def test_gradients_flow(params):
    """Grads reach projector + vision head + LLM; targets stay detached
    (no grad to SigLIP when freeze_vision=True)."""
    batch, pixels = make_batch()

    def loss_fn(p):
        total, _ = M.metamorph_forward(p, CFG, batch, pixels)
        return total

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["projector"]["w0"]["kernel"]).max()) > 0
    assert float(jnp.abs(g["vision_head"]["w0"]["kernel"]).max()) > 0
    assert float(jnp.abs(g["llama"]["layers"]["attn"]["wq"]).max()) > 0
    assert float(jnp.abs(g["siglip"]["patch_embed"]["kernel"]).max()) == 0.0


def test_losses_module():
    from metamorph_tpu.models import losses as LS

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    assert float(LS.l1_loss(z, z)) == 0.0
    assert float(LS.cosine_loss(z, z)) == pytest.approx(-1.0, abs=1e-5)
    assert float(LS.smooth_l1_loss(z, h)) > 0
    # infonce: identical target/pred rows should beat shuffled ones
    good = float(LS.infonce_loss(z, z))
    bad = float(LS.infonce_loss(z, jnp.roll(z, 1, axis=0)))
    assert good < bad
    p = jax.nn.softmax(z, axis=-1)
    assert np.isfinite(float(LS.soft_ce_loss(p, p)))
