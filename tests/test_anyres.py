"""Anyres end-to-end tests: merge-map == feature-merge equivalence, variable-K
packing, fused training forward, dataset/collator, and decode — against
hand-computed reference semantics (`metamorph_arch.py:203-237`)."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig)
from metamorph_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX, IM_START_TOKEN_ID
from metamorph_tpu.multimodal.anyres import (NEWLINE_IDX, PAD_IDX,
                                             anyres_merge_map,
                                             anyres_num_views,
                                             build_batch_plan,
                                             preprocess_anyres)
from metamorph_tpu.multimodal.mm_utils import merge_anyres_features
from metamorph_tpu.multimodal.packing import batch_to_arrays, pack_sequences

# tiny geometry: crop 28, patch 14 -> P=2, 4 tokens per view
PINPOINTS = [(28, 56), (56, 28), (56, 56)]
CROP, P = 28, 2


def anyres_cfg(**mm_kw):
    return MetaMorphConfig(
        llama=LlamaConfig.tiny(vocab_size=128258),
        siglip=SiglipConfig.tiny(),  # image 28, patch 14
        mm=MultimodalConfig(num_image_tokens=4, image_token_reduction="none",
                            image_aspect_ratio="anyres",
                            mm_patch_merge_type="spatial_unpad",
                            image_grid_pinpoints=tuple(PINPOINTS), **mm_kw),
        train=TrainConfig(max_seq_len=48, batch_size=2, max_images_per_batch=2),
    )


def test_num_views_and_merge_map_hand_math():
    """(w=20,h=50) image -> best canvas (28,56) -> 1x2 tile grid -> 3 views;
    spatial_unpad merge = 4 base + (4 rows x (2 cols + newline)) = 16 tokens."""
    assert anyres_num_views((20, 50), PINPOINTS, CROP) == 3
    m = anyres_merge_map((20, 50), PINPOINTS, CROP, P, "spatial_unpad")
    assert m.shape == (16,)
    # first 4 entries are the global view (indices 0..3)
    np.testing.assert_array_equal(m[:4], [0, 1, 2, 3])
    # every 3rd entry of the tile block is the newline
    tile_block = m[4:].reshape(4, 3)
    assert (tile_block[:, 2] == NEWLINE_IDX).all()
    # tile rows: tiles are views 1 (top) and 2 (bottom), row-major patches
    np.testing.assert_array_equal(tile_block[:, :2],
                                  [[4, 5], [6, 7], [8, 9], [10, 11]])


def test_merge_map_matches_feature_merge():
    """Applying the map to flattened features == merge_anyres_features on the
    features directly (the map is derived from the same function)."""
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(3, 4, 5))  # 3 views, P^2=4, D=5
    nl = rng.normal(size=(5,))
    ref = merge_anyres_features(feats, (20, 50), PINPOINTS, CROP, P,
                                merge_type="spatial_unpad", image_newline=nl)
    m = anyres_merge_map((20, 50), PINPOINTS, CROP, P, "spatial_unpad")
    flat = feats.reshape(-1, 5)
    ours = np.where((m == NEWLINE_IDX)[:, None], nl, flat[np.maximum(m, 0)])
    np.testing.assert_allclose(ours, ref)


def test_pack_variable_tokens():
    """Variable per-image token counts: slot offsets are cumulative sums."""
    IMG = IMAGE_TOKEN_INDEX
    ids = [[1, IMG, 2], [3, IMG, 4]]
    labs = [[IGNORE_INDEX, IGNORE_INDEX, 2], [IGNORE_INDEX, IGNORE_INDEX, 4]]
    packed = pack_sequences(ids, labs, 4, 16, 2,
                            tokens_per_image=[3, 5], gather_capacity=10)
    # sample 0: [tok1, img0 x3, tok2] -> gather rows 0..2 at t=1..3
    np.testing.assert_array_equal(packed.img_gather_idx[0][1:4], [0, 1, 2])
    assert packed.tokens[0][4] == 2
    # sample 1: image 1 starts at offset 3
    np.testing.assert_array_equal(packed.img_gather_idx[1][1:6], [3, 4, 5, 6, 7])
    assert packed.tokens[1][6] == 4
    # dummy index = capacity
    assert packed.img_gather_idx[0][0] == 10
    assert packed.attn_mask[0].sum() == 5 and packed.attn_mask[1].sum() == 7


def test_build_batch_plan_with_placeholder():
    vm, tpi = build_batch_plan([(20, 50), None], [3, 1], PINPOINTS, CROP, P,
                               "spatial_unpad", capacity=24)
    assert tpi == [16, 0]
    assert (vm[16:] == PAD_IDX).all()
    # global indices are view-table offsets (image 0 owns views 0..2)
    assert vm[0] == 0 and vm[4] == 4


@pytest.fixture(scope="module")
def fwd_setup():
    from metamorph_tpu.models.metamorph import init_metamorph_params

    cfg = anyres_cfg()
    params = init_metamorph_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return cfg, params


def make_anyres_batch(cfg, img_hw=(50, 20)):
    """One anyres image sample + one text-only sample through the collator."""
    from metamorph_tpu.train.data import PackedCollator

    h, w = img_hw
    img = np.random.default_rng(1).integers(0, 256, (h, w, 3)).astype(np.uint8)
    views, size = preprocess_anyres(img, PINPOINTS, CROP)
    inst_img = {
        "input_ids": [1, 5, IMAGE_TOKEN_INDEX, 7, 8],
        "labels": [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 7, 8],
        "pixels": [views], "image_sizes": [size], "modality_length": 5}
    inst_txt = {
        "input_ids": [1, 9, 10, 11],
        "labels": [IGNORE_INDEX, 9, 10, 11],
        "pixels": [np.zeros((1, CROP, CROP, 3), np.float32)],
        "image_sizes": [None], "modality_length": -4}
    col = PackedCollator(num_image_tokens=4, max_seq_len=cfg.train.max_seq_len,
                         num_image_slots=2, image_size=CROP,
                         image_aspect_ratio="anyres", grid_pinpoints=PINPOINTS)
    return col([inst_img, inst_txt]), views


def test_anyres_training_forward(fwd_setup):
    """Full fused forward on an anyres batch: finite dual loss, zero AR tokens,
    and the fused rows equal the hand-merged projected features."""
    from metamorph_tpu.models import metamorph as M

    cfg, params = fwd_setup
    (packed, pixels), views = make_anyres_batch(cfg)
    assert packed.view_map is not None
    batch = {k: jnp.asarray(v) for k, v in batch_to_arrays(packed).items()}
    px = jnp.asarray(pixels)

    total, metrics = M.metamorph_forward(params, cfg, batch, px)
    assert np.isfinite(float(total))
    assert float(metrics["n_image_ar_tokens"]) == 0.0  # prompt image only

    # fused embeddings at image positions == merge_anyres_features of the
    # projected per-view features (reference semantics, hand-composed)
    projected, _ = M.encode_images(params, cfg, px)
    embeds = M.fuse_embeddings(params, cfg, batch, projected)
    n_views = views.shape[0]
    per_view = np.asarray(projected)[:n_views]           # this image's views
    nl = np.asarray(params["image_newline"], np.float32)
    ref = merge_anyres_features(per_view.astype(np.float64), (20, 50),
                                PINPOINTS, CROP, P, "spatial_unpad",
                                image_newline=nl.astype(np.float64))
    pos = np.where(np.asarray(packed.is_image[0]))[0]
    assert len(pos) == ref.shape[0] == 16
    np.testing.assert_allclose(np.asarray(embeds)[0, pos], ref, rtol=1e-5,
                               atol=1e-5)


def test_anyres_dataset_end_to_end(tmp_path):
    """LazySupervisedDataset(anyres) -> collator -> packed batch with view_map."""
    from PIL import Image

    from metamorph_tpu.train.data import (DataConfig, DataIterator,
                                          LazySupervisedDataset, PackedCollator)
    from tests.test_masking import fake_tokenize

    img_path = tmp_path / "wide.png"
    Image.fromarray(np.full((30, 60, 3), 100, np.uint8)).save(img_path)
    rows = [
        {"id": "a", "image": str(img_path),
         "conversations": [{"from": "human", "value": "<image>\nwhat"},
                           {"from": "gpt", "value": "thing"}]},
        {"id": "t", "image": None,
         "conversations": [{"from": "human", "value": "hi"},
                           {"from": "gpt", "value": "yo"}]},
    ]
    path = tmp_path / "d.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    dcfg = DataConfig(data_path=str(path), image_aspect_ratio="anyres",
                      image_size=CROP, grid_pinpoints=tuple(PINPOINTS))
    ds = LazySupervisedDataset(str(path), fake_tokenize, dcfg)
    row = ds[0]
    assert isinstance(row["pixels"], list)
    assert row["image_sizes"] == [(60, 30)]
    assert row["pixels"][0].shape[0] == anyres_num_views((60, 30), PINPOINTS, CROP)

    col = PackedCollator(num_image_tokens=4, max_seq_len=64, num_image_slots=2,
                         image_size=CROP, image_aspect_ratio="anyres",
                         grid_pinpoints=PINPOINTS)
    packed, pixels = next(iter(DataIterator(ds, col, batch_size=2, seed=0)))
    assert packed.view_map is not None
    assert pixels.ndim == 4 and pixels.shape[1:] == (CROP, CROP, 3)
    assert packed.is_image.sum() > 0


def test_anyres_decode(fwd_setup):
    """generate() consumes an anyres-fused prompt and decodes."""
    from metamorph_tpu.inference.decode import generate

    cfg, params = fwd_setup
    (packed, pixels), _ = make_anyres_batch(cfg)
    batch = {k: jnp.asarray(v) for k, v in batch_to_arrays(packed).items()}
    # single-row decode: take sample 0's row only
    batch = {k: v[:1] if v.ndim >= 2 else v for k, v in batch.items()}
    out = generate(params, cfg, batch, jnp.asarray(pixels), max_new_tokens=6,
                   max_images=1)
    assert int(out["n_ids"]) > 0
    assert np.isfinite(np.asarray(out["image_embeds"])).all()


def test_anyres_sharded_loading_matches_replicated(fwd_setup, tmp_path):
    """Per-host pod loading for anyres (multi-host, SURVEY §2.2): two
    process-sharded DataIterators must reconstruct a global batch whose FUSED
    EMBEDDINGS equal the replicated (process_count=1) batch's. The global
    table layout differs (each host's images start at its block boundary);
    the fusion result is what matters."""
    from PIL import Image

    from metamorph_tpu.models import metamorph as M
    from metamorph_tpu.train.data import (DataConfig, DataIterator,
                                          LazySupervisedDataset, PackedCollator)
    from tests.test_masking import fake_tokenize

    cfg, params = fwd_setup
    rng = np.random.default_rng(3)
    rows = []
    for i, hw in enumerate([(30, 60), (60, 30), None, (40, 40)]):
        row = {"id": f"r{i}",
               "conversations": [
                   {"from": "human",
                    "value": ("<image>\n" if hw else "") + f"q {i}"},
                   {"from": "gpt", "value": f"ans {i}"}]}
        if hw:
            img_path = tmp_path / f"im{i}.png"
            Image.fromarray(rng.integers(0, 256, (*hw, 3)).astype(np.uint8)
                            ).save(img_path)
            row["image"] = str(img_path)
        else:
            row["image"] = None
        rows.append(row)
    path = tmp_path / "d.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    dcfg = DataConfig(data_path=str(path), image_aspect_ratio="anyres",
                      image_size=CROP, grid_pinpoints=tuple(PINPOINTS))
    ds = LazySupervisedDataset(str(path), fake_tokenize, dcfg)
    col = PackedCollator(num_image_tokens=4, max_seq_len=64,
                         num_image_slots=4, image_size=CROP,
                         image_aspect_ratio="anyres", grid_pinpoints=PINPOINTS)

    packed_g, pixels_g = next(iter(DataIterator(ds, col, batch_size=4,
                                                seed=0)))
    shards = [next(iter(DataIterator(ds, col, batch_size=4, seed=0,
                                     process_index=p, process_count=2)))
              for p in range(2)]

    # reconstruct the global batch the way the SPMD feed does (concat along
    # the sharded axes)
    batch_g = {k: jnp.asarray(v) for k, v in batch_to_arrays(packed_g).items()}
    cat = {}
    for k in batch_g:
        a = batch_to_arrays(shards[0][0])[k]
        b = batch_to_arrays(shards[1][0])[k]
        cat[k] = jnp.asarray(np.concatenate([a, b], axis=0))
    pixels_cat = np.concatenate([shards[0][1], shards[1][1]], axis=0)
    assert cat["view_map"].shape == batch_g["view_map"].shape
    assert pixels_cat.shape == pixels_g.shape

    proj_g, _ = M.encode_images(params, cfg, jnp.asarray(pixels_g))
    emb_g = np.asarray(M.fuse_embeddings(params, cfg, batch_g, proj_g))
    proj_s, _ = M.encode_images(params, cfg, jnp.asarray(pixels_cat))
    emb_s = np.asarray(M.fuse_embeddings(params, cfg, cat, proj_s))

    np.testing.assert_array_equal(np.asarray(cat["tokens"]),
                                  np.asarray(batch_g["tokens"]))
    np.testing.assert_allclose(emb_s, emb_g, rtol=1e-5, atol=1e-5)
