"""Data pipeline tests: JSONL lazy loading, dispatch branches, consistency
guards, collation to packed batches, resumable iteration."""

import json
import os
import random

import numpy as np
import pytest

from metamorph_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from metamorph_tpu.train.data import (DataConfig, DataIterator,
                                      LazySupervisedDataset, PackedCollator,
                                      draw_bounding_boxes,
                                      modality_length_grouped_indices,
                                      process_vstar_answer, video_task_description)
from tests.test_masking import fake_tokenize


@pytest.fixture()
def jsonl_dir(tmp_path):
    from PIL import Image

    img_path = tmp_path / "img.png"
    Image.fromarray(np.full((40, 60, 3), 128, np.uint8)).save(img_path)

    rows = [
        {"id": "s1", "image": str(img_path),
         "conversations": [
             {"from": "human", "value": "<image>\nwhat is it"},
             {"from": "gpt", "value": "gray"}]},
        {"id": "s2", "image": None,
         "conversations": [
             {"from": "human", "value": "hello"},
             {"from": "gpt", "value": "hi there"}]},
        {"id": "vstar_1", "image": str(img_path),
         "target_instances": [{"name": "cat", "bbox": [5, 5, 20, 20]}],
         "conversations": [
             {"from": "human", "value": "<image>\nAdditional visual information to focus on: where is it"},
             {"from": "gpt", "value": "left"}]},
        {"id": "bad", "image": str(tmp_path / "missing.png"),
         "conversations": [
             {"from": "human", "value": "<image>\nx"},
             {"from": "gpt", "value": "y"}]},
    ]
    path = tmp_path / "data.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(path)


def make_ds(jsonl_dir, **kw):
    cfg = DataConfig(data_path=jsonl_dir, image_size=28, **kw)
    return LazySupervisedDataset(jsonl_dir, fake_tokenize, cfg)


def test_image_sample(jsonl_dir):
    ds = make_ds(jsonl_dir)
    row = ds[0]
    assert row["pixels"].shape == (1, 28, 28, 3)
    assert row["input_ids"].count(IMAGE_TOKEN_INDEX) == 1
    assert row["modality_length"] > 0
    sup = [l for l in row["labels"] if l != IGNORE_INDEX]
    assert len(sup) > 0


def test_text_only_gets_dummy_image(jsonl_dir):
    ds = make_ds(jsonl_dir)
    row = ds[1]
    assert row["pixels"].shape == (1, 28, 28, 3)
    assert np.all(row["pixels"] == 0)
    assert row["modality_length"] < 0
    assert IMAGE_TOKEN_INDEX not in row["input_ids"]


def test_vstar_two_images(jsonl_dir):
    ds = make_ds(jsonl_dir)
    row = ds[2]
    # original + boxed -> 2 images, 2 sentinels (the answer embeds one <image>)
    assert row["pixels"].shape[0] == 2
    assert row["input_ids"].count(IMAGE_TOKEN_INDEX) == 2


def test_bad_sample_skips_to_next(jsonl_dir):
    ds = make_ds(jsonl_dir)
    row = ds[3]  # missing.png -> falls through to row 0
    assert row["pixels"] is not None


def test_vstar_answer_format():
    out = process_vstar_answer("left", [{"name": "cat"}, {"name": "dog"}])
    assert "cat, and dog." in out
    assert "<image>" in out
    assert out.endswith("left")


def test_draw_bounding_boxes():
    img = np.zeros((30, 30, 3), np.uint8)
    out = draw_bounding_boxes(img, [{"name": "x", "bbox": [5, 5, 10, 10]}])
    assert (out[5, 5:16] == [255, 0, 0]).all()
    assert (img == 0).all()  # input untouched


def test_video_templates_tag_consistency():
    """Every template family must reference exactly as many <image> tags as the
    reorder function returns frames."""
    rng = random.Random(0)
    for n in (2, 4, 6, 9):
        for _ in range(30):
            q, a, reorder = video_task_description(n, 1.0, rng)
            frames = list(range(n))
            used = reorder(frames) if reorder else frames
            n_tags = (q + " " + a).count("<image>")
            assert n_tags == len(used), (n, q, a)


def test_collator_and_iterator(jsonl_dir):
    ds = make_ds(jsonl_dir)
    col = PackedCollator(num_image_tokens=4, max_seq_len=64, num_image_slots=6,
                         image_size=28)
    it = DataIterator(ds, col, batch_size=2, seed=0)
    gen = iter(it)
    packed, pixels = next(gen)
    assert packed.tokens.shape == (2, 64)
    assert pixels.shape == (6, 28, 28, 3)

    # resumability: iterator restarted from state reproduces the same batch
    state = it.state_dict()
    packed2, _ = next(gen)
    it2 = DataIterator(ds, col, batch_size=2, seed=0)
    it2.load_state_dict(state)
    packed3, _ = next(iter(it2))
    np.testing.assert_array_equal(packed2.tokens, packed3.tokens)


def test_modality_grouping():
    lengths = [10, -5, 12, -7, 9, -3, 11, -6]
    rng = random.Random(0)
    idx = modality_length_grouped_indices(lengths, 2, rng)
    assert sorted(idx) == list(range(8))
    for s in range(0, 8, 2):
        pair = idx[s:s + 2]
        signs = {lengths[i] > 0 for i in pair}
        assert len(signs) == 1  # single modality per batch


@pytest.fixture()
def mixed_jsonl(tmp_path):
    """8 image + 8 text-only rows with varying conversation lengths."""
    from PIL import Image

    img_path = tmp_path / "m.png"
    Image.fromarray(np.full((32, 32, 3), 90, np.uint8)).save(img_path)
    rows = []
    for i in range(8):
        rows.append({"id": f"img{i}", "image": str(img_path),
                     "conversations": [
                         {"from": "human", "value": "<image>\n" + "q " * (i + 1)},
                         {"from": "gpt", "value": "a " * (i + 2)}]})
        rows.append({"id": f"txt{i}", "image": None,
                     "conversations": [
                         {"from": "human", "value": "q " * (i + 3)},
                         {"from": "gpt", "value": "a " * (i + 1)}]})
    path = tmp_path / "mixed.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(path)


def test_modality_lengths_property(mixed_jsonl):
    ds = make_ds(mixed_jsonl)
    lens = ds.modality_lengths
    assert len(lens) == 16
    # even rows are image samples (positive), odd are text-only (negative)
    assert all(l > 0 for l in lens[0::2])
    assert all(l < 0 for l in lens[1::2])
    assert ds.modality_lengths is lens  # cached


def test_iterator_group_by_modality_wired(mixed_jsonl):
    """The production flag path: DataIterator(group_by_modality=True) must emit
    single-modality, length-sorted batches (reference LengthGroupedSampler,
    metamorph_trainer.py:66-136) — not just expose the helper."""
    ds = make_ds(mixed_jsonl)
    col = PackedCollator(num_image_tokens=4, max_seq_len=64, num_image_slots=8,
                         image_size=28)
    it = DataIterator(ds, col, batch_size=4, seed=0, group_by_modality=True)
    order = it._order()
    assert sorted(order) == list(range(16))
    lens = ds.modality_lengths
    for s in range(0, 16, 4):
        batch_idx = order[s:s + 4]
        signs = {lens[i] > 0 for i in batch_idx}
        assert len(signs) == 1, f"mixed-modality batch at {s}: {batch_idx}"
        mags = [abs(lens[i]) for i in batch_idx]
        assert mags == sorted(mags, reverse=True), "batch not length-sorted"

    # grouped iteration still yields packed batches and resumes deterministically
    gen = iter(it)
    next(gen)
    state = it.state_dict()
    packed2, _ = next(gen)
    it2 = DataIterator(ds, col, batch_size=4, seed=0, group_by_modality=True)
    it2.load_state_dict(state)
    packed3, _ = next(iter(it2))
    np.testing.assert_array_equal(packed2.tokens, packed3.tokens)


def test_bucket_constant_within_accum_group(jsonl_dir):
    ds = make_ds(jsonl_dir)
    col = PackedCollator(num_image_tokens=4, max_seq_len=64, num_image_slots=6,
                         image_size=28)
    it = DataIterator(ds, col, batch_size=1, seed=3, token_buckets=(2, 4, 8),
                      accum_steps=4)
    seen = set()
    for b in range(0, 40, 4):
        group = {it._bucket_for(0, b + k) for k in range(4)}
        assert len(group) == 1, f"accum group at {b} mixes buckets {group}"
        seen |= group
    assert len(seen) > 1  # buckets do vary ACROSS optimizer steps


def test_metaclip_preloaded_images(tmp_path):
    """'metacliptar' datasets carry image data inline, not paths
    (train.py:776-784,1061)."""
    img = np.full((20, 20, 3), 77, np.uint8).tolist()
    rows = [{"id": "m0", "image": img,
             "conversations": [
                 {"from": "human", "value": "<image>\nwhat"},
                 {"from": "gpt", "value": "thing"}]}]
    path = tmp_path / "metacliptar_train.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ds = make_ds(str(path))
    assert ds.use_metaclip and ds.add_prompts
    row = ds[0]
    assert row["pixels"].shape == (1, 28, 28, 3)
    assert row["input_ids"].count(IMAGE_TOKEN_INDEX) == 1
    assert row["modality_length"] > 0


def test_prefetcher():
    from metamorph_tpu.train.prefetch import Prefetcher

    out = list(Prefetcher(iter(range(10)), depth=3, transform=lambda x: x * 2))
    assert out == [x * 2 for x in range(10)]

    def boom():
        yield 1
        raise ValueError("bad")

    p = Prefetcher(boom())
    assert next(p) == 1
    with pytest.raises(ValueError):
        next(p)


def test_process_sharded_loading_matches_global(mixed_jsonl):
    """Per-host data loading (multi-host pods): concatenating every process's
    locally-packed, index-shifted shard must reproduce the globally-packed
    batch on all device-consumed planes, and the pixel stacks concatenate to
    the global image-slot table."""
    from metamorph_tpu.multimodal.packing import batch_to_arrays

    ds = make_ds(mixed_jsonl)
    col = PackedCollator(num_image_tokens=4, max_seq_len=64, num_image_slots=8,
                         image_size=28)
    it_global = DataIterator(ds, col, batch_size=4, seed=0)
    g_packed, g_pixels = next(iter(it_global))
    g = batch_to_arrays(g_packed)

    shards = []
    for p in range(2):
        it_p = DataIterator(ds, col, batch_size=4, seed=0,
                            process_index=p, process_count=2)
        shards.append(next(iter(it_p)))
    l = [batch_to_arrays(s[0]) for s in shards]
    cat = {k: np.concatenate([x[k] for x in l], axis=0) for k in l[0]}
    for k in g:
        if k == "img_gather_idx":
            continue  # slot numbering differs; content compared below
        np.testing.assert_array_equal(cat[k], g[k], err_msg=k)
    # slot numbering differs between global and sharded packing, but the
    # CONTENT each gather index resolves to (its image's pixels) must match
    cat_pixels = np.concatenate([s[1] for s in shards], axis=0)
    K = 4
    for b, t in zip(*np.where(g["is_image"])):
        gi, ci = g["img_gather_idx"][b, t], cat["img_gather_idx"][b, t]
        np.testing.assert_array_equal(cat_pixels[ci // K], g_pixels[gi // K])
        assert gi % K == ci % K  # same token index within the image


def test_process_sharded_rejects_bad_config(mixed_jsonl):
    ds = make_ds(mixed_jsonl)
    col = PackedCollator(num_image_tokens=4, max_seq_len=64, num_image_slots=8,
                         image_size=28)
    with pytest.raises(ValueError, match="divide"):
        DataIterator(ds, col, batch_size=5, seed=0, process_index=0,
                     process_count=2)
    # anyres + sharded loading is supported (round 4); budgets that do not
    # split evenly across hosts are rejected early
    col_any = PackedCollator(num_image_tokens=4, max_seq_len=64,
                             num_image_slots=8, image_size=28,
                             image_aspect_ratio="anyres",
                             grid_pinpoints=[(28, 56)], token_capacity=9)
    with pytest.raises(ValueError, match="divide"):
        DataIterator(ds, col_any, batch_size=4, seed=0, process_index=0,
                     process_count=2)
