"""Native C++ packer == Python packer (randomized fuzz equivalence), plus the
native JSONL indexer vs Python file indexing."""

import dataclasses
import json
import random

import numpy as np
import pytest

from metamorph_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX, IM_START_TOKEN_ID
from metamorph_tpu.multimodal.packing import PackedBatch, pack_sequences
from metamorph_tpu.multimodal import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="no C++ toolchain")


def random_batch(rng, B, K, T):
    ids, labs = [], []
    n_slots = 0
    for _ in range(B):
        row_ids, row_labs = [], []
        n_img = rng.randint(0, 3)
        n_slots += max(n_img, 1)
        row_ids.append(128000)
        row_labs.append(IGNORE_INDEX)
        for i in range(n_img):
            n_text = rng.randint(0, 6)
            for _ in range(n_text):
                t = rng.randint(10, 1000)
                row_ids.append(t)
                row_labs.append(t if rng.random() < 0.5 else IGNORE_INDEX)
            answer = rng.random() < 0.5
            if answer:
                row_ids.append(IM_START_TOKEN_ID)
                row_labs.append(IM_START_TOKEN_ID)
            row_ids.append(IMAGE_TOKEN_INDEX)
            row_labs.append(IGNORE_INDEX if not answer else 0)
        for _ in range(rng.randint(1, 8)):
            t = rng.randint(10, 1000)
            row_ids.append(t)
            row_labs.append(t)
        ids.append(row_ids)
        labs.append(row_labs)
    return ids, labs, n_slots


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("side", ["right", "left"])
def test_fuzz_equivalence(seed, side):
    rng = random.Random(seed)
    K, T = rng.choice([(3, 24), (4, 20), (2, 64)])
    B = rng.randint(1, 5)
    ids, labs, n_slots = random_batch(rng, B, K, T)
    N = n_slots + rng.randint(0, 2)
    py = pack_sequences(ids, labs, K, T, N, side)
    cc = native.pack_sequences_native(ids, labs, K, T, N, side)
    for f in dataclasses.fields(PackedBatch):
        a, b = getattr(py, f.name), getattr(cc, f.name)
        np.testing.assert_array_equal(a, b, err_msg=f"{f.name} seed={seed}")


def test_no_labels_and_overflow():
    ids = [[1, 2, IMAGE_TOKEN_INDEX, 3]]
    py = pack_sequences(ids, None, 2, 12, 1)
    cc = native.pack_sequences_native(ids, None, 2, 12, 1)
    np.testing.assert_array_equal(py.tokens, cc.tokens)

    with pytest.raises(ValueError):
        native.pack_sequences_native([[IMAGE_TOKEN_INDEX], [IMAGE_TOKEN_INDEX]],
                                     None, 2, 8, 1)


def test_jsonl_index(tmp_path):
    path = tmp_path / "x.jsonl"
    rows = [json.dumps({"i": i, "pad": "y" * (i * 3)}) for i in range(20)]
    path.write_text("\n".join(rows) + "\n")
    offs = native.jsonl_index_native(str(path))
    assert len(offs) == 20
    with open(path, "rb") as f:
        for i, off in enumerate(offs):
            f.seek(off)
            assert json.loads(f.readline())["i"] == i

    # no trailing newline
    path2 = tmp_path / "y.jsonl"
    path2.write_text("\n".join(rows))
    assert len(native.jsonl_index_native(str(path2))) == 20


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("side", ["right", "left"])
def test_fuzz_equivalence_variable_tokens(seed, side):
    """Anyres mode: per-slot variable token counts through both packers."""
    rng = random.Random(100 + seed)
    T = rng.choice([32, 48, 64])
    B = rng.randint(1, 4)
    ids, labs, n_slots = random_batch(rng, B, 0, T)
    N = n_slots
    tpi = [rng.randint(1, 9) for _ in range(n_slots)]
    cap = sum(tpi) + rng.randint(0, 5)
    py = pack_sequences(ids, labs, 4, T, N,
                        padding_side=side, tokens_per_image=tpi,
                        gather_capacity=cap)
    cc = native.pack_sequences_native(ids, labs, 4, T, N,
                                      padding_side=side, tokens_per_image=tpi,
                                      gather_capacity=cap)
    for f in dataclasses.fields(PackedBatch):
        a, b = getattr(py, f.name), getattr(cc, f.name)
        if a is None and b is None:
            continue
        np.testing.assert_array_equal(a, b, err_msg=f"{f.name} seed={seed}")
    # gather indices must lie within capacity (+dummy) when images are real
    assert py.img_gather_idx.max() <= cap


def test_native_variable_tokens_count_mismatch():
    with pytest.raises(ValueError, match="-3"):
        native.pack_sequences_native(
            [[1, IMAGE_TOKEN_INDEX, 2, IMAGE_TOKEN_INDEX, 3]], None, 4, 16, 2,
            tokens_per_image=[3], gather_capacity=3)


def _py_modality_lengths(path):
    """The Python-semantics reference for the native one-pass scan."""
    out = []
    with open(path) as f:
        for line in f:
            dat = json.loads(line)
            n = sum(len(str(c.get("value", "")).split())
                    for c in dat.get("conversations", []))
            n = max(n, 1)
            out.append(n if dat.get("image") is not None else -n)
    return out


@pytest.mark.skipif(not native.native_available(), reason="no compiler")
def test_modality_lengths_native_matches_python(tmp_path):
    """One-pass C++ scan == per-line json.loads over tricky rows: escape
    sequences that decode to whitespace, unicode whitespace, \\u escapes,
    non-string values, missing keys, image null/absent/list, nested objects."""
    rows = [
        {"image": "a.png", "conversations": [
            {"from": "human", "value": "<image>\nwhat   is\tthis?"},
            {"from": "gpt", "value": "a cat"}]},
        {"image": None, "conversations": [
            {"from": "human", "value": "hello world three"}]},
        {"conversations": [{"value": ""}, {"value": "  "}]},        # min 1
        {"image": ["x.png", "y.png"], "conversations": [
            {"value": "multi image list"}]},
        {"image": "z.png"},                                          # no convs
        {"image": "w.png", "conversations": [
            {"value": 42}, {"value": "x\\ny"}, {"nested": {"value": "NO"}}]},
        {"image": False, "conversations": [{"value": "bool image"}]},
        {"image": "u.png", "conversations": [
            {"value": "café naïve 😀 emoji"}]},
        {"id": 7, "conversations": [
            {"from": "human", "value": "deep [brackets] {braces} \"quoted\""}]},
    ]
    path = tmp_path / "tricky.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    got = native.modality_lengths_native(str(path)).tolist()
    assert got == _py_modality_lengths(str(path))


@pytest.mark.skipif(not native.native_available(), reason="no compiler")
def test_modality_lengths_native_fuzz(tmp_path):
    rng = random.Random(0)
    words = ["a", "bb", "ccc", "<image>", "x\ty", "p  q", "tail\n", "é", "日本"]
    rows = []
    for i in range(200):
        convs = [{"from": rng.choice(["human", "gpt"]),
                  "value": " ".join(rng.choices(words, k=rng.randint(0, 12)))}
                 for _ in range(rng.randint(0, 4))]
        row = {"conversations": convs}
        mode = rng.random()
        if mode < 0.4:
            row["image"] = f"img{i}.png"
        elif mode < 0.6:
            row["image"] = None
        rows.append(row)
    path = tmp_path / "fuzz.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=rng.random() < 0.5) + "\n")
    got = native.modality_lengths_native(str(path)).tolist()
    assert got == _py_modality_lengths(str(path))


def test_modality_lengths_sidecar_cache(tmp_path):
    """First access writes `<path>.modlen.npy`; a second dataset instance
    reads it back; touching the JSONL invalidates it."""
    import os
    import time

    from tests.test_data import make_ds

    from PIL import Image

    img_path = tmp_path / "i.png"
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img_path)
    path = str(tmp_path / "d.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({"image": str(img_path), "conversations": [
            {"from": "human", "value": "<image>\none two"}]}) + "\n")
        f.write(json.dumps({"image": None, "conversations": [
            {"from": "gpt", "value": "three"}]}) + "\n")

    ds = make_ds(path)
    first = ds.modality_lengths
    assert os.path.exists(path + ".modlen.npy")
    assert make_ds(path).modality_lengths == first  # served from sidecar

    time.sleep(0.01)
    with open(path, "a") as f:  # stale sidecar must be ignored
        f.write(json.dumps({"image": None, "conversations": [
            {"from": "gpt", "value": "four"}]}) + "\n")
    assert len(make_ds(path).modality_lengths) == 3
