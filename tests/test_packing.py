"""Golden tests for static-shape packing vs the reference splice semantics
(`metamorph/model/metamorph_arch.py:177-425`), emulated directly in numpy."""

import numpy as np
import pytest

from metamorph_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX, IM_START_TOKEN_ID
from metamorph_tpu.multimodal.packing import pack_sequences

IMG = IMAGE_TOKEN_INDEX
K = 4  # tokens per image in these tests


def reference_splice(input_ids, labels, K, max_len):
    """Direct numpy emulation of the reference's dynamic splice loop.
    Returns per-sample (embeds_key list, labels list, image_positions list,
    placeholder image indices). embeds_key: ("text", token) or ("img", slot, j)."""
    cur_image_idx = 0
    out = []
    placeholders = []
    for ids, labs in zip(input_ids, labels):
        ids, labs = list(ids), list(labs)
        n_img = sum(1 for t in ids if t == IMG)
        if n_img == 0:
            placeholders.append(cur_image_idx)
            cur_image_idx += 1
            seq = [(("text", t), l, 0) for t, l in zip(ids, labs)]
            out.append([s for s in seq][:max_len])
            continue
        idxs = [-1] + [i for i, t in enumerate(ids) if t == IMG] + [len(ids)]
        chunks = [(ids[idxs[i] + 1: idxs[i + 1]], labs[idxs[i] + 1: idxs[i + 1]])
                  for i in range(len(idxs) - 1)]
        seq = []
        need_to_stop = False
        for i, (ctok, clab) in enumerate(chunks):
            if not need_to_stop:
                seq += [(("text", t), l, 0) for t, l in zip(ctok, clab)]
            if i < n_img:
                answer = bool(clab) and clab[-1] == IM_START_TOKEN_ID
                if len(seq) + K > max_len:
                    need_to_stop = True
                    placeholders.append(cur_image_idx)
                else:
                    for j in range(K):
                        seq.append((("img", cur_image_idx, j), IGNORE_INDEX,
                                    1 if answer else 0))
                    if not answer:
                        placeholders.append(cur_image_idx)
                cur_image_idx += 1
        out.append(seq[:max_len])
    return out, placeholders


def check_equivalence(input_ids, labels, T, N, padding_side="right", K=K):
    packed = pack_sequences(input_ids, labels, K, T, N, padding_side)
    ref, placeholders = reference_splice(input_ids, labels, K, T)

    for b, seq in enumerate(ref):
        L = len(seq)
        off = T - L if padding_side == "left" else 0
        # padding region
        for t in range(T):
            inside = off <= t < off + L
            assert packed.attn_mask[b, t] == (1 if inside else 0)
        for s, (key, lab, imgpos) in enumerate(seq):
            t = off + s
            assert packed.position_ids[b, t] == s
            assert packed.labels[b, t] == lab
            assert packed.image_ar_mask[b, t] == imgpos
            if key[0] == "text":
                assert not packed.is_image[b, t]
                assert packed.tokens[b, t] == key[1]
            else:
                _, slot, j = key
                assert packed.is_image[b, t]
                assert packed.img_gather_idx[b, t] == slot * K + j

    # AR plan covers exactly the answer-image tokens, teacher-forced by one
    valid = packed.ar_valid.astype(bool)
    assert valid.sum() == packed.image_ar_mask.sum()
    for b, p, ti in zip(packed.ar_batch_idx[valid], packed.ar_pred_pos[valid],
                        packed.ar_target_idx[valid]):
        assert packed.image_ar_mask[b, p + 1] == 1
        assert packed.img_gather_idx[b, p + 1] == ti
    # placeholder slots contribute no AR tokens
    used_targets = set(packed.ar_target_idx[valid] // K)
    assert used_targets.isdisjoint(set(placeholders))
    return packed


def test_basic_answer_image():
    # "q q <start>[lab=start] <img> <end> a a" — answer image (label before
    # sentinel is <image_start>)
    ids = [[5, 6, IM_START_TOKEN_ID, IMG, 128257, 7, 8]]
    labs = [[IGNORE_INDEX, IGNORE_INDEX, IM_START_TOKEN_ID, 0, 128257, 7, 8]]
    p = check_equivalence(ids, labs, T=16, N=2)
    assert p.image_ar_mask.sum() == K
    assert p.ar_valid.sum() == K


def test_prompt_image_not_answer():
    # prompt image: label before sentinel is IGNORE -> no AR loss
    ids = [[5, IM_START_TOKEN_ID, IMG, 128257, 7]]
    labs = [[IGNORE_INDEX] * 5]
    p = check_equivalence(ids, labs, T=12, N=1)
    assert p.image_ar_mask.sum() == 0
    assert p.ar_valid.sum() == 0
    assert p.is_image.sum() == K


def test_text_only_consumes_slot():
    ids = [[1, 2, 3], [5, IM_START_TOKEN_ID, IMG, 7]]
    labs = [[1, 2, 3], [IGNORE_INDEX, IM_START_TOKEN_ID, 0, 7]]
    p = check_equivalence(ids, labs, T=10, N=2)
    # sample 0 consumed slot 0 (placeholder); sample 1's image is slot 1
    assert p.img_gather_idx[1][p.is_image[1]][0] == 1 * K


def test_truncation_stop_quirk():
    # image would exceed max_len -> dropped to placeholder, later text dropped,
    # but a later smaller image may still be spliced (reference control flow)
    ids = [[1, 2, 3, 4, 5, IM_START_TOKEN_ID, IMG, 6, 7, 8, IMG, 9]]
    labs = [[IGNORE_INDEX] * 5 + [IM_START_TOKEN_ID, 0] + [IGNORE_INDEX] * 5]
    # len before first image = 6; 6+4=10 > 8 -> stop; second image: 6+4 >8 -> stop
    p = check_equivalence(ids, labs, T=8, N=2)
    assert p.is_image.sum() == 0
    assert p.attn_mask[0].sum() == 6


def test_multi_image_multi_sample():
    ids = [
        [1, IM_START_TOKEN_ID, IMG, 128257, 2, IM_START_TOKEN_ID, IMG, 128257, 3],
        [4, 5, IMG, 6],
        [9, 9, 9],
    ]
    labs = [
        [IGNORE_INDEX, IM_START_TOKEN_ID, 0, 128257, IGNORE_INDEX,
         IM_START_TOKEN_ID, 0, 128257, 3],
        [IGNORE_INDEX] * 4,
        [9, 9, 9],
    ]
    p = check_equivalence(ids, labs, T=24, N=4)
    assert p.image_slot_used.sum() == 3  # slots 0,1 (sample0), 2 (sample1); 3=text-only placeholder
    assert p.ar_valid.sum() == 2 * K


def test_left_padding():
    ids = [[5, IM_START_TOKEN_ID, IMG, 7], [1, 2]]
    labs = None
    p = pack_sequences(ids, labs, K, 12, 2, padding_side="left")
    assert p.attn_mask[0, :12 - (4 - 1 + K)].sum() == 0
    assert p.attn_mask[0].sum() == 3 + K
    assert p.attn_mask[1].sum() == 2
    assert p.attn_mask[1, -2:].all()


def test_slot_overflow_raises():
    ids = [[IMG], [IMG]]
    with pytest.raises(ValueError):
        pack_sequences(ids, None, K, 8, 1)


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_vs_reference_splice(seed):
    """Randomized packer fuzz against the reference-splice emulation: random
    image placement, answer/prompt mixes, truncation pressure, both paddings."""
    import random

    rng = random.Random(seed)
    K = rng.choice([2, 3, 4])
    T = rng.choice([16, 24, 40])
    B = rng.randint(1, 4)
    ids, labs = [], []
    n_slots = 0
    for _ in range(B):
        row_i, row_l = [128000], [IGNORE_INDEX]
        n_img = rng.randint(0, 4)
        n_slots += max(n_img, 1)
        for _ in range(n_img):
            for _ in range(rng.randint(0, 8)):
                t = rng.randint(10, 500)
                row_i.append(t)
                row_l.append(t if rng.random() < 0.4 else IGNORE_INDEX)
            if rng.random() < 0.5:  # answer image
                row_i.append(IM_START_TOKEN_ID)
                row_l.append(IM_START_TOKEN_ID)
            row_i.append(IMG)
            row_l.append(IGNORE_INDEX)
        for _ in range(rng.randint(0, 6)):
            t = rng.randint(10, 500)
            row_i.append(t)
            row_l.append(t)
        ids.append(row_i)
        labs.append(row_l)
    side = rng.choice(["right", "left"])
    check_equivalence(ids, labs, T=T, N=n_slots + 1, padding_side=side, K=K)
