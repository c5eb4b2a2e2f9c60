"""llama3 round-masking golden tests with a fake bos-prepending tokenizer."""

import re

import numpy as np

from metamorph_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from metamorph_tpu.train.masking import (preprocess, preprocess_llama3,
                                         preprocess_multimodal, preprocess_plain)

BOS = 128000
SPECIALS = ["<|begin_of_text|>", "<|start_header_id|>", "<|end_header_id|>",
            "<|eot_id|>", "<image_start>", "<image_end>"]
_SPECIAL_IDS = {s: 200000 + i for i, s in enumerate(SPECIALS)}


def fake_tokenize(text):
    """Word/special-token tokenizer that prepends bos, like HF llama3."""
    pattern = "(" + "|".join(re.escape(s) for s in SPECIALS) + ")"
    ids = [BOS]
    for chunk in re.split(pattern, text):
        if not chunk:
            continue
        if chunk in _SPECIAL_IDS:
            ids.append(_SPECIAL_IDS[chunk])
        else:
            for w in chunk.split():
                ids.append(1000 + (hash(w) % 50000))
    return ids


def decode_positions(ids, labels):
    return [(i, t, l != IGNORE_INDEX) for i, (t, l) in enumerate(zip(ids, labels))]


def test_single_round_masks_instruction_only():
    sources = [[{"from": "human", "value": "What is this"},
                {"from": "gpt", "value": "A cat"}]]
    out = preprocess_llama3(sources, fake_tokenize)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert len(ids) == len(labels)
    # supervised positions are exactly the assistant response + trailing eot
    supervised = [t for t, l in zip(ids, labels) if l != IGNORE_INDEX]
    a, cat = fake_tokenize("A cat")[1:], None
    assert supervised[:len(a)] == a
    assert supervised[-1] == _SPECIAL_IDS["<|eot_id|>"]
    # everything supervised equals its own token (labels == ids there)
    for t, l in zip(ids, labels):
        if l != IGNORE_INDEX:
            assert l == t


def test_multi_round():
    sources = [[{"from": "human", "value": "q one"},
                {"from": "gpt", "value": "a one"},
                {"from": "human", "value": "q two"},
                {"from": "gpt", "value": "a two"}]]
    out = preprocess_llama3(sources, fake_tokenize)
    ids, labels = out["input_ids"][0], out["labels"][0]
    sup = [t for t, l in zip(ids, labels) if l != IGNORE_INDEX]
    a1 = fake_tokenize("a one")[1:]
    a2 = fake_tokenize("a two")[1:]
    eot = _SPECIAL_IDS["<|eot_id|>"]
    assert sup == a1 + [eot] + a2 + [eot]


def test_image_sentinel_and_wrap():
    sources = [[{"from": "human", "value": "<image>\ndescribe"},
                {"from": "gpt", "value": "a dog"}]]
    preprocess_multimodal(sources, mm_use_im_start_end=True)
    assert sources[0][0]["value"].startswith("<image_start><image><image_end>")
    out = preprocess(sources, fake_tokenize, has_image=True)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert IMAGE_TOKEN_INDEX in ids
    # the sentinel is masked; the <image_start>/<image_end> wrap is in the ids
    i = ids.index(IMAGE_TOKEN_INDEX)
    assert labels[i] == IGNORE_INDEX
    assert ids[i - 1] == _SPECIAL_IDS["<image_start>"]
    assert ids[i + 1] == _SPECIAL_IDS["<image_end>"]
    sup = [t for t, l in zip(ids, labels) if l != IGNORE_INDEX]
    assert sup == fake_tokenize("a dog")[1:] + [_SPECIAL_IDS["<|eot_id|>"]]


def test_answer_image_keeps_image_start_supervised():
    """For t2i targets the assistant message contains the image: the
    <image_start> before the sentinel must stay supervised (it drives the
    answer-image detection in packing, metamorph_arch.py:317)."""
    sources = [[{"from": "human", "value": "draw a cat"},
                {"from": "gpt", "value": "<image>"}]]
    preprocess_multimodal(sources, mm_use_im_start_end=True)
    out = preprocess(sources, fake_tokenize, has_image=True)
    ids, labels = out["input_ids"][0], out["labels"][0]
    i = ids.index(IMAGE_TOKEN_INDEX)
    assert ids[i - 1] == _SPECIAL_IDS["<image_start>"]
    assert labels[i - 1] == _SPECIAL_IDS["<image_start>"]  # supervised!


def test_plain():
    sources = [[{"from": "human", "value": "<image>"},
                {"from": "gpt", "value": "caption words here"}]]
    out = preprocess_plain(sources, fake_tokenize)
    ids, labels = out["input_ids"][0], out["labels"][0]
    n_masked = sum(1 for l in labels if l == IGNORE_INDEX)
    assert n_masked == len(fake_tokenize("<image>"))  # first turn masked
    assert labels[-1] == ids[-1]
