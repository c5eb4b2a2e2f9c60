"""Masking/splice parity under a REAL byte-level BPE tokenizer.

Closes the last unfalsified correctness risk from PARITY_r03: the round-length
arithmetic in `train/masking.py` (`/root/reference/metamorph/train/train.py:
501-597`) and the bos-dedup splice in `multimodal/mm_utils.py`
(`mm_utils.py:191-214`) fuzz-checked against an independent torch-side
reimplementation of the reference, both driven by a LLaMA-3-style byte-level
BPE trained locally (`scripts/make_bpe_tokenizer.py`)."""

import copy
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = "/tmp/metamorph_test_bpe_tokenizer_v1"


@pytest.fixture(scope="module")
def bpe_dir():
    marker = os.path.join(CACHE, "tokenizer.json")
    if not os.path.exists(marker):
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "make_bpe_tokenizer.py"),
             "--out", CACHE, "--vocab-size", "4000"],
            check=True, cwd=REPO, env=dict(os.environ, PYTHONPATH=REPO))
    return CACHE


@pytest.fixture(scope="module")
def tok(bpe_dir):
    from transformers import AutoTokenizer

    t = AutoTokenizer.from_pretrained(bpe_dir)
    t.add_tokens(["<image_start>", "<image_end>"])
    t.pad_token = t.eos_token
    return t


def test_bpe_tokenizer_shape(tok):
    """Base vocab exactly 128256; LLaMA-3 special ids; image tokens land on
    128256/128257 like the reference resize (`metamorph_arch.py:427-446`)."""
    assert tok.bos_token_id == 128000
    assert tok("<|eot_id|>").input_ids == [128000, 128009]
    assert tok.convert_tokens_to_ids(
        ["<image_start>", "<image_end>"]) == [128256, 128257]


def test_bpe_byte_level_roundtrip(tok):
    import random

    rng = random.Random(0)
    for _ in range(100):
        s = "".join(rng.choice("aé中😀' .\n\t<|>:0") for _ in
                    range(rng.randrange(1, 40)))
        ids = tok(s).input_ids
        assert ids[0] == 128000
        assert tok.decode(ids[1:]) == s


def test_fuzz_llama3_and_plain(bpe_dir):
    from metamorph_tpu.eval.tokenizer_parity import run_fuzz

    stats = run_fuzz(bpe_dir, n=150, seed=7)
    assert stats["pass"], stats
    assert stats["ids_mismatch"] == 0
    assert stats["labels_mismatch"] == 0
    assert stats["invariant_fail"] == 0
    assert stats["splice_fail"] == 0


def test_round_arithmetic_closes_on_bpe(tok):
    """The per-round re-tokenizations must sum to the one-shot tokenization
    even with merge-prone content (no mismatch warning -> labels survive)."""
    import warnings

    from metamorph_tpu.constants import IGNORE_INDEX
    from metamorph_tpu.train.masking import preprocess_llama3

    tokenize = lambda s: tok(s).input_ids  # noqa: E731
    sources = [[
        {"from": "human", "value": "don't you think it's... odd?!"},
        {"from": "gpt", "value": "\n\nYes — naïve 😀 indeed."},
        {"from": "human", "value": "assistant<|end"},
        {"from": "gpt", "value": "ok"},
    ]]
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a mismatch warning fails the test
        out = preprocess_llama3(copy.deepcopy(sources), tokenize,
                                has_image=False,
                                bos_token_id=tok.bos_token_id)
    labels = out["labels"][0]
    assert any(l != IGNORE_INDEX for l in labels)


def test_parity_holds_on_boundary_merging_answer(tok):
    """An answer starting with '\\n' merges with the header's trailing
    newline into one pre-token; the mask boundary shifts identically on both
    sides (a reference behavior, reproduced deliberately)."""
    from metamorph_tpu.eval.tokenizer_parity import ref_preprocess_llama3
    from metamorph_tpu.train.masking import preprocess_llama3

    tokenize = lambda s: tok(s).input_ids  # noqa: E731
    sources = [[{"from": "human", "value": "q <image>"},
                {"from": "gpt", "value": "\nanswer with leading newline"}]]
    ours = preprocess_llama3(copy.deepcopy(sources), tokenize, has_image=True,
                             bos_token_id=tok.bos_token_id)
    ref_ids, ref_labels = ref_preprocess_llama3(copy.deepcopy(sources), tok,
                                                has_image=True)
    assert ours["input_ids"][0] == ref_ids[0].tolist()
    assert ours["labels"][0] == ref_labels[0].tolist()
