"""Task-level eval runner: scoring rules + end-to-end parity of the
ServeEngine-driven batch path against the certified single-request VQA path
(`eval.answer_parity.our_vqa`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig)
from metamorph_tpu.eval.runner import run_task, score_answer
from metamorph_tpu.models import metamorph as M

CFG = MetaMorphConfig(
    llama=LlamaConfig.tiny(vocab_size=128258),
    siglip=SiglipConfig.tiny(),
    mm=MultimodalConfig(num_image_tokens=4),  # perfect square: the SigLIP
    # interpolation reduction (encode_images) requires K = k*k
    train=TrainConfig(max_seq_len=64),
)


@pytest.fixture(scope="module")
def params():
    return M.init_metamorph_params(jax.random.PRNGKey(3), CFG,
                                   dtype=jnp.float32)


def tokenize(s):
    return [10 + (hash(w) % 400) for w in s.split()]


def detokenize(ids):
    return " ".join(str(t) for t in ids)


def test_score_answer_rules():
    # VQAv2 rule: >= 4 annotator answers -> min(hits/3, 1)
    golds10 = ["cat"] * 3 + ["dog"] * 7
    assert score_answer("Cat!", golds10, "vqa") == 1.0
    assert score_answer("dog", golds10, "vqa") == 1.0
    assert score_answer("bird", golds10, "vqa") == 0.0
    golds_two_hits = ["cat", "cat", "dog", "dog"]
    assert score_answer("cat", golds_two_hits, "vqa") == pytest.approx(2 / 3)
    # few golds -> plain normalized match
    assert score_answer("The cat", ["cat"], "vqa") == 1.0
    assert score_answer("a cat.", ["cat"], "exact") == 1.0
    assert score_answer("cats", ["cat"], "exact") == 0.0
    # substring relaxation
    assert score_answer("it is clearly a cat indeed", ["cat"], "substring") \
        == 1.0
    assert score_answer("nothing here", ["cat"], "substring") == 0.0


def _gold_rows(params, questions, frames_by_row, max_new):
    """Gold answers from the certified single-request path (our_vqa)."""
    from metamorph_tpu.eval.answer_parity import our_vqa

    rows = []
    for q, frames in zip(questions, frames_by_row):
        out = our_vqa(params, CFG, tokenize, frames, q,
                      max_new_tokens=max_new)
        rows.append({"question": q, "answer": detokenize(out["answer_ids"])})
    return rows


def test_run_task_text_only_matches_single_request(params):
    questions = ["what color is sky", "how many dogs are there",
                 "is this real"]
    rows = _gold_rows(params, questions, [[]] * 3, max_new=6)
    res = run_task(params, CFG, tokenize, detokenize, rows,
                   metric="exact", n_slots=2, max_cache_len=64,
                   max_new_tokens=6,
                   engine_kwargs={"prefill_buckets": (16, 32),
                                  "steps_per_sync": 2, "max_images": 2})
    assert res["n"] == 3
    assert res["accuracy"] == 1.0, res["predictions"]
    assert all(p is not None for p in res["predictions"])


def test_run_task_with_image_matches_single_request(params):
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)
    questions = ["describe the image", "what is shown"]
    rows = _gold_rows(params, questions, [[frame], [frame]], max_new=5)

    def load_frames(row):
        return [frame]

    res = run_task(params, CFG, tokenize, detokenize, rows,
                   load_frames=load_frames, metric="exact", n_slots=2,
                   max_cache_len=64, max_new_tokens=5,
                   engine_kwargs={"prefill_buckets": (32,),
                                  "steps_per_sync": 2, "max_images": 2})
    assert res["accuracy"] == 1.0, res["predictions"]
