"""Serving CLI smoke: exported checkpoint -> JSONL of requests (image +
text-only) -> continuous-batching engine -> completions JSONL. Tokenizer
stubbed like test_e2e_demo."""

import json
import sys

import numpy as np
import pytest

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig)
from tests.test_e2e_demo import FakeTokenizer, _FakeTransformers

CFG = MetaMorphConfig(
    llama=LlamaConfig.tiny(vocab_size=128258),
    siglip=SiglipConfig.tiny(),
    mm=MultimodalConfig(num_image_tokens=4),
    train=TrainConfig(max_seq_len=64),
)


def test_serve_cli_e2e(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from metamorph_tpu.models.metamorph import init_metamorph_params
    from metamorph_tpu.train.checkpoint import export_hf

    params = init_metamorph_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    model_dir = tmp_path / "model"
    export_hf(str(model_dir), params, CFG)

    img_path = tmp_path / "cat.jpg"
    Image.fromarray(np.full((60, 80, 3), 77, np.uint8)).save(img_path)

    reqs = tmp_path / "reqs.jsonl"
    with open(reqs, "w") as f:
        f.write(json.dumps({"prompt": "what is it", "image": str(img_path),
                            "uid": "img1", "max_new_tokens": 5}) + "\n")
        f.write(json.dumps({"prompt": "hello there", "image": None,
                            "uid": "txt1", "max_new_tokens": 4}) + "\n")

    out_path = tmp_path / "completions.jsonl"
    import metamorph_tpu.inference.serve_cli as cli

    monkeypatch.setitem(sys.modules, "transformers", _FakeTransformers())
    rc = cli.main([
        "--model-path", str(model_dir),
        "--tokenizer", "fake",
        "--requests", str(reqs),
        "--out", str(out_path),
        "--n-slots", "2",
        "--max-cache-len", "64",
        "--max-new-tokens", "6",
    ])
    assert rc == 0
    rows = [json.loads(l) for l in open(out_path)]
    assert sorted(r["uid"] for r in rows) == ["img1", "txt1"]
    for r in rows:
        assert r["steps"] >= 1
        assert isinstance(r["text"], str)
