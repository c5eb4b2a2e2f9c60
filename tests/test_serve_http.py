"""HTTP serving front-end: request/stream/error paths against a live
localhost server wrapping a tiny-model engine (single scheduler thread owns
JAX; handler threads only touch queues)."""

import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig)
from metamorph_tpu.inference.serve import ServeEngine
from metamorph_tpu.inference.serve_http import MetaMorphHTTPServer
from metamorph_tpu.models import metamorph as M

CFG = MetaMorphConfig(
    llama=LlamaConfig.tiny(vocab_size=128258),
    siglip=SiglipConfig.tiny(),
    mm=MultimodalConfig(num_image_tokens=3),
    train=TrainConfig(max_seq_len=64),
)


@pytest.fixture(scope="module")
def server():
    params = M.init_metamorph_params(jax.random.PRNGKey(7), CFG,
                                     dtype=jnp.float32)
    eng = ServeEngine(params, CFG, n_slots=2, max_cache_len=64,
                      max_new_tokens_cap=16, max_images=2,
                      prefill_buckets=(8, 16), steps_per_sync=2)
    srv = MetaMorphHTTPServer(eng, port=0,
                              decode=lambda ids: " ".join(map(str, ids)))
    srv.start()
    yield srv
    srv.stop()


def _post(srv, body, timeout=300):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/v1/completions",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def _ids(seed, n=6):
    return np.random.default_rng(seed).integers(10, 1000, n).tolist()


def test_http_completion_and_health(server):
    with _post(server, {"prompt_ids": _ids(0), "max_new_tokens": 6}) as r:
        out = json.loads(r.read())
    assert len(out["ids"]) == 6 and out["steps"] >= 6
    assert out["text"] == " ".join(map(str, out["ids"]))
    assert out["serve_s"] > 0

    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/health", timeout=30) as r:
        h = json.loads(r.read())
    assert h["ok"] and h["slots_free"] == 2


def test_http_streaming_matches_completion(server):
    ids = _ids(1)
    with _post(server, {"prompt_ids": ids, "max_new_tokens": 8}) as r:
        ref = json.loads(r.read())
    lines = []
    with _post(server, {"prompt_ids": ids, "max_new_tokens": 8,
                        "stream": True}) as r:
        for line in r:
            if line.strip():
                lines.append(json.loads(line))
    assert lines[-1]["done"] is True
    streamed = [t for l in lines[:-1] for t in l["ids"]]
    assert streamed == ref["ids"] == lines[-1]["ids"]
    assert len(lines) > 2            # arrived in several chunks
    assert "text" in lines[0]        # decoded incrementally


def test_http_concurrent_requests(server):
    """Two requests in flight on one engine via two client threads."""
    import threading
    results = {}

    def go(seed):
        with _post(server, {"prompt_ids": _ids(seed),
                            "max_new_tokens": 6}) as r:
            results[seed] = json.loads(r.read())

    ts = [threading.Thread(target=go, args=(s,)) for s in (2, 3)]
    [t.start() for t in ts]
    [t.join(timeout=300) for t in ts]
    assert len(results) == 2
    assert results[2]["ids"] != results[3]["ids"]
    # same prompt alone -> same greedy ids (engine state isolated per slot)
    with _post(server, {"prompt_ids": _ids(2), "max_new_tokens": 6}) as r:
        again = json.loads(r.read())
    assert again["ids"] == results[2]["ids"]


def test_http_sampling_deterministic_per_engine(server):
    """temperature>0 routes through the sampling graph over HTTP."""
    with _post(server, {"prompt_ids": _ids(4), "max_new_tokens": 6,
                        "temperature": 0.9, "top_p": 0.9}) as r:
        out = json.loads(r.read())
    assert len(out["ids"]) == 6


def test_http_errors(server):
    for bad in ({}, {"prompt": "no tokenizer"},
                {"prompt_ids": _ids(5), "max_new_tokens": 9999},
                {"prompt_ids": [], "max_new_tokens": 4}):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, bad)
        assert e.value.code == 400
        assert "error" in json.loads(e.value.read())
    # unknown path -> 404
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/nope", data=b"{}")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 404
