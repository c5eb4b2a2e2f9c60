"""Checkpoint tests: full save/restore (incl. sharded), adapter roundtrip,
latest/prune, HF export readable by the import path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig, MeshConfig)
from metamorph_tpu.models import metamorph as M
from metamorph_tpu.train import checkpoint as C
from metamorph_tpu.train.optimizer import make_optimizer
from metamorph_tpu.train.train_step import init_train_state

CFG = MetaMorphConfig(
    llama=LlamaConfig.tiny(vocab_size=1024),
    siglip=SiglipConfig.tiny(),
    mm=MultimodalConfig(num_image_tokens=4),
    train=TrainConfig(max_seq_len=32, total_steps=10),
)


@pytest.fixture(scope="module")
def params():
    return M.init_metamorph_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def assert_trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_restore_roundtrip(tmp_path, params):
    state = init_train_state(params, CFG)
    path = C.save_train_state(str(tmp_path), 5, state, CFG.to_json(),
                              data_state={"epoch": 0, "step_in_epoch": 7})
    assert C.latest_checkpoint(str(tmp_path)) == path
    template = jax.tree.map(np.zeros_like, state)
    restored = C.restore_train_state(path, template)
    assert_trees_equal(state, restored)
    meta = C.restore_meta(path)
    assert meta["step"] == 5
    assert meta["data_state"]["step_in_epoch"] == 7


def test_prune(tmp_path, params):
    state = init_train_state(params, CFG)
    for s in (1, 2, 3):
        C.save_train_state(str(tmp_path), s, state)
    C.prune_checkpoints(str(tmp_path), keep=1)
    assert sorted(os.listdir(tmp_path)) == ["step_3"]


def test_adapter_roundtrip(tmp_path, params):
    path = str(tmp_path / "mm_projector.safetensors")
    C.save_adapter(path, params, include_embeddings=True)
    # perturb then reload
    other = M.init_metamorph_params(jax.random.PRNGKey(1), CFG, dtype=jnp.float32)
    merged = C.load_adapter(path, other)
    assert_trees_equal(merged["projector"], params["projector"])
    assert_trees_equal(merged["llama"]["embed"], params["llama"]["embed"])
    # untouched subtrees keep their values
    assert_trees_equal(merged["vision_head"], other["vision_head"])


def test_hf_export_import_roundtrip(tmp_path, params):
    out = str(tmp_path / "hf")
    C.export_hf(out, params, CFG)
    from metamorph_tpu.models.hf_import import (llama_params_from_hf,
                                                load_safetensors_dir,
                                                mlp_params_from_hf)

    tensors = load_safetensors_dir(os.path.join(out, "model.safetensors"))
    llama = llama_params_from_hf(tensors, CFG.llama, dtype=jnp.float32)
    assert_trees_equal(llama, params["llama"])
    head = mlp_params_from_hf(tensors, "vision_head", dtype=jnp.float32)
    assert_trees_equal(head, params["vision_head"])
    # export_hf writes HF-LlamaForCausalLM layout to config.json; the typed
    # framework config lives in metamorph_config.json (checkpoint.py:249)
    cfg2 = MetaMorphConfig.from_json(
        open(os.path.join(out, "metamorph_config.json")).read())
    assert cfg2.llama == CFG.llama


def test_sharded_save_restore(tmp_path, params, mesh8):
    from metamorph_tpu.parallel.sharding import shard_params

    sharded = shard_params(params, mesh8)
    path = C.save_train_state(str(tmp_path), 1, {"params": sharded})
    template = {"params": jax.tree.map(np.zeros_like, params)}
    restored = C.restore_train_state(path, template)
    assert_trees_equal(restored["params"], params)


def test_preemption_saver_signal():
    import os
    import signal

    from metamorph_tpu.train.checkpoint import PreemptionSaver

    saver = PreemptionSaver()
    assert not saver.should_save()
    os.kill(os.getpid(), signal.SIGUSR1)
    # signal delivery is synchronous for the same thread on return to python
    assert saver.should_save()
