#!/usr/bin/env python
"""On-chip validation of the host-offloaded optimizer pipeline (the pytest
variant skips on CPU: pinned_host placement is a TPU custom-call). Runs two
steps of a tiny model with on-device vs host-offloaded moments and checks
loss equality + param closeness + the moments' pinned_host placement.

    python scripts/check_offload_tpu.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from metamorph_tpu.config import (LlamaConfig, MeshConfig, MetaMorphConfig,
                                  MultimodalConfig, SiglipConfig, TrainConfig)
from metamorph_tpu.models import metamorph as M
from metamorph_tpu.multimodal.packing import batch_to_arrays, pack_sequences
from metamorph_tpu.parallel.mesh import build_mesh
from metamorph_tpu.train.train_step import make_sharded_train_step


def tiny_cfg(**kw):
    return MetaMorphConfig(
        llama=LlamaConfig.tiny(vocab_size=128258),
        siglip=SiglipConfig.tiny(),
        mm=MultimodalConfig(num_image_tokens=4),
        train=TrainConfig(max_seq_len=48, batch_size=2,
                          max_images_per_batch=4, **kw),
    )


def make_batch(cfg):
    rng = np.random.default_rng(0)
    ids = [[5, 6, -200, 7, 8], [9, -200, 10, 11, 12]]
    labs = [[5, 6, -200, 7, 8], [9, -200, 10, 11, 12]]
    packed = pack_sequences(ids, labs, cfg.mm.num_image_tokens,
                            cfg.train.max_seq_len,
                            cfg.train.max_images_per_batch)
    batch = {k: jnp.asarray(v) for k, v in batch_to_arrays(packed).items()}
    S = cfg.siglip.image_size
    pixels = jnp.asarray(rng.normal(size=(4, S, S, 3)).astype(np.float32))
    return batch, pixels


def main():
    assert jax.default_backend() == "tpu", "run on the TPU chip"
    base, off = tiny_cfg(), tiny_cfg(offload_optimizer=True)
    batch, pixels = make_batch(base)
    mesh = build_mesh(MeshConfig(data=1, fsdp=1, tensor=1),
                      devices=jax.devices()[:1])

    results = {}
    for name, cfg in (("device", base), ("host", off)):
        # re-init per run: the step donates its state, so the first run's
        # params buffers are consumed (same PRNGKey -> identical values)
        params = M.init_metamorph_params(jax.random.PRNGKey(3), base,
                                         dtype=jnp.float32)
        step_fn, tx, state_sh, bs_fn = make_sharded_train_step(cfg, mesh, params)
        state = {"params": params,
                 "opt_state": jax.device_put(tx.init(params),
                                             state_sh["opt_state"]),
                 "step": jnp.zeros((), jnp.int32)}
        bs = bs_fn(batch)
        b = {k: jax.device_put(v, bs[k]) for k, v in batch.items()}
        for _ in range(2):
            state, m = step_fn(state, b, pixels)
        jax.block_until_ready(jax.tree.leaves(state["params"])[0])
        results[name] = (state, float(m["loss"]), float(m["grad_norm"]))

    assert results["host"][1] == results["device"][1], \
        (results["host"][1], results["device"][1])
    kinds = {l.sharding.memory_kind
             for l in jax.tree.leaves(results["host"][0]["opt_state"])
             if hasattr(l, "sharding")}
    assert "pinned_host" in kinds, kinds
    for a, b in zip(jax.tree.leaves(results["device"][0]["params"]),
                    jax.tree.leaves(results["host"][0]["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    print("offload-vs-device: loss equal, params match, moments pinned_host; "
          f"grad_norm={results['host'][2]:.4f} OK")


if __name__ == "__main__":
    main()
