"""Checkpoint consolidation CLI.

Equivalent of `metamorph/model/consolidate.py:10-27` (which re-saves an HF
checkpoint; broken as shipped — it imports a nonexistent helper). Here:
load a sharded Orbax train-state checkpoint and emit a gathered HF-format
safetensors export.

    python -m metamorph_tpu.consolidate --src ./out/stage2 --dst ./export
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="training output dir (step_* inside)")
    p.add_argument("--dst", required=True)
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from metamorph_tpu.config import MetaMorphConfig
    from metamorph_tpu.models.metamorph import init_metamorph_params
    from metamorph_tpu.train import checkpoint as C

    path = C.latest_checkpoint(args.src)
    if path is None:
        raise SystemExit(f"no step_* checkpoint under {args.src}")
    with open(os.path.join(path, "config.json")) as f:
        cfg = MetaMorphConfig.from_json(f.read())

    import jax.numpy as jnp

    from metamorph_tpu.train.train_step import init_train_state

    params = init_metamorph_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    template = init_train_state(params, cfg)
    state = C.restore_train_state(path, template)
    C.export_hf(args.dst, state["params"], cfg)
    print(f"exported {path} -> {args.dst}")


if __name__ == "__main__":
    main()
