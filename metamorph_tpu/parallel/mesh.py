"""Device mesh construction.

Replaces the reference's distributed backend (NCCL process groups +
DeepSpeed ZeRO configs, `visualization/train.py:260-263`, `scripts/zero*.json`):
on TPU the "communication backend" is a `jax.sharding.Mesh` plus sharding rules —
XLA emits all-gather / reduce-scatter over ICI/DCN from the annotations.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metamorph_tpu.config import MeshConfig


def build_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    """Build a (data, fsdp, tensor) mesh over the available devices.

    Any axis set to -1 absorbs the remaining devices. The fsdp axis plays the
    role of ZeRO-3 parameter sharding; optimizer states inherit the same layout
    (ZeRO-2 comes for free once grads/params are sharded).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    sizes = [cfg.data, cfg.fsdp, cfg.tensor]
    n_fixed = int(np.prod([s for s in sizes if s != -1]))
    n_auto = sum(1 for s in sizes if s == -1)
    if n_auto > 1:
        raise ValueError("at most one mesh axis may be -1")
    if n_auto == 1:
        rest = n // n_fixed
        sizes = [rest if s == -1 else s for s in sizes]
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {sizes} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, cfg.axis_names)


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1), ("data", "fsdp", "tensor"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over both data and fsdp axes (DP dimension = data*fsdp)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
