"""Parameter / activation sharding rules (FSDP ≈ ZeRO-3, tensor ≈ TP).

The reference gets parameter sharding from DeepSpeed ZeRO-3 (`scripts/zero3.json`)
and optimizer-state sharding from ZeRO-2 (`scripts/zero2.json`). Here both fall out
of one rule set: params are annotated with PartitionSpecs over the ('fsdp','tensor')
mesh axes and the optimizer state pytree inherits the same specs, so XLA emits the
equivalent all-gather / reduce-scatter collectives over ICI.

Rules are (regex over the pytree path) -> PartitionSpec, first match wins.
Leaf dims that don't divide the mesh axis fall back to replication on that dim.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (path regex, spec builder taking ndim) — matched against "/"-joined path keys.
# Layer-stacked leaves carry a leading L dim which is never sharded.
_RULES: Sequence[Tuple[str, Tuple] ] = (
    # LLaMA decoder
    (r"llama/embed/embedding$",        ("tensor", "fsdp")),
    (r"llama/.*attn/wq$",              (None, "fsdp", "tensor")),
    (r"llama/.*attn/wk$",              (None, "fsdp", "tensor")),
    (r"llama/.*attn/wv$",              (None, "fsdp", "tensor")),
    (r"llama/.*attn/wo$",              (None, "tensor", "fsdp")),
    (r"llama/.*mlp/w_gate$",           (None, "fsdp", "tensor")),
    (r"llama/.*mlp/w_up$",             (None, "fsdp", "tensor")),
    (r"llama/.*mlp/w_down$",           (None, "tensor", "fsdp")),
    (r"llama/lm_head/kernel$",         ("fsdp", "tensor")),
    # SigLIP ViT (stacked layers likewise)
    (r"siglip/.*attn/(wq|wk|wv)/kernel$",  (None, "fsdp", "tensor")),
    (r"siglip/.*attn/wo/kernel$",          (None, "tensor", "fsdp")),
    (r"siglip/.*mlp/fc1/kernel$",          (None, "fsdp", "tensor")),
    (r"siglip/.*mlp/fc2/kernel$",          (None, "tensor", "fsdp")),
    (r"siglip/patch_embed/kernel$",        (None, None, None, "fsdp")),
    (r"siglip/pos_embed$",                 (None, "fsdp")),
    # Connector / heads: 2-D kernels sharded fsdp x tensor
    (r"(projector|vision_head|adapter)/.*kernel$", ("fsdp", "tensor")),
    # everything else (norm scales, biases) replicated
    (r".*", ()),
)


def _spec_for_path(path_str: str, ndim: int) -> P:
    for pattern, axes in _RULES:
        if re.search(pattern, path_str):
            axes = tuple(axes)[:ndim]
            axes = axes + (None,) * (ndim - len(axes))
            return P(*axes)
    return P()


def _path_to_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def partition_specs(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree for a param pytree, validated against the mesh.

    A dim whose size does not divide its assigned mesh-axis size is replicated
    instead (keeps tiny test configs working on an 8-way mesh).
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def spec(path, leaf):
        # works for arrays AND ShapeDtypeStructs (eval_shape templates, e.g.
        # optimizer-state trees whose paths end in the param path under mu/nu)
        shape = tuple(getattr(leaf, "shape", np.shape(leaf)))
        ndim = len(shape)
        s = _spec_for_path(_path_to_str(path), ndim)
        fixed = []
        for dim, ax in enumerate(tuple(s) + (None,) * (ndim - len(s))):
            if ax is None:
                fixed.append(None)
                continue
            size = axis_sizes.get(ax, 1)
            fixed.append(ax if shape[dim] % size == 0 else None)
        return P(*fixed)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree onto the mesh according to the rules."""
    specs = partition_specs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def named_shardings(params: Any, mesh: Mesh) -> Any:
    specs = partition_specs(params, mesh)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))
