"""Process-wide mesh context for activation sharding constraints.

`make_sharded_train_step` registers its mesh here; model code calls
`constrain(x, spec)` to pin activation layouts (batch over (data, fsdp)),
which stops GSPMD from picking conflicting shardings between the forward and
backward graphs (the "involuntary full rematerialization" warnings).
Single-device / no-mesh runs are unaffected (no-op).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_current_mesh: Optional[Mesh] = None
_sequence_axis: Optional[str] = None


def set_current_mesh(mesh: Optional[Mesh]) -> None:
    global _current_mesh
    _current_mesh = mesh


def get_current_mesh() -> Optional[Mesh]:
    return _current_mesh


def set_sequence_axis(axis: Optional[str]) -> None:
    """Enable sequence parallelism: [B, T, ...] activations shard T over
    `axis` (and batch over 'data' only) instead of batch over (data, fsdp).
    Registered by `make_sharded_train_step` when
    `TrainConfig.sequence_parallel` is set; None disables."""
    global _sequence_axis
    _sequence_axis = axis


def get_sequence_axis() -> Optional[str]:
    return _sequence_axis


def act_spec(ndim: int) -> P:
    """PartitionSpec for a [B, T, ...] activation under the current parallel
    mode: batch over (data, fsdp) by default; batch over data + sequence over
    the registered sequence axis when sequence parallelism is on."""
    if _sequence_axis is not None:
        return P("data", _sequence_axis, *([None] * (ndim - 2)))
    return P(("data", "fsdp"), *([None] * (ndim - 1)))


def constrain(x, spec: P):
    """with_sharding_constraint against the registered mesh (no-op without)."""
    if _current_mesh is None:
        return x
    axes = set(_current_mesh.axis_names)

    def ok(entry):
        if entry is None:
            return None
        if isinstance(entry, tuple):
            picked = tuple(a for a in entry if a in axes)
            return picked if picked else None
        return entry if entry in axes else None

    clean = P(*(ok(e) for e in spec))
    return jax.lax.with_sharding_constraint(x, NamedSharding(_current_mesh, clean))
