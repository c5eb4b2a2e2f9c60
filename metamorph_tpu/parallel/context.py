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


def set_current_mesh(mesh: Optional[Mesh]) -> None:
    global _current_mesh
    _current_mesh = mesh


def get_current_mesh() -> Optional[Mesh]:
    return _current_mesh


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
