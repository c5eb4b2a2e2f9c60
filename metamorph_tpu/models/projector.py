"""MM projector (connector) and vision head as pure functions.

Parity targets:
  * projector types linear / mlpNx_gelu / mlpsoftmax / identity —
    `metamorph/model/multimodal_projector/builder.py:39-64`;
  * vision head types linear / mlp / mlp2x_gelu / default(-> Linear to 1152) —
    `metamorph/model/language_model/metamorph_llama.py:246-269`.

Param pytrees contain only arrays (activation schedule is derived statically
from the type string so optimizer/sharding tree-maps stay clean).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _dense_init(key, d_in, d_out, dtype):
    # torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for W and b
    bound = d_in ** -0.5
    kk, kb = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(kk, (d_in, d_out), jnp.float32, -bound, bound).astype(dtype),
        "bias": jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound).astype(dtype),
    }


def projector_spec(kind: str, d_in: int, d_hidden: int, d_out: int
                   ) -> Tuple[List[Tuple[int, int]], List[Optional[str]]]:
    """(layer dims, activation after each layer) for a projector type."""
    if kind == "identity":
        return [], []
    if kind == "linear":
        return [(d_in, d_out)], [None]
    if kind == "mlpsoftmax":
        return [(d_in, d_hidden), (d_hidden, d_out)], ["softmax", None]
    m = re.match(r"^mlp(\d+)x_gelu$", kind)
    if m:
        depth = int(m.group(1))
        if depth == 1:
            return [(d_in, d_out)], [None]
        dims = ([(d_in, d_hidden)] + [(d_hidden, d_hidden)] * (depth - 2)
                + [(d_hidden, d_out)])
        return dims, ["gelu"] * (depth - 1) + [None]
    raise ValueError(f"Unknown projector type: {kind}")


def head_spec(kind: str, d_model: int, d_vision: int
              ) -> Tuple[List[Tuple[int, int]], List[Optional[str]]]:
    """(layer dims, acts) for a vision-head type (metamorph_llama.py:246-269).
    Note 'linear' is D->D in the reference; the default branch is D->1152."""
    if kind == "linear":
        return [(d_model, d_model)], [None]
    if kind == "mlp":
        return [(d_model, d_model), (d_model, d_vision)], ["gelu", None]
    if kind == "mlp2x_gelu":
        return ([(d_model, d_model), (d_model, d_model), (d_model, d_vision)],
                ["gelu", "gelu", None])
    return [(d_model, d_vision)], [None]


def _init_stack(rng, dims, dtype) -> Params:
    keys = jax.random.split(rng, max(len(dims), 1))
    return {f"w{i}": _dense_init(k, di, do, dtype)
            for i, (k, (di, do)) in enumerate(zip(keys, dims))}


def init_projector(rng, kind: str, d_in: int, d_out: int, dtype=jnp.bfloat16,
                   d_hidden: Optional[int] = None) -> Params:
    """mm_projector: vision dim (1152) -> LLM hidden. mlpNx_gelu hidden width =
    LLM hidden size (builder.py:52-59)."""
    dims, _ = projector_spec(kind, d_in, d_hidden or d_out, d_out)
    return _init_stack(rng, dims, dtype)


def init_vision_head(rng, kind: str, d_model: int, d_vision: int = 1152,
                     dtype=jnp.bfloat16) -> Params:
    dims, _ = head_spec(kind, d_model, d_vision)
    return _init_stack(rng, dims, dtype)


def apply_stack(params: Params, acts: Sequence[Optional[str]], x: jnp.ndarray) -> jnp.ndarray:
    for i, act in enumerate(acts):
        layer = params[f"w{i}"]
        x = x @ layer["kernel"] + layer["bias"]
        if act == "gelu":
            # torch nn.GELU default = exact erf gelu
            x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
        elif act == "softmax":
            x = jax.nn.softmax(x.astype(jnp.float32), axis=-1).astype(x.dtype)
    return x
