"""The jitted, GSPMD-sharded train step.

Replaces the reference's HF Trainer + DeepSpeed engine per-step path
(SURVEY.md §3.1): one `jax.jit` with parameter PartitionSpecs (fsdp axis =
ZeRO-3), batch sharded over (data, fsdp), XLA emitting all-gather /
reduce-scatter over ICI. Gradient accumulation is a `lax.scan` over
microbatches (`TrainConfig.grad_accum_steps`).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metamorph_tpu.config import MetaMorphConfig
from metamorph_tpu.models.metamorph import metamorph_forward
from metamorph_tpu.parallel.sharding import partition_specs
from metamorph_tpu.train.optimizer import make_optimizer

TrainState = Dict[str, Any]  # {"params", "opt_state", "step"}


def pixels_sharding(mesh: Mesh, n_slots: int, leading_microbatch: bool = False
                    ) -> NamedSharding:
    """Shard the image-slot axis over (data, fsdp) so the SigLIP encode divides
    across the mesh (replicated vision FLOPs were the round-1 multichip wart).
    Falls back to replication when the slot count doesn't divide the axes."""
    shards = mesh.shape.get("data", 1) * mesh.shape.get("fsdp", 1)
    spec = ("data", "fsdp") if n_slots % shards == 0 else None
    if leading_microbatch:
        return NamedSharding(mesh, P(None, spec))
    return NamedSharding(mesh, P(spec))


def init_train_state(params: Any, cfg: MetaMorphConfig) -> TrainState:
    tx = make_optimizer(cfg.train, params)
    return {"params": params, "opt_state": tx.init(params), "step": jnp.zeros((), jnp.int32)}


def loss_fn(params, cfg: MetaMorphConfig, batch, pixels, attn_impl="xla"):
    total, metrics = metamorph_forward(
        params, cfg, batch, pixels, attn_impl=attn_impl, remat=cfg.train.remat,
        remat_policy=cfg.train.remat_policy)
    return total, metrics


def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], pixels: jnp.ndarray,
               cfg: MetaMorphConfig, tx: optax.GradientTransformation,
               attn_impl: str = "xla") -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step (microbatching handled by the caller wrapper)."""
    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state["params"], cfg, batch, pixels, attn_impl)
    updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
    new_params = optax.apply_updates(state["params"], updates)
    metrics = dict(metrics)
    metrics["grad_norm"] = optax.global_norm(grads)
    return (
        {"params": new_params, "opt_state": new_opt, "step": state["step"] + 1},
        metrics,
    )


def accum_train_step(state, batches, pixels, cfg, tx, attn_impl="xla"):
    """Gradient accumulation: batches/pixels carry a leading microbatch axis.
    Grads are averaged over microbatches via lax.scan (constant memory)."""

    def micro(carry, inp):
        grads_acc, metrics_acc = carry
        b, px = inp
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], cfg, b, px, attn_impl)
        grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
        metrics_acc = jax.tree.map(jnp.add, metrics_acc, dict(metrics))
        return (grads_acc, metrics_acc), None

    zero_grads = jax.tree.map(jnp.zeros_like, state["params"])
    n = jax.tree.leaves(batches)[0].shape[0]
    zero_metrics = {
        "loss": 0.0, "loss_language": 0.0, "loss_image_ar": 0.0,
        "n_text_tokens": 0.0, "n_image_ar_tokens": 0.0}
    zero_metrics = jax.tree.map(jnp.float32, zero_metrics)
    (grads, metrics), _ = jax.lax.scan(micro, (zero_grads, zero_metrics), (batches, pixels))
    grads = jax.tree.map(lambda g: g / n, grads)
    metrics = jax.tree.map(lambda m: m / n, metrics)

    updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
    new_params = optax.apply_updates(state["params"], updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    return (
        {"params": new_params, "opt_state": new_opt, "step": state["step"] + 1},
        metrics,
    )


def make_sharded_train_step(cfg: MetaMorphConfig, mesh: Mesh, params_template: Any,
                            attn_impl: str = "xla"):
    """Compile the train step with explicit in/out shardings over the mesh.

    Returns (jitted_step, tx, state_shardings). Params/opt-state are sharded by
    the rule set (fsdp/tensor axes); batch arrays are sharded on their leading
    batch dim over (data, fsdp); the small AR-plan vectors and images are
    replicated (images could shard on N if N % mesh == 0).
    """
    tx = make_optimizer(cfg.train, params_template)

    from metamorph_tpu.parallel.context import (set_current_mesh,
                                                 set_sequence_axis)

    set_current_mesh(mesh)
    set_sequence_axis("fsdp" if cfg.train.sequence_parallel else None)

    param_specs = partition_specs({"__root__": params_template}, mesh)["__root__"]
    # opt_state mirrors param sharding; scalars replicated
    opt_state_template = jax.eval_shape(tx.init, params_template)

    # Optimizer-state specs: the moment trees nest the param tree under
    # mu/nu, so the same suffix-matched path rules resolve their shardings
    # (shape-based matching is ambiguous — distinct params can share shapes).
    opt_specs = partition_specs(opt_state_template, mesh)

    opt_kind = "pinned_host" if cfg.train.offload_optimizer else None

    def opt_sharding(s):
        if opt_kind:
            return NamedSharding(mesh, s, memory_kind=opt_kind)
        return NamedSharding(mesh, s)

    state_shardings = {
        "params": jax.tree.map(lambda s: NamedSharding(mesh, s), param_specs,
                               is_leaf=lambda x: isinstance(x, P)),
        "opt_state": jax.tree.map(opt_sharding, opt_specs,
                                  is_leaf=lambda x: isinstance(x, P)),
        "step": NamedSharding(mesh, P()),
    }

    if cfg.train.sequence_parallel:
        # [B, T] arrays: batch over data, sequence over fsdp
        batch_sh = NamedSharding(mesh, P("data", "fsdp"))
    else:
        batch_sh = NamedSharding(mesh, P(("data", "fsdp")))
    repl = NamedSharding(mesh, P())

    def batch_shardings(batch_template):
        out = {}
        for k, v in batch_template.items():
            # [B, T] arrays shard on batch; flat AR-plan vectors replicate
            out[k] = batch_sh if v.ndim == 2 else repl
        return out

    # pin the state's placement (incl. host-offloaded opt moments) across steps
    jit_kw = dict(donate_argnums=(0,),
                  in_shardings=(state_shardings, None, None),
                  out_shardings=(state_shardings, None))

    if opt_kind:
        # Host-offloaded optimizer: the moment fetch stays INSIDE the jitted
        # step (device_put to device shardings; out_shardings stream the new
        # moments back to pinned host). A two-program host-orchestrated
        # variant (H2D fetch dispatched before the grad program, D2H
        # write-back overlapping the next step) was tried in round 3 and
        # measured 3x WORSE on this runtime (4.6k vs 13.3k tok/s at 600m):
        # host-initiated transfers serialize over the remote-TPU tunnel
        # instead of overlapping with compute. Offload is a CAPACITY mode —
        # it fits models whose Adam moments don't — and trades throughput
        # (measured MFU 0.23 vs 0.49 on-device at 600m); the reference's
        # zero3_offload makes the same trade (`scripts/zero3_offload.json:28-45`).
        opt_dev_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), opt_specs,
                                  is_leaf=lambda x: isinstance(x, P))

        def fetch_opt(state):
            return {**state, "opt_state": jax.tree.map(
                jax.device_put, state["opt_state"], opt_dev_sh)}
    else:
        def fetch_opt(state):
            return state

    if cfg.train.grad_accum_steps > 1:
        # batch/pixels carry a leading microbatch axis (stacked by the caller)
        @functools.partial(jax.jit, **jit_kw)
        def step_fn(state, batches, pixels):
            return accum_train_step(fetch_opt(state), batches, pixels, cfg, tx,
                                    attn_impl)
    else:
        @functools.partial(jax.jit, **jit_kw)
        def step_fn(state, batch, pixels):
            return train_step(fetch_opt(state), batch, pixels, cfg, tx, attn_impl)

    return step_fn, tx, state_shardings, batch_shardings
