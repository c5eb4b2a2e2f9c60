"""Training orchestration: the `train()` entry point.

Replaces the reference's HF-Trainer + DeepSpeed stack (`metamorph/train/train.py:1375-1619`
and `metamorph_trainer.py`): config -> mesh -> params (fresh or HF import,
optionally stage-1 adapter merge) -> sharded jitted step -> loop with metrics,
checkpoint/auto-resume, adapter-only saves, preemption handling.

Two-stage recipe parity:
  * stage 1 (connector pretrain): `tune_mm_mlp_adapter=True` -> only projector
    (+ embeddings) train; saves `mm_projector.safetensors` adapter;
  * stage 2 (instruction tune): full finetune consuming the stage-1 adapter
    (`pretrain_mm_mlp_adapter`), dual loss with `use_vision_ar`.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from metamorph_tpu.config import MetaMorphConfig
from metamorph_tpu.models.metamorph import init_metamorph_params
from metamorph_tpu.multimodal.packing import PackedBatch, batch_to_arrays
from metamorph_tpu.parallel.mesh import build_mesh
from metamorph_tpu.parallel.sharding import shard_params
from metamorph_tpu.train import checkpoint as ckpt_lib
from metamorph_tpu.train.train_step import (make_sharded_train_step,
                                            pixels_sharding)
from metamorph_tpu.utils.logging import MetricsLogger, rank0_print


@dataclass
class TrainerArgs:
    output_dir: str = "./out"
    save_steps: int = 500
    save_total_limit: int = 1
    logging_steps: int = 1
    resume: bool = True                       # resume-if-checkpoint (train.py:1592-1595)
    pretrain_mm_mlp_adapter: Optional[str] = None
    hf_llama_path: Optional[str] = None       # import LLaMA weights
    hf_siglip_path: Optional[str] = None      # import SigLIP weights
    use_wandb: bool = False
    attn_impl: str = "xla"                    # xla | flash | ring (sequence parallel)


def build_params(cfg: MetaMorphConfig, args: TrainerArgs, seed: int = 0):
    dtype = jnp.bfloat16 if cfg.train.param_dtype == "bfloat16" else jnp.float32
    params = init_metamorph_params(jax.random.PRNGKey(seed), cfg, dtype)
    if args.hf_llama_path:
        from metamorph_tpu.models.hf_import import (llama_params_from_hf,
                                                    load_safetensors_dir)

        tensors = load_safetensors_dir(args.hf_llama_path)
        params["llama"] = llama_params_from_hf(tensors, cfg.llama, dtype)
    if args.hf_siglip_path:
        from metamorph_tpu.models.hf_import import (load_safetensors_dir,
                                                    siglip_params_from_hf)

        tensors = load_safetensors_dir(args.hf_siglip_path)
        params["siglip"] = siglip_params_from_hf(tensors, cfg.siglip, dtype)
    if args.pretrain_mm_mlp_adapter:
        params = ckpt_lib.load_adapter(args.pretrain_mm_mlp_adapter, params)
    return params


def train(cfg: MetaMorphConfig, args: TrainerArgs,
          data_iter: Iterable, multihost: bool = False) -> Dict[str, Any]:
    """data_iter yields (PackedBatch | dict-of-arrays, pixels [N,S,S,3])."""
    if multihost and jax.process_count() == 1:
        # torchrun/c10d rendezvous equivalent (no-op when the caller — e.g.
        # train/main.py, which needs process info for per-host data loading —
        # already initialized the distributed runtime)
        jax.distributed.initialize()

    mesh = build_mesh(cfg.mesh)
    rank0_print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    params = build_params(cfg, args)
    step_fn, tx, state_shardings, batch_sh_fn = make_sharded_train_step(
        cfg, mesh, params, attn_impl=args.attn_impl)
    # multi-res buckets: lazily-compiled step variants keyed by K (the packed
    # batch's per-image token count); params/opt-state are K-independent
    step_fns = {cfg.mm.num_image_tokens: step_fn}
    params_template = params

    def step_fn_for(K: int):
        if K not in step_fns:
            rank0_print(f"compiling step for num_image_tokens={K}")
            fn, _, _, _ = make_sharded_train_step(
                cfg.with_num_image_tokens(K), mesh, params_template,
                attn_impl=args.attn_impl)
            step_fns[K] = fn
        return step_fns[K]

    sh_params = shard_params(params, mesh)
    state = {"params": sh_params, "opt_state": tx.init(sh_params),
             "step": jnp.zeros((), jnp.int32)}
    # pin every leaf (incl. optimizer scalars) to its mesh sharding so restore
    # and step_fn see one consistent device set
    state = jax.device_put(state, state_shardings)
    del params

    # ---- auto-resume ----
    start_step = 0
    data_state = None
    latest = ckpt_lib.latest_checkpoint(args.output_dir) if args.resume else None
    if latest:
        rank0_print(f"resuming from {latest}")
        state = jax.device_put(
            ckpt_lib.restore_train_state(latest, state), state_shardings)
        meta = ckpt_lib.restore_meta(latest)
        start_step = meta["step"]
        data_state = meta.get("data_state")
    if data_state and hasattr(data_iter, "load_state_dict"):
        data_iter.load_state_dict(data_state)

    preempt = ckpt_lib.PreemptionSaver()
    os.makedirs(args.output_dir, exist_ok=True)
    metrics_log = MetricsLogger(
        log_path=os.path.join(args.output_dir, "metrics.jsonl"),
        use_wandb=args.use_wandb)

    tokens_per_step = cfg.train.batch_size * cfg.train.max_seq_len
    n_chips = len(jax.devices())

    # prefetch on a background thread; each item carries the iterator state
    # *at production time* so resume replays from the right position even with
    # batches in flight
    from metamorph_tpu.train.prefetch import Prefetcher

    def _with_state(item):
        ds = data_iter.state_dict() if hasattr(data_iter, "state_dict") else None
        return item, ds

    prefetch = Prefetcher(iter(data_iter), depth=2, transform=_with_state)
    consumed_data_state = [None]

    def save(step):
        ds = consumed_data_state[0]
        ckpt_lib.save_train_state(args.output_dir, step, state, cfg.to_json(), ds)
        ckpt_lib.prune_checkpoints(args.output_dir, args.save_total_limit)
        if cfg.train.tune_mm_mlp_adapter:
            ckpt_lib.save_adapter(
                os.path.join(args.output_dir, "mm_projector.safetensors"),
                jax.device_get(state["params"]))
        if cfg.train.lora_enable:
            ckpt_lib.save_lora(
                os.path.join(args.output_dir, "lora.safetensors"),
                state["params"])

    step = start_step
    it = prefetch
    last_metrics = {}
    try:
        accum = cfg.train.grad_accum_steps
        while step < cfg.train.total_steps:
            micro = []
            micro_K = []
            for _ in range(accum):
                (packed, pixels), ds = next(it)
                consumed_data_state[0] = ds
                b = (batch_to_arrays(packed) if isinstance(packed, PackedBatch)
                     else dict(packed))
                if isinstance(packed, PackedBatch):
                    micro_K.append(packed.ar_valid.shape[0]
                                   // packed.image_slot_used.shape[0])
                else:
                    micro_K.append(cfg.mm.num_image_tokens)
                micro.append((b, np.asarray(pixels)))
            K = micro_K[0]
            if any(k != K for k in micro_K):
                # multi-res buckets must be constant within one optimizer step
                # (DataIterator keys its bucket on step//accum_steps); mixed K
                # would stack incompatible packed shapes
                raise ValueError(
                    f"grad-accum group has mixed num_image_tokens {micro_K}; "
                    f"construct DataIterator with accum_steps={accum}")
            from jax.sharding import NamedSharding, PartitionSpec as P

            if accum > 1:
                batch = {k: np.stack([np.asarray(m[0][k]) for m in micro])
                         for k in micro[0][0]}
                pixels = np.stack([m[1] for m in micro])
                # microbatch axis leads; batch dim sharding moves to axis 1
                bs = {k: (NamedSharding(mesh, P(None, ("data", "fsdp")))
                          if v.ndim == 3 else NamedSharding(mesh, P()))
                      for k, v in batch.items()}
                px_sh = pixels_sharding(mesh, pixels.shape[1],
                                        leading_microbatch=True)
            else:
                batch, pixels = micro[0]
                bs = batch_sh_fn(batch)
                px_sh = pixels_sharding(mesh, pixels.shape[0])
            if (getattr(data_iter, "process_sharded", False)
                    and jax.process_count() > 1):
                # per-host loading: each process contributes its local slice
                # of the globally-sharded batch/pixel arrays
                def put(v, sh):
                    return jax.make_array_from_process_local_data(
                        sh, np.asarray(v))
            else:
                def put(v, sh):
                    return jax.device_put(np.asarray(v), sh)
            batch = {k: put(v, bs[k]) for k, v in batch.items()}
            pixels = put(pixels, px_sh)

            state, m = step_fn_for(K)(state, batch, pixels)
            step += 1
            if step % args.logging_steps == 0:
                m = {k: float(v) for k, v in jax.device_get(m).items()}
                last_metrics = metrics_log.log(step, m, tokens_per_step, n_chips)
                rank0_print(f"step {step}: loss={m['loss']:.4f} "
                            f"(lang={m['loss_language']:.4f} "
                            f"img_ar={m['loss_image_ar']:.4f})")
            if step % args.save_steps == 0 or preempt.should_save():
                save(step)
                if preempt.should_save():
                    rank0_print("preemption save complete; exiting")
                    break
    finally:
        metrics_log.close()

    save(step)
    return {"state": state, "step": step, "metrics": last_metrics}
