"""Checkpoint / resume: sharded Orbax state, adapter-only saves, HF export.

Replaces the reference's DeepSpeed/HF Trainer checkpoint path (SURVEY.md §5.4):
  * full sharded train-state save/restore (ZeRO-gather at save is unnecessary —
    Orbax writes each shard from its owning host over ICI-free local IO);
  * stage-1 "adapter-only" checkpoints — projector (+ input embeddings when the
    image tokens were added), mirroring `mm_projector.bin`
    (`metamorph/train/metamorph_trainer.py:273-292`, `train.py:116-208`);
  * HF-format export (safetensors) for interop with the reference's loaders
    (`train.py:210-222` gather-16bit-on-save equivalent);
  * auto-resume: latest `step_*` directory, plus data-iterator state
    (`train.py:1592-1595` resume-if-checkpoint behavior);
  * preemption-aware save hook (SIGTERM -> synchronous save) standing in for
    SLURM's --signal=B:USR1@120 (`scripts/slurm_pretrain.sh:15`).
"""

from __future__ import annotations

import json
import os
import re
import signal
import threading
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


# ---------------------------------------------------------------------------
# full train-state checkpoints
# ---------------------------------------------------------------------------

def save_train_state(ckpt_dir: str, step: int, state: Any,
                     config_json: Optional[str] = None,
                     data_state: Optional[Dict] = None) -> str:
    """Write state (sharded arrays ok) under {ckpt_dir}/step_{step}."""
    ocp = _ocp()
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), state, force=True)
    meta = {"step": step}
    if data_state is not None:
        meta["data_state"] = data_state
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    if config_json is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            f.write(config_json)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        m = re.match(r"step_(\d+)$", name)
        if m and os.path.exists(os.path.join(ckpt_dir, name, "meta.json")):
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{max(steps)}")


def restore_train_state(path: str, template: Any) -> Any:
    """Restore into the template's shapes/shardings (abstract pytree ok)."""
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(path, "state"), template)


def restore_meta(path: str) -> Dict:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


def prune_checkpoints(ckpt_dir: str, keep: int = 1):
    """save_total_limit equivalent (`slurm_finetune.sh:129`)."""
    import shutil

    if not os.path.isdir(ckpt_dir):
        return
    steps = sorted(
        (int(m.group(1)) for name in os.listdir(ckpt_dir)
         for m in [re.match(r"step_(\d+)$", name)] if m), reverse=True)
    for s in steps[keep:]:
        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"), ignore_errors=True)


# ---------------------------------------------------------------------------
# adapter-only (stage-1) saves — mm_projector.bin equivalent
# ---------------------------------------------------------------------------

def save_adapter(path: str, params: Any, include_embeddings: bool = True):
    """Save the projector subtree (+ token embeddings) as a safetensors file in
    the reference's key layout so either framework can consume it."""
    from safetensors.numpy import save_file

    from metamorph_tpu.models.hf_import import mlp_params_to_hf

    tensors = mlp_params_to_hf(
        jax.device_get(params["projector"]), "model.mm_projector", acts=None)
    if include_embeddings and "embed" in params.get("llama", {}):
        tensors["model.embed_tokens.weight"] = np.asarray(
            jax.device_get(params["llama"]["embed"]["embedding"]))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()}, path)


def load_adapter(path: str, params: Any, dtype=None) -> Any:
    """Load a stage-1 adapter into a param tree (pretrain_mm_mlp_adapter path,
    `metamorph_arch.py:91-96` + embed splice `:454-463`)."""
    from safetensors.numpy import load_file

    from metamorph_tpu.models.hf_import import mlp_params_from_hf

    tensors = load_file(path)
    proj = mlp_params_from_hf(tensors, "model.mm_projector",
                              dtype=dtype or params_dtype(params))
    params = dict(params)
    params["projector"] = proj
    if "model.embed_tokens.weight" in tensors:
        import jax.numpy as jnp

        emb = tensors["model.embed_tokens.weight"]
        cur = params["llama"]["embed"]["embedding"]
        if emb.shape == cur.shape:
            params["llama"] = dict(params["llama"])
            params["llama"]["embed"] = {
                "embedding": jnp.asarray(emb).astype(cur.dtype)}
        elif emb.shape[0] == 2:  # only the two new token rows
            params["llama"] = dict(params["llama"])
            params["llama"]["embed"] = {"embedding": jnp.asarray(
                np.concatenate([np.asarray(cur)[:-2], emb], 0)).astype(cur.dtype)}
        else:
            raise ValueError(f"unexpected embed_tokens shape {emb.shape}")
    return params


def params_dtype(params: Any):
    return jax.tree.leaves(params)[0].dtype


# ---------------------------------------------------------------------------
# HF-format full export
# ---------------------------------------------------------------------------

def export_siglip_hf(out_dir: str, siglip_params: Any, siglip_cfg,
                     dtype=np.float32) -> None:
    """Standalone HF `SiglipVisionModel.from_pretrained`-loadable tower dir
    (weights + config.json), the piece the reference's `load_pretrained_model`
    needs when it reconstructs the vision tower at inference
    (`/root/reference/metamorph/model/builder.py:128-136`)."""
    from safetensors.numpy import save_file

    from metamorph_tpu.models.hf_import import siglip_params_to_hf

    os.makedirs(out_dir, exist_ok=True)
    tensors = siglip_params_to_hf(jax.device_get(siglip_params), siglip_cfg)
    save_file({k: np.ascontiguousarray(v, dtype) for k, v in tensors.items()},
              os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({
            "architectures": ["SiglipVisionModel"],
            "model_type": "siglip_vision_model",
            "hidden_size": siglip_cfg.hidden_size,
            "intermediate_size": siglip_cfg.intermediate_size,
            "num_hidden_layers": siglip_cfg.num_layers,
            "num_attention_heads": siglip_cfg.num_heads,
            "image_size": siglip_cfg.image_size,
            "patch_size": siglip_cfg.patch_size,
            "layer_norm_eps": siglip_cfg.layer_norm_eps,
            "hidden_act": "gelu_pytorch_tanh",
            "num_channels": 3,
            "torch_dtype": "float32" if dtype == np.float32 else "bfloat16",
        }, f, indent=1)


def export_hf(out_dir: str, params: Any, cfg,
              tokenizer_dir: Optional[str] = None) -> None:
    """Full-model HF export in the layout the reference's
    `load_pretrained_model` consumes (`/root/reference/metamorph/model/
    builder.py:85-136`, save-side `train.py:210-222`):

      * LLaMA backbone under HF names + an HF-style `config.json`
        (LlamaForCausalLM-loadable; carries the reference's persisted mm
        fields, `train.py:1511-1544`) + `model.safetensors.index.json`;
      * projector (`model.mm_projector.*`) and vision head (`vision_head.*`)
        under the reference key names;
      * the SigLIP tower BOTH in-checkpoint under the reference's module path
        (`model.vision_tower.vision_tower.vision_model.*` — a stage-2 full
        finetune save includes the tower, so `is_loaded` holds after
        `from_pretrained`) and as a standalone HF dir `vision_tower/`;
      * our full typed config as `metamorph_config.json` (the framework
        loader's source of truth);
      * tokenizer files copied in when `tokenizer_dir` is given (the
        reference loads `AutoTokenizer.from_pretrained(model_path)`).
    """
    from safetensors.numpy import save_file

    from metamorph_tpu.models.hf_import import (llama_config_to_hf,
                                                llama_params_to_hf,
                                                mlp_params_to_hf,
                                                siglip_params_to_hf)

    os.makedirs(out_dir, exist_ok=True)
    params = jax.device_get(params)
    tensors = llama_params_to_hf(params["llama"], cfg.llama)
    tensors.update(mlp_params_to_hf(params["projector"], "model.mm_projector", None))
    tensors.update(mlp_params_to_hf(params["vision_head"], "vision_head", None))
    if "siglip" in params:
        tensors.update(siglip_params_to_hf(
            params["siglip"], cfg.siglip,
            prefix="model.vision_tower.vision_tower.vision_model."))
        export_siglip_hf(os.path.join(out_dir, "vision_tower"),
                         params["siglip"], cfg.siglip)
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(out_dir, "model.safetensors.index.json"), "w") as f:
        json.dump({
            "metadata": {"total_size": int(sum(
                v.nbytes for v in tensors.values()))},
            "weight_map": {k: "model.safetensors" for k in tensors},
        }, f)

    hf_cfg = llama_config_to_hf(cfg.llama)
    hf_cfg.update({
        # the reference persists these onto model.config so a checkpoint is
        # self-describing (`train.py:1511-1544`)
        "mm_projector_type": cfg.mm.projector_type,
        "mm_vision_tower": "./vision_tower",
        "mm_use_im_start_end": cfg.mm.mm_use_im_start_end,
        "num_image_tokens": cfg.mm.num_image_tokens,
        "vision_head_type": cfg.mm.vision_head_type,
        "normalize_vision": cfg.mm.normalize_vision,
        "apply_softmax": cfg.mm.apply_softmax,
        "image_aspect_ratio": cfg.mm.image_aspect_ratio,
        "tokenizer_model_max_length": cfg.train.max_seq_len,
    })
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=1)
    with open(os.path.join(out_dir, "metamorph_config.json"), "w") as f:
        f.write(cfg.to_json())
    if tokenizer_dir:
        import shutil

        for name in ("tokenizer.json", "tokenizer_config.json",
                     "special_tokens_map.json", "tokenizer.model",
                     "vocab.json", "merges.txt", "added_tokens.json"):
            src = os.path.join(tokenizer_dir, name)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(out_dir, name))


# ---------------------------------------------------------------------------
# preemption-aware saving
# ---------------------------------------------------------------------------

class PreemptionSaver:
    """Install a SIGTERM/SIGUSR1 handler that requests a synchronous save at
    the next step boundary (the TPU analog of SLURM's pre-termination signal)."""

    def __init__(self):
        self.requested = threading.Event()
        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                signal.signal(sig, self._handler)
            except ValueError:
                pass  # non-main thread (tests)

    def _handler(self, signum, frame):
        self.requested.set()

    def should_save(self) -> bool:
        return self.requested.is_set()


# ---------------------------------------------------------------------------
# LoRA saves — the reference's lora-split final save (train.py:1602-1612)
# ---------------------------------------------------------------------------

def save_lora(path: str, params: Any):
    """Save only LoRA factor leaves as flat safetensors."""
    from safetensors.numpy import save_file

    from metamorph_tpu.inference.loader import flatten_tree
    from metamorph_tpu.models.lora import split_lora_state

    lora = split_lora_state(jax.device_get(params["llama"]))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_file(flatten_tree({"llama": lora}), path)


def load_lora(path: str, params: Any) -> Any:
    """Load LoRA factors into a param tree (adding the leaves)."""
    from safetensors.numpy import load_file

    from metamorph_tpu.inference.loader import unflatten_tree

    import jax.numpy as jnp

    flat = load_file(path)
    lora = unflatten_tree(flat)["llama"]["layers"]
    out = dict(params)
    out["llama"] = dict(params["llama"])
    layers = {k: dict(v) for k, v in params["llama"]["layers"].items()}
    for sub, tree in lora.items():
        layers[sub].update({k: jnp.asarray(v) for k, v in tree.items()})
    out["llama"]["layers"] = layers
    return out
