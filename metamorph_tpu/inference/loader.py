"""Model loading for inference.

Equivalent of `metamorph/model/builder.py:13-144` (`load_pretrained_model`) and
`inference/load_metamorph.py` / `inference/load_visualization.py`: build the
unified model from a framework checkpoint directory (config.json +
model.safetensors, as written by `train/checkpoint.py:export_hf`), or from raw
HF LLaMA/SigLIP repos + a stage-1 adapter.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from metamorph_tpu.config import MetaMorphConfig
from metamorph_tpu.models.metamorph import init_metamorph_params


def resolve_model_dir(path_or_repo: str) -> str:
    """Local directory passthrough; otherwise treat the string as an HF hub
    repo id and snapshot-download it (the reference's loaders pull published
    checkpoints from the hub, `inference/load_visualization.py:15-109`
    hf_hub_download). Raises a clear error when the hub is unreachable."""
    if os.path.isdir(path_or_repo):
        return path_or_repo
    try:
        from huggingface_hub import snapshot_download

        return snapshot_download(path_or_repo)
    except Exception as e:
        raise FileNotFoundError(
            f"'{path_or_repo}' is not a local directory and could not be "
            f"fetched from the HF hub ({type(e).__name__}: {e})") from e


def load_pretrained_model(
    model_path: str,
    dtype=jnp.bfloat16,
    hf_siglip_path: Optional[str] = None,
) -> Tuple[Any, MetaMorphConfig]:
    """Load (params, cfg) from an exported checkpoint dir (or hub repo id).
    The vision tower is loaded from `hf_siglip_path` when given (the export
    stores LLM + projector + vision_head; SigLIP is frozen upstream weights,
    `builder.py:128-136`)."""
    from metamorph_tpu.models.hf_import import (llama_params_from_hf,
                                                load_safetensors_dir,
                                                mlp_params_from_hf,
                                                siglip_params_from_hf)

    model_path = resolve_model_dir(model_path)
    if hf_siglip_path:
        hf_siglip_path = resolve_model_dir(hf_siglip_path)
    # full exports carry our typed config as metamorph_config.json (their
    # config.json is HF-style for LlamaForCausalLM interop); older exports
    # wrote our config as config.json directly
    meta_cfg = os.path.join(model_path, "metamorph_config.json")
    if not os.path.exists(meta_cfg):
        meta_cfg = os.path.join(model_path, "config.json")
    with open(meta_cfg) as f:
        cfg = MetaMorphConfig.from_json(f.read())

    tensors = load_safetensors_dir(model_path)
    params = init_metamorph_params(jax.random.PRNGKey(0), cfg, dtype)
    params["llama"] = llama_params_from_hf(tensors, cfg.llama, dtype)
    if any(k.startswith("model.mm_projector") for k in tensors):
        params["projector"] = mlp_params_from_hf(tensors, "model.mm_projector", dtype)
    if any(k.startswith("vision_head") for k in tensors):
        params["vision_head"] = mlp_params_from_hf(tensors, "vision_head", dtype)
    tower_prefix = "model.vision_tower.vision_tower.vision_model."
    if hf_siglip_path:
        sig = load_safetensors_dir(hf_siglip_path)
        params["siglip"] = siglip_params_from_hf(sig, cfg.siglip, dtype)
    elif any(k.startswith(tower_prefix) for k in tensors):
        # stage-2 full saves embed the tower (`builder.py:85-136` loads it
        # from the checkpoint dir at inference)
        params["siglip"] = siglip_params_from_hf(tensors, cfg.siglip, dtype,
                                                 prefix=tower_prefix)
    return params, cfg


def load_visualization(
    ckpt_dir: str,
    dtype=jnp.float32,
):
    """Load the visualizer triple (adapter, unet, vae) + configs from a
    directory of safetensors written by the visualizer trainer — equivalent of
    `inference/load_visualization.py:15-109` (safety checker: none here; the
    reference explicitly disables it)."""
    import numpy as np
    from safetensors.numpy import load_file

    from metamorph_tpu.visualizer.unet import UNetConfig
    from metamorph_tpu.visualizer.vae import VAEConfig

    ckpt_dir = resolve_model_dir(ckpt_dir)
    with open(os.path.join(ckpt_dir, "visualizer_config.json")) as f:
        meta = json.load(f)
    unet_cfg = UNetConfig(**{k: (tuple(v) if isinstance(v, list) else v)
                             for k, v in meta["unet"].items()})
    vae_cfg = VAEConfig(**{k: (tuple(v) if isinstance(v, list) else v)
                           for k, v in meta["vae"].items()})

    def load_tree(name):
        flat = load_file(os.path.join(ckpt_dir, f"{name}.safetensors"))
        return unflatten_tree(flat, dtype)

    return (load_tree("adapter"), load_tree("unet"), load_tree("vae"),
            unet_cfg, vae_cfg, meta.get("adapter_mode", "mlp"))


# ---------------------------------------------------------------------------
# flat <-> nested helpers (lists encoded as numeric keys)
# ---------------------------------------------------------------------------

def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, Any]:
    import numpy as np

    out = {}
    if tree is None:
        return out  # e.g. UNet down blocks without attention carry attns=None
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.ascontiguousarray(jax.device_get(tree))
    return out


def unflatten_tree(flat: Dict[str, Any], dtype=None) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val) if dtype is None else jnp.asarray(val).astype(
            dtype if val.dtype.kind == "f" else val.dtype)
    return _listify(root)


def _listify(node):
    if not isinstance(node, dict):
        return node
    keys = list(node.keys())
    if keys and all(k.isdigit() for k in keys):
        return [_listify(node[str(i)]) for i in range(len(keys))]
    return {k: _listify(v) for k, v in node.items()}


def save_visualizer(ckpt_dir: str, adapter, unet, vae, unet_cfg, vae_cfg,
                    adapter_mode: str = "mlp"):
    import dataclasses

    from safetensors.numpy import save_file

    os.makedirs(ckpt_dir, exist_ok=True)
    for name, tree in (("adapter", adapter), ("unet", unet), ("vae", vae)):
        save_file(flatten_tree(tree), os.path.join(ckpt_dir, f"{name}.safetensors"))
    with open(os.path.join(ckpt_dir, "visualizer_config.json"), "w") as f:
        json.dump({"unet": dataclasses.asdict(unet_cfg),
                   "vae": dataclasses.asdict(vae_cfg),
                   "adapter_mode": adapter_mode}, f, indent=2)


def load_lora_model(model_path: str, lora_path: str, r: int, alpha: float,
                    dtype=None, hf_siglip_path=None):
    """Load a base export + LoRA factors and merge-and-unload — the reference
    loader's 'lora' branch (`model/builder.py:39-73`)."""
    from metamorph_tpu.models.lora import merge_lora
    from metamorph_tpu.train.checkpoint import load_lora

    import jax.numpy as jnp

    params, cfg = load_pretrained_model(model_path, dtype=dtype or jnp.bfloat16,
                                        hf_siglip_path=hf_siglip_path)
    params = load_lora(lora_path, params)
    params["llama"] = merge_lora(params["llama"], r=r, alpha=alpha)
    return params, cfg
