"""diffusers-format (SD-1.5) weight interop for the visualizer UNet + VAE.

Maps the diffusers `UNet2DConditionModel` / `AutoencoderKL` state-dict naming
to our pytrees (and back), so the reference's pretrained SD-1.5 weights
(`visualization/train.py:313-353` loads them via `from_pretrained`) drop in.

Conventions: torch conv [out,in,kh,kw] <-> HWIO; torch linear [out,in] <->
[in,out]; VAE mid-attention to_q/k/v/to_out linears <-> our 1x1 convs.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

Params = Dict[str, Any]


def _conv_in(w, b, dtype=None):
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": np.ascontiguousarray(b)}


def _conv_out(p):
    return np.asarray(p["kernel"]).transpose(3, 2, 0, 1), np.asarray(p["bias"])


def _lin_in(w, b):
    return {"kernel": np.ascontiguousarray(w.T), "bias": np.ascontiguousarray(b)}


def _lin_out(p):
    return np.asarray(p["kernel"]).T, np.asarray(p["bias"])


def _norm_in(w, b):
    return {"scale": np.ascontiguousarray(w), "bias": np.ascontiguousarray(b)}


def _norm_out(p):
    return np.asarray(p["scale"]), np.asarray(p["bias"])


def _lin_as_conv1x1_in(w, b):
    """torch Linear [out,in] -> our [1,1,in,out] conv kernel."""
    return {"kernel": np.ascontiguousarray(w.T[None, None]),
            "bias": np.ascontiguousarray(b)}


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------

def _resnet_from(sd, p):
    out = {
        "norm1": _norm_in(sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"]),
        "conv1": _conv_in(sd[f"{p}.conv1.weight"], sd[f"{p}.conv1.bias"]),
        "norm2": _norm_in(sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"]),
        "conv2": _conv_in(sd[f"{p}.conv2.weight"], sd[f"{p}.conv2.bias"]),
    }
    if f"{p}.time_emb_proj.weight" in sd:
        out["time_emb"] = _lin_in(sd[f"{p}.time_emb_proj.weight"],
                                  sd[f"{p}.time_emb_proj.bias"])
    if f"{p}.conv_shortcut.weight" in sd:
        out["shortcut"] = _conv_in(sd[f"{p}.conv_shortcut.weight"],
                                   sd[f"{p}.conv_shortcut.bias"])
    return out


def _resnet_to(params, p, out):
    out[f"{p}.norm1.weight"], out[f"{p}.norm1.bias"] = _norm_out(params["norm1"])
    out[f"{p}.conv1.weight"], out[f"{p}.conv1.bias"] = _conv_out(params["conv1"])
    out[f"{p}.norm2.weight"], out[f"{p}.norm2.bias"] = _norm_out(params["norm2"])
    out[f"{p}.conv2.weight"], out[f"{p}.conv2.bias"] = _conv_out(params["conv2"])
    if "time_emb" in params:
        out[f"{p}.time_emb_proj.weight"], out[f"{p}.time_emb_proj.bias"] = _lin_out(
            params["time_emb"])
    if "shortcut" in params:
        out[f"{p}.conv_shortcut.weight"], out[f"{p}.conv_shortcut.bias"] = _conv_out(
            params["shortcut"])


def _xattn_from(sd, p):
    return {"q": {"kernel": np.ascontiguousarray(sd[f"{p}.to_q.weight"].T)},
            "k": {"kernel": np.ascontiguousarray(sd[f"{p}.to_k.weight"].T)},
            "v": {"kernel": np.ascontiguousarray(sd[f"{p}.to_v.weight"].T)},
            "out": _lin_in(sd[f"{p}.to_out.0.weight"], sd[f"{p}.to_out.0.bias"])}


def _xattn_to(params, p, out):
    out[f"{p}.to_q.weight"] = np.asarray(params["q"]["kernel"]).T
    out[f"{p}.to_k.weight"] = np.asarray(params["k"]["kernel"]).T
    out[f"{p}.to_v.weight"] = np.asarray(params["v"]["kernel"]).T
    out[f"{p}.to_out.0.weight"], out[f"{p}.to_out.0.bias"] = _lin_out(params["out"])


def _t2d_from(sd, p):
    tb = f"{p}.transformer_blocks.0"
    return {
        "norm": _norm_in(sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"]),
        "proj_in": _conv_in(sd[f"{p}.proj_in.weight"], sd[f"{p}.proj_in.bias"]),
        "block": {
            "norm1": _norm_in(sd[f"{tb}.norm1.weight"], sd[f"{tb}.norm1.bias"]),
            "attn1": _xattn_from(sd, f"{tb}.attn1"),
            "norm2": _norm_in(sd[f"{tb}.norm2.weight"], sd[f"{tb}.norm2.bias"]),
            "attn2": _xattn_from(sd, f"{tb}.attn2"),
            "norm3": _norm_in(sd[f"{tb}.norm3.weight"], sd[f"{tb}.norm3.bias"]),
            "geglu": _lin_in(sd[f"{tb}.ff.net.0.proj.weight"],
                             sd[f"{tb}.ff.net.0.proj.bias"]),
            "ff_out": _lin_in(sd[f"{tb}.ff.net.2.weight"],
                              sd[f"{tb}.ff.net.2.bias"]),
        },
        "proj_out": _conv_in(sd[f"{p}.proj_out.weight"], sd[f"{p}.proj_out.bias"]),
    }


def _t2d_to(params, p, out):
    tb = f"{p}.transformer_blocks.0"
    out[f"{p}.norm.weight"], out[f"{p}.norm.bias"] = _norm_out(params["norm"])
    out[f"{p}.proj_in.weight"], out[f"{p}.proj_in.bias"] = _conv_out(params["proj_in"])
    b = params["block"]
    for n in ("norm1", "norm2", "norm3"):
        out[f"{tb}.{n}.weight"], out[f"{tb}.{n}.bias"] = _norm_out(b[n])
    _xattn_to(b["attn1"], f"{tb}.attn1", out)
    _xattn_to(b["attn2"], f"{tb}.attn2", out)
    out[f"{tb}.ff.net.0.proj.weight"], out[f"{tb}.ff.net.0.proj.bias"] = _lin_out(b["geglu"])
    out[f"{tb}.ff.net.2.weight"], out[f"{tb}.ff.net.2.bias"] = _lin_out(b["ff_out"])
    out[f"{p}.proj_out.weight"], out[f"{p}.proj_out.bias"] = _conv_out(params["proj_out"])


def unet_params_from_hf(sd: Dict[str, np.ndarray], cfg) -> Params:
    params: Params = {
        "time_mlp": {
            "fc1": _lin_in(sd["time_embedding.linear_1.weight"],
                           sd["time_embedding.linear_1.bias"]),
            "fc2": _lin_in(sd["time_embedding.linear_2.weight"],
                           sd["time_embedding.linear_2.bias"]),
        },
        "conv_in": _conv_in(sd["conv_in.weight"], sd["conv_in.bias"]),
        "down": [], "up": [],
        "mid": {
            "res1": _resnet_from(sd, "mid_block.resnets.0"),
            "attn": _t2d_from(sd, "mid_block.attentions.0"),
            "res2": _resnet_from(sd, "mid_block.resnets.1"),
        },
        "norm_out": _norm_in(sd["conv_norm_out.weight"], sd["conv_norm_out.bias"]),
        "conv_out": _conv_in(sd["conv_out.weight"], sd["conv_out.bias"]),
    }
    L = len(cfg.block_out_channels)
    for i in range(L):
        blk = {"resnets": [], "attns": [] if cfg.attn_levels[i] else None}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(_resnet_from(sd, f"down_blocks.{i}.resnets.{j}"))
            if cfg.attn_levels[i]:
                blk["attns"].append(_t2d_from(sd, f"down_blocks.{i}.attentions.{j}"))
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = _conv_in(
                sd[f"down_blocks.{i}.downsamplers.0.conv.weight"],
                sd[f"down_blocks.{i}.downsamplers.0.conv.bias"])
        params["down"].append(blk)
    rev_attn = list(reversed(cfg.attn_levels))
    for i in range(L):
        blk = {"resnets": [], "attns": [] if rev_attn[i] else None}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"].append(_resnet_from(sd, f"up_blocks.{i}.resnets.{j}"))
            if rev_attn[i]:
                blk["attns"].append(_t2d_from(sd, f"up_blocks.{i}.attentions.{j}"))
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = _conv_in(
                sd[f"up_blocks.{i}.upsamplers.0.conv.weight"],
                sd[f"up_blocks.{i}.upsamplers.0.conv.bias"])
        params["up"].append(blk)
    return params


def unet_params_to_hf(params: Params, cfg) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    out["time_embedding.linear_1.weight"], out["time_embedding.linear_1.bias"] = _lin_out(
        params["time_mlp"]["fc1"])
    out["time_embedding.linear_2.weight"], out["time_embedding.linear_2.bias"] = _lin_out(
        params["time_mlp"]["fc2"])
    out["conv_in.weight"], out["conv_in.bias"] = _conv_out(params["conv_in"])
    _resnet_to(params["mid"]["res1"], "mid_block.resnets.0", out)
    _t2d_to(params["mid"]["attn"], "mid_block.attentions.0", out)
    _resnet_to(params["mid"]["res2"], "mid_block.resnets.1", out)
    out["conv_norm_out.weight"], out["conv_norm_out.bias"] = _norm_out(params["norm_out"])
    out["conv_out.weight"], out["conv_out.bias"] = _conv_out(params["conv_out"])
    for i, blk in enumerate(params["down"]):
        for j, res in enumerate(blk["resnets"]):
            _resnet_to(res, f"down_blocks.{i}.resnets.{j}", out)
            if blk.get("attns") is not None:
                _t2d_to(blk["attns"][j], f"down_blocks.{i}.attentions.{j}", out)
        if "downsample" in blk:
            (out[f"down_blocks.{i}.downsamplers.0.conv.weight"],
             out[f"down_blocks.{i}.downsamplers.0.conv.bias"]) = _conv_out(blk["downsample"])
    for i, blk in enumerate(params["up"]):
        for j, res in enumerate(blk["resnets"]):
            _resnet_to(res, f"up_blocks.{i}.resnets.{j}", out)
            if blk.get("attns") is not None:
                _t2d_to(blk["attns"][j], f"up_blocks.{i}.attentions.{j}", out)
        if "upsample" in blk:
            (out[f"up_blocks.{i}.upsamplers.0.conv.weight"],
             out[f"up_blocks.{i}.upsamplers.0.conv.bias"]) = _conv_out(blk["upsample"])
    return out


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _vae_attn_from(sd, p):
    return {"norm": _norm_in(sd[f"{p}.group_norm.weight"], sd[f"{p}.group_norm.bias"]),
            "q": _lin_as_conv1x1_in(sd[f"{p}.to_q.weight"], sd[f"{p}.to_q.bias"]),
            "k": _lin_as_conv1x1_in(sd[f"{p}.to_k.weight"], sd[f"{p}.to_k.bias"]),
            "v": _lin_as_conv1x1_in(sd[f"{p}.to_v.weight"], sd[f"{p}.to_v.bias"]),
            "out": _lin_as_conv1x1_in(sd[f"{p}.to_out.0.weight"],
                                      sd[f"{p}.to_out.0.bias"])}


def _vae_attn_to(params, p, out):
    out[f"{p}.group_norm.weight"], out[f"{p}.group_norm.bias"] = _norm_out(params["norm"])
    for ours, theirs in (("q", "to_q"), ("k", "to_k"), ("v", "to_v"),
                         ("out", "to_out.0")):
        out[f"{p}.{theirs}.weight"] = np.asarray(params[ours]["kernel"])[0, 0].T
        out[f"{p}.{theirs}.bias"] = np.asarray(params[ours]["bias"])


def vae_params_from_hf(sd: Dict[str, np.ndarray], cfg) -> Params:
    L = len(cfg.block_out_channels)
    enc = {
        "conv_in": _conv_in(sd["encoder.conv_in.weight"], sd["encoder.conv_in.bias"]),
        "down": [],
        "mid": {"res1": _resnet_from(sd, "encoder.mid_block.resnets.0"),
                "attn": _vae_attn_from(sd, "encoder.mid_block.attentions.0"),
                "res2": _resnet_from(sd, "encoder.mid_block.resnets.1")},
        "norm_out": _norm_in(sd["encoder.conv_norm_out.weight"],
                             sd["encoder.conv_norm_out.bias"]),
        "conv_out": _conv_in(sd["encoder.conv_out.weight"], sd["encoder.conv_out.bias"]),
        "quant_conv": _conv_in(sd["quant_conv.weight"], sd["quant_conv.bias"]),
    }
    for i in range(L):
        blk = {"resnets": [_resnet_from(sd, f"encoder.down_blocks.{i}.resnets.{j}")
                           for j in range(cfg.layers_per_block)]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = _conv_in(
                sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"],
                sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"])
        enc["down"].append(blk)
    dec = {
        "post_quant_conv": _conv_in(sd["post_quant_conv.weight"],
                                    sd["post_quant_conv.bias"]),
        "conv_in": _conv_in(sd["decoder.conv_in.weight"], sd["decoder.conv_in.bias"]),
        "mid": {"res1": _resnet_from(sd, "decoder.mid_block.resnets.0"),
                "attn": _vae_attn_from(sd, "decoder.mid_block.attentions.0"),
                "res2": _resnet_from(sd, "decoder.mid_block.resnets.1")},
        "up": [],
        "norm_out": _norm_in(sd["decoder.conv_norm_out.weight"],
                             sd["decoder.conv_norm_out.bias"]),
        "conv_out": _conv_in(sd["decoder.conv_out.weight"], sd["decoder.conv_out.bias"]),
    }
    for i in range(L):
        blk = {"resnets": [_resnet_from(sd, f"decoder.up_blocks.{i}.resnets.{j}")
                           for j in range(cfg.layers_per_block + 1)]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = _conv_in(
                sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"],
                sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"])
        dec["up"].append(blk)
    return {"encoder": enc, "decoder": dec}


def vae_params_to_hf(params: Params, cfg) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    enc, dec = params["encoder"], params["decoder"]
    out["encoder.conv_in.weight"], out["encoder.conv_in.bias"] = _conv_out(enc["conv_in"])
    _resnet_to(enc["mid"]["res1"], "encoder.mid_block.resnets.0", out)
    _vae_attn_to(enc["mid"]["attn"], "encoder.mid_block.attentions.0", out)
    _resnet_to(enc["mid"]["res2"], "encoder.mid_block.resnets.1", out)
    out["encoder.conv_norm_out.weight"], out["encoder.conv_norm_out.bias"] = _norm_out(enc["norm_out"])
    out["encoder.conv_out.weight"], out["encoder.conv_out.bias"] = _conv_out(enc["conv_out"])
    out["quant_conv.weight"], out["quant_conv.bias"] = _conv_out(enc["quant_conv"])
    for i, blk in enumerate(enc["down"]):
        for j, res in enumerate(blk["resnets"]):
            _resnet_to(res, f"encoder.down_blocks.{i}.resnets.{j}", out)
        if "downsample" in blk:
            (out[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"],
             out[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"]) = _conv_out(blk["downsample"])
    out["post_quant_conv.weight"], out["post_quant_conv.bias"] = _conv_out(dec["post_quant_conv"])
    out["decoder.conv_in.weight"], out["decoder.conv_in.bias"] = _conv_out(dec["conv_in"])
    _resnet_to(dec["mid"]["res1"], "decoder.mid_block.resnets.0", out)
    _vae_attn_to(dec["mid"]["attn"], "decoder.mid_block.attentions.0", out)
    _resnet_to(dec["mid"]["res2"], "decoder.mid_block.resnets.1", out)
    out["decoder.conv_norm_out.weight"], out["decoder.conv_norm_out.bias"] = _norm_out(dec["norm_out"])
    out["decoder.conv_out.weight"], out["decoder.conv_out.bias"] = _conv_out(dec["conv_out"])
    for i, blk in enumerate(dec["up"]):
        for j, res in enumerate(blk["resnets"]):
            _resnet_to(res, f"decoder.up_blocks.{i}.resnets.{j}", out)
        if "upsample" in blk:
            (out[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"],
             out[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"]) = _conv_out(blk["upsample"])
    return out
