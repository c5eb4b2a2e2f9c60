"""The unified understand-and-generate model (MetaMorph) — TPU-native.

Pure-functional equivalent of `MetaMorphLlamaForCausalLM`
(`metamorph/model/language_model/metamorph_llama.py:223-660`) +
`MetaMorphMetaForCausalLM.prepare_inputs_labels_for_multimodal`
(`metamorph/model/metamorph_arch.py:131-425`), with the dynamic splice replaced
by the static gather plan from `multimodal/packing.py`.

Loss semantics (parity with `llm_forward`, `metamorph_llama.py:285-498`):
  * text CE on shifted labels, mean over non-IGNORE positions;
  * image-AR loss on answer-image positions only, teacher-forced (hidden at t-1
    predicts image token t), pred = vision_head(hidden) [+ L2-normalize or
    softmax/0.07], target = detached vision-tower features;
  * total = CE + vision_coef * AR  (AR term contributes 0 when the batch has no
    answer-image tokens — the reference would NaN there, we use a guarded mean).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from metamorph_tpu.config import MetaMorphConfig
from metamorph_tpu.constants import IGNORE_INDEX, SIGLIP_HIDDEN
from metamorph_tpu.models import llama as llama_lib
from metamorph_tpu.models import siglip as siglip_lib
from metamorph_tpu.models import projector as proj_lib

Params = Dict[str, Any]


def init_metamorph_params(rng: jax.Array, cfg: MetaMorphConfig,
                          dtype=jnp.bfloat16) -> Params:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    d_vis = cfg.siglip.hidden_size
    if cfg.mm.image_token_reduction == "concat_interpolation":
        d_vis *= 4
    params = {
        "llama": llama_lib.init_llama_params(k1, cfg.llama, dtype),
        "siglip": siglip_lib.init_siglip_params(k2, cfg.siglip, dtype),
        "projector": proj_lib.init_projector(
            k3, cfg.mm.projector_type, d_vis, cfg.llama.hidden_size, dtype),
        "vision_head": proj_lib.init_vision_head(
            k4, cfg.mm.vision_head_type, cfg.llama.hidden_size,
            cfg.siglip.hidden_size, dtype),
    }
    if cfg.mm.image_token_reduction == "mlpmixer":
        # token/channel mixer reduction (`siglip_encoder.py:100-105,164-168`)
        km1, km2 = jax.random.split(jax.random.fold_in(rng, 7))
        T, D = cfg.siglip.num_patches, cfg.siglip.hidden_size
        params["siglip_mixer"] = {
            "token_mixer": proj_lib._dense_init(km1, T, cfg.mm.num_image_tokens,
                                                dtype),
            "channel_mixer": proj_lib._dense_init(km2, D, D, dtype),
        }
    if "unpad" in cfg.mm.mm_patch_merge_type:
        # learned newline column for anyres spatial_unpad merge
        # (`metamorph_arch.py:78-82`: randn(D)/sqrt(D))
        D = cfg.llama.hidden_size
        params["image_newline"] = (
            jax.random.normal(jax.random.fold_in(rng, 11), (D,), jnp.float32)
            * (D ** -0.5)).astype(dtype)
    return params


def _proj_acts(cfg: MetaMorphConfig):
    d_vis = cfg.siglip.hidden_size
    if cfg.mm.image_token_reduction == "concat_interpolation":
        d_vis *= 4
    _, acts = proj_lib.projector_spec(
        cfg.mm.projector_type, d_vis, cfg.llama.hidden_size, cfg.llama.hidden_size)
    return acts


def _head_acts(cfg: MetaMorphConfig):
    _, acts = proj_lib.head_spec(
        cfg.mm.vision_head_type, cfg.llama.hidden_size, cfg.siglip.hidden_size)
    return acts


def encode_images(params: Params, cfg: MetaMorphConfig, pixels: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pixels [N,H,W,3] -> (projected [N,K,D_llm] w/ grad to projector,
    targets [N,K,D_vis] detached) — parity with `encode_images`
    (`metamorph_arch.py:140-164`).

    The image-slot axis N is sharded over (data, fsdp) so the SigLIP tower's
    FLOPs divide across the mesh instead of replicating per device (the
    reference never replicates the vision forward under ZeRO-3 either,
    `scripts/zero3.json:16-26`)."""
    from jax.sharding import PartitionSpec as P

    from metamorph_tpu.parallel.context import constrain

    pixels = constrain(pixels, P(("data", "fsdp"), None, None, None))
    feats = siglip_lib.vision_tower_forward(
        params["siglip"], cfg.siglip, cfg.mm, pixels,
        mixer_params=params.get("siglip_mixer"))
    feats = constrain(feats, P(("data", "fsdp"), None, None))
    projected = proj_lib.apply_stack(params["projector"], _proj_acts(cfg), feats)
    projected = constrain(projected, P(("data", "fsdp"), None, None))
    targets = jax.lax.stop_gradient(feats)
    return projected, targets


def apply_vision_head(params: Params, cfg: MetaMorphConfig, h: jnp.ndarray
                      ) -> jnp.ndarray:
    """hidden -> predicted visual embedding (1152-d), with the configured
    normalization (`metamorph_llama.py:425-438`)."""
    pred = proj_lib.apply_stack(params["vision_head"], _head_acts(cfg), h)
    if cfg.mm.normalize_vision:
        f32 = pred.astype(jnp.float32)
        pred = f32 / jnp.maximum(jnp.linalg.norm(f32, axis=-1, keepdims=True), 1e-12)
    elif cfg.mm.apply_softmax:
        pred = jax.nn.softmax(pred.astype(jnp.float32) / 0.07, axis=-1)
    else:
        pred = pred.astype(jnp.float32)
    return pred


def image_token_table(params: Params, cfg: MetaMorphConfig,
                      batch: Dict[str, jnp.ndarray], projected: jnp.ndarray
                      ) -> jnp.ndarray:
    """Flat [A, D] image-token table the packer's img_gather_idx indexes into.

    Uniform path: slot-major reshape of [N, K, D]. Anyres path (batch carries
    `view_map`): one static gather over the flattened per-view tokens with the
    learned newline param selected at NEWLINE_IDX positions and zeros at
    PAD_IDX — the static-shape equivalent of the reference's dynamic spatial
    merge (`metamorph_arch.py:203-237`)."""
    if "view_map" in batch:
        D = projected.shape[-1]
        assert projected.shape[1] == cfg.siglip.num_patches, (
            "anyres merge needs the raw patch grid; set "
            "mm.image_token_reduction='none'")
        flat = projected.reshape(-1, D)
        vm = batch["view_map"]
        safe = jnp.take(flat, jnp.maximum(vm, 0), axis=0)
        newline = params.get("image_newline")
        if newline is None:
            newline = jnp.zeros((D,), projected.dtype)
        return jnp.where((vm == -1)[:, None], newline.astype(projected.dtype),
                         jnp.where((vm >= 0)[:, None], safe, 0.0))
    N, K, D = projected.shape
    return projected.reshape(N * K, D)


def fuse_embeddings(params: Params, cfg: MetaMorphConfig, batch: Dict[str, jnp.ndarray],
                    projected: jnp.ndarray) -> jnp.ndarray:
    """Scatter projected image tokens into the text embedding table output —
    the static equivalent of the reference splice loop.

    The flat image-token table is explicitly constrained to replicated: one
    small all-gather ([A, D], a few MB) at a well-defined point, after which
    the gather has a replicated operand + batch-sharded indices — a pattern
    GSPMD partitions natively (no involuntary full rematerialization)."""
    from jax.sharding import PartitionSpec as P

    from metamorph_tpu.parallel.context import act_spec, constrain

    text_emb = llama_lib.embed_tokens(params["llama"], batch["tokens"])
    table = image_token_table(params, cfg, batch, projected)
    D = table.shape[-1]
    img_flat = jnp.concatenate(
        [table, jnp.zeros((1, D), table.dtype)], axis=0)
    img_flat = constrain(img_flat, P(None, None))
    gathered = jnp.take(img_flat, batch["img_gather_idx"], axis=0)  # [B,T,D]
    gathered = constrain(gathered, act_spec(3))
    return jnp.where(batch["is_image"][..., None], gathered, text_emb)


def _chunked_ce(params: Params, cfg: MetaMorphConfig, hidden: jnp.ndarray,
                labels: jnp.ndarray, chunk: int = 512) -> jnp.ndarray:
    """Mean CE over non-IGNORE labels, scanning sequence chunks with remat —
    each backward step recomputes one [B,chunk,V] logits block instead of
    holding the full fp32 logits tensor."""
    B, T, D = hidden.shape
    chunk = min(chunk, T)
    n_chunks = -(-T // chunk)
    pad = n_chunks * chunk - T
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)),
                         constant_values=IGNORE_INDEX)
    h_chunks = hidden.reshape(B, n_chunks, chunk, D).transpose(1, 0, 2, 3)
    l_chunks = labels.reshape(B, n_chunks, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def body(carry, inp):
        total, count = carry
        h, l = inp
        logits = llama_lib.lm_head(params["llama"], cfg.llama, h)  # fp32
        valid = l != IGNORE_INDEX
        safe = jnp.where(valid, l, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return (total - (tok * valid).sum(), count + valid.sum()), None

    (total, count), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.int32(0)), (h_chunks, l_chunks))
    return total / jnp.maximum(count, 1)


def metamorph_forward(
    params: Params,
    cfg: MetaMorphConfig,
    batch: Dict[str, jnp.ndarray],
    pixels: jnp.ndarray,
    attn_impl: str = "xla",
    remat: bool = False,
    remat_policy: str = "dots_no_batch",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Training forward: fused multimodal sequence -> (total_loss, metrics)."""
    from jax.sharding import PartitionSpec as P

    from metamorph_tpu.parallel.context import act_spec, constrain

    projected, targets = encode_images(params, cfg, pixels)
    embeds = fuse_embeddings(params, cfg, batch, projected)
    embeds = constrain(embeds, act_spec(3))

    hidden = llama_lib.llama_forward(
        params["llama"], cfg.llama, embeds,
        batch["position_ids"], batch["attn_mask"],
        attn_impl=attn_impl, remat=remat, remat_policy=remat_policy)
    hidden = constrain(hidden, act_spec(3))

    # ---- text CE (shifted) — metamorph_llama.py:401-413 ----
    # Chunked over the sequence so the fp32 [B,T,128k] logits never
    # materialize (the reference holds them whole; at B=4,T=4096 that is 8GB).
    loss_language = _chunked_ce(params, cfg, hidden[:, :-1],
                                batch["labels"][:, 1:],
                                chunk=cfg.train.ce_chunk)
    valid = (batch["labels"][:, 1:] != IGNORE_INDEX)
    n_valid = jnp.maximum(valid.sum(), 1)

    # ---- image-AR loss — metamorph_llama.py:420-459 ----
    # Mask-based formulation: pred/target live on the same [B,T] batch-sharded
    # layout as the decoder (no cross-batch gather of `hidden`, which GSPMD
    # could only realize by replicating it). The target table reuses the fuse
    # gather plan (img_gather_idx), which also permits per-slot variable token
    # counts (anyres). The vision head runs on every position and is weighted
    # by the answer-image mask — its FLOPs are ~0.1% of the decoder's.
    N, K, Dv = targets.shape
    if "view_map" in batch:
        # reference anyres produces no AR targets (`metamorph_arch.py:193-240`:
        # target_prob stays None); anyres images are prompt images only, so
        # the mask is all-zero and the target table is inert
        A = batch["view_map"].shape[0]
        tgt_flat = jnp.zeros((A + 1, Dv), jnp.float32)
    else:
        tgt_flat = jnp.concatenate(
            [targets.reshape(N * K, Dv).astype(jnp.float32),
             jnp.zeros((1, Dv), jnp.float32)], axis=0)
    tgt_flat = constrain(tgt_flat, P(None, None))
    tgt = jnp.take(tgt_flat, batch["img_gather_idx"], axis=0)        # [B,T,Dv]
    tgt = constrain(tgt, act_spec(3))
    # teacher-forced: hidden at t-1 predicts image token t (metamorph_llama.py:384-390);
    # t=0 is never an image token (bos precedes any image in a packed row)
    h_prev = jnp.pad(hidden, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    pred = apply_vision_head(params, cfg, h_prev)                     # [B,T,Dv] fp32
    pred = constrain(pred, act_spec(3))
    w = batch["image_ar_mask"].astype(jnp.float32)                    # [B,T]
    n_ar = jnp.maximum(w.sum(), 1.0)
    if cfg.mm.apply_softmax:
        per_tok = -(tgt * jnp.log(pred + 1e-10)).sum(-1)
    elif cfg.mm.normalize_vision:
        tgt_n = tgt / jnp.maximum(jnp.linalg.norm(tgt, axis=-1, keepdims=True), 1e-12)
        per_tok = -(pred * tgt_n).sum(-1)   # pred already unit-norm
    else:
        per_tok = jnp.abs(tgt - pred).mean(-1)
    loss_image_ar = (per_tok * w).sum() / n_ar

    total = loss_language
    if cfg.mm.use_vision_ar:
        total = total + cfg.mm.vision_coef * loss_image_ar

    metrics = {
        "loss": total,
        "loss_language": loss_language,
        "loss_image_ar": loss_image_ar,
        "n_text_tokens": n_valid.astype(jnp.float32),
        "n_image_ar_tokens": w.sum(),
    }
    return total, metrics
