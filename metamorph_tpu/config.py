"""Typed configuration tree for the whole framework.

One config object replaces the reference's three-layer config stack
(HfArgumentParser dataclasses in `metamorph/train/train.py:43-113`, DeepSpeed JSON in
`scripts/zero*.json`, and bash CLI vars). The mesh/sharding section replaces the
DeepSpeed ZeRO JSON. Configs are JSON-serializable so they persist into checkpoint
metadata (parity with `train.py:1511-1544` writing onto `model.config`).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax.numpy as jnp

_DTYPE_NAMES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}


def resolve_dtype(name: str):
    return _DTYPE_NAMES[name]


@dataclass(frozen=True)
class LlamaConfig:
    """LLaMA-3-style decoder config. Defaults = LLaMA-3.1-8B."""

    vocab_size: int = 128258  # 128256 + <image_start> + <image_end>
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rope_theta: float = 500000.0
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 8192
    # LLaMA-3.1 rope scaling ("llama3" style NTK-by-parts); disabled for 3.0.
    rope_scaling: bool = True
    rope_scaling_factor: float = 8.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: int = 8192
    tie_word_embeddings: bool = False
    # LoRA (parity with the reference's lora_enable/lora_r/lora_alpha,
    # train.py:88-93): r > 0 activates the low-rank path in the blocks.
    lora_r: int = 0
    lora_alpha: float = 16.0

    @staticmethod
    def tiny(vocab_size: int = 128258) -> "LlamaConfig":
        """A tiny config for tests: same vocab/token semantics, small compute."""
        return LlamaConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=16,
            rope_scaling=False,
            max_position_embeddings=512,
        )


@dataclass(frozen=True)
class SiglipConfig:
    """SigLIP-SO400M-patch14-384 vision tower config (`siglip_encoder.py:110-126`)."""

    image_size: int = 384
    patch_size: int = 14
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    layer_norm_eps: float = 1e-6
    # Which hidden_states entry to read: -1 = last block output (pre-final-LN),
    # matching `mm_vision_select_layer=-1` in the published scripts.
    select_layer: int = -1

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patches_per_side ** 2

    @staticmethod
    def tiny() -> "SiglipConfig":
        return SiglipConfig(
            image_size=28,
            patch_size=14,
            hidden_size=32,
            intermediate_size=64,
            num_layers=2,
            num_heads=4,
        )


@dataclass(frozen=True)
class MultimodalConfig:
    """Connector / fusion / vision-head config.

    Mirrors reference model args (`train.py:43-64`) + projector builder
    (`multimodal_projector/builder.py:39-64`) + vision head
    (`metamorph_llama.py:246-269`).
    """

    projector_type: str = "mlp2x_gelu"   # linear | mlpNx_gelu | mlpsoftmax | identity
    vision_head_type: str = "mlp"        # linear | mlp | mlp2x_gelu | none(->linear 1152)
    num_image_tokens: int = 64           # 729 -> 64 via bilinear interpolation
    # Multi-res training (the reference's image_token_len==0 random-resolution
    # path, siglip_encoder.py:153-156): instead of a fully dynamic 1..24^2, K
    # is sampled per batch from this static bucket set (one compile each).
    num_image_tokens_buckets: Tuple[int, ...] = ()
    image_token_reduction: str = "interpolation"  # interpolation | mlpmixer | concat_interpolation | none
    normalize_vision: bool = True        # L2-normalize SigLIP features + head output
    apply_softmax: bool = False          # softmax/0.07 variant
    vision_coef: float = 1.0             # weight on the image-AR loss
    use_vision_ar: bool = True
    freeze_vision: bool = True           # stop-gradient through the vision tower
    image_aspect_ratio: str = "square"   # square | pad | anyres
    mm_use_im_start_end: bool = True
    # anyres tiling (`metamorph_arch.py:203-237`): merge type for the per-tile
    # features ("flat" = no merge; "spatial"/"spatial_unpad" = grid restitch,
    # unpad variant drops the letterbox rows and appends a learned newline
    # column). Pinpoints are candidate (w, h) canvas resolutions.
    mm_patch_merge_type: str = "flat"
    image_grid_pinpoints: Tuple[Tuple[int, int], ...] = (
        (384, 768), (768, 384), (768, 768), (1152, 384), (384, 1152))


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh axes. fsdp ≈ ZeRO-3, pure data ≈ DDP, tensor = megatron-style TP."""

    data: int = 1
    fsdp: int = -1   # -1: all remaining devices
    tensor: int = 1
    axis_names: Tuple[str, str, str] = ("data", "fsdp", "tensor")


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    mm_projector_lr: Optional[float] = None   # per-group LR (metamorph_trainer.py:156-271)
    vision_tower_lr: Optional[float] = None
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    warmup_ratio: float = 0.03
    lr_schedule: str = "cosine"
    total_steps: int = 1000
    grad_clip_norm: float = 1.0
    grad_accum_steps: int = 1
    seed: int = 42
    batch_size: int = 8             # global batch
    max_seq_len: int = 4096
    max_images_per_batch: int = 8   # static image-slot budget per global batch
    remat: bool = True              # gradient checkpointing on decoder blocks
    # what the checkpointed block may keep: "dots_no_batch" saves matmul
    # outputs (14% faster fwd+bwd at 8B shapes on v5e, more live memory);
    # "nothing" recomputes the whole block (min memory); "dots" saves all dots
    remat_policy: str = "dots_no_batch"
    # sequence-chunk width for the remat'd cross-entropy scan (the fp32
    # [B, chunk, 128k] logits block is the live-memory knob)
    ce_chunk: int = 512
    # Trainable sets for the 2-stage recipe:
    #   stage1 (connector pretrain): tune_mm_mlp_adapter=True, freeze LLM
    #   stage2 (full finetune): everything except (optionally) vision tower
    tune_mm_mlp_adapter: bool = False
    freeze_backbone: bool = False
    lora_enable: bool = False   # train only LoRA factors in the LLM
    # ZeRO-3-offload analog (`scripts/zero3_offload.json`): keep Adam moments
    # in pinned host memory; XLA streams them over PCIe per step.
    offload_optimizer: bool = False
    # Sequence parallelism (beyond the reference, SURVEY.md §5.7 stretch):
    # [B, T, ...] activations shard T over the fsdp axis (batch over data
    # only) and attention runs as a ring over ICI — use attn_impl="ring" and
    # make max_seq_len divisible by the fsdp axis. Lets one step hold
    # sequences fsdp-times longer than a chip's HBM allows.
    sequence_parallel: bool = False
    param_dtype: str = "bfloat16"
    compute_dtype: str = "bfloat16"


@dataclass(frozen=True)
class MetaMorphConfig:
    """Top-level config for the unified understand-and-generate model."""

    llama: LlamaConfig = field(default_factory=LlamaConfig)
    siglip: SiglipConfig = field(default_factory=SiglipConfig)
    mm: MultimodalConfig = field(default_factory=MultimodalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    @staticmethod
    def tiny() -> "MetaMorphConfig":
        return MetaMorphConfig(
            llama=LlamaConfig.tiny(),
            siglip=SiglipConfig.tiny(),
            mm=MultimodalConfig(num_image_tokens=4),
            train=TrainConfig(max_seq_len=128, batch_size=2, max_images_per_batch=4),
        )

    # ---- serialization ----
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    def with_num_image_tokens(self, k: int) -> "MetaMorphConfig":
        """Config variant with a different per-image token count (multi-res
        bucket dispatch; params are K-independent for interpolation)."""
        mm = MultimodalConfig(**{**dataclasses.asdict(self.mm),
                                 "num_image_tokens": k})
        return MetaMorphConfig(llama=self.llama, siglip=self.siglip, mm=mm,
                               mesh=self.mesh, train=self.train)

    @staticmethod
    def from_dict(d: dict) -> "MetaMorphConfig":
        def detuple(v):
            # JSON has no tuples; restore them recursively (nested lists like
            # image_grid_pinpoints must come back hashable for jit static args)
            if isinstance(v, list):
                return tuple(detuple(x) for x in v)
            return v

        return MetaMorphConfig(
            llama=LlamaConfig(**d.get("llama", {})),
            siglip=SiglipConfig(**d.get("siglip", {})),
            mm=MultimodalConfig(**{k: detuple(v)
                                   for k, v in d.get("mm", {}).items()}),
            mesh=MeshConfig(**{k: detuple(v)
                               for k, v in d.get("mesh", {}).items()}),
            train=TrainConfig(**d.get("train", {})),
        )

    @staticmethod
    def from_json(s: str) -> "MetaMorphConfig":
        return MetaMorphConfig.from_dict(json.loads(s))
