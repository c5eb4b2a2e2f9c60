"""Training CLI — the `train_mem.py` / `train.py:train()` entry point.

Replaces the reference's HfArgumentParser three-dataclass CLI (`train.py:43-113`,
`train_mem.py:7-11`) and the DeepSpeed JSON layer: one JSON/CLI config tree
(see `config.py`). SLURM/torchrun launch is replaced by per-host invocation
with `--multihost` (jax.distributed.initialize discovers the TPU pod).

    python -m metamorph_tpu.train.main --config configs/stage2_finetune.json \
        --data-path data.jsonl --tokenizer <hf-tokenizer-dir> \
        --output-dir ./out
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True, help="MetaMorphConfig JSON file")
    p.add_argument("--data-path", required=True)
    p.add_argument("--tokenizer", required=True, help="HF tokenizer dir")
    p.add_argument("--output-dir", default="./out")
    p.add_argument("--hf-llama-path", default=None)
    p.add_argument("--hf-siglip-path", default=None)
    p.add_argument("--pretrain-mm-mlp-adapter", default=None)
    p.add_argument("--save-steps", type=int, default=500)
    p.add_argument("--save-total-limit", type=int, default=1)
    p.add_argument("--logging-steps", type=int, default=1)
    p.add_argument("--image-aspect-ratio", default="square")
    p.add_argument("--group-by-modality-length", action="store_true")
    p.add_argument("--attn-impl", default="flash",
                   choices=["xla", "flash", "ring"],
                   help="ring = sequence-parallel ring attention (set "
                        "train.sequence_parallel in the config JSON; "
                        "max_seq_len must divide the fsdp axis)")
    p.add_argument("--multihost", action="store_true")
    p.add_argument("--use-wandb", action="store_true")
    p.add_argument("--no-resume", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from metamorph_tpu.config import MetaMorphConfig
    from metamorph_tpu.train.data import (DataConfig, DataIterator,
                                          LazySupervisedDataset, PackedCollator)
    from metamorph_tpu.train.trainer import TrainerArgs, train

    with open(args.config) as f:
        cfg = MetaMorphConfig.from_json(f.read())

    import jax

    if args.multihost:
        jax.distributed.initialize()  # before the iterator: per-host loading
    p_idx, p_cnt = jax.process_index(), jax.process_count()

    from transformers import AutoTokenizer

    from metamorph_tpu.constants import (DEFAULT_IM_END_TOKEN,
                                         DEFAULT_IM_START_TOKEN)

    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    # add <image_start>/<image_end> (initialize_vision_tokenizer,
    # metamorph_arch.py:427-446; mean-init handled at embedding resize import)
    tok.add_tokens([DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN],
                   special_tokens=True)

    data_cfg = DataConfig(
        data_path=args.data_path,
        image_aspect_ratio=args.image_aspect_ratio,
        image_size=cfg.siglip.image_size,
        mm_use_im_start_end=cfg.mm.mm_use_im_start_end,
        model_max_length=cfg.train.max_seq_len,
        grid_pinpoints=cfg.mm.image_grid_pinpoints,
    )
    dataset = LazySupervisedDataset(
        args.data_path, lambda s: tok(s).input_ids, data_cfg,
        seed=cfg.train.seed)
    collator = PackedCollator(
        num_image_tokens=cfg.mm.num_image_tokens,
        max_seq_len=cfg.train.max_seq_len,
        num_image_slots=cfg.train.max_images_per_batch,
        image_size=cfg.siglip.image_size,
        image_aspect_ratio=args.image_aspect_ratio,
        grid_pinpoints=cfg.mm.image_grid_pinpoints,
        merge_type=cfg.mm.mm_patch_merge_type,
        patch_size=cfg.siglip.patch_size)
    data_iter = DataIterator(dataset, collator, cfg.train.batch_size,
                             seed=cfg.train.seed,
                             group_by_modality=args.group_by_modality_length,
                             accum_steps=cfg.train.grad_accum_steps,
                             process_index=p_idx,
                             process_count=(p_cnt if args.image_aspect_ratio
                                            != "anyres" else 1))

    trainer_args = TrainerArgs(
        output_dir=args.output_dir,
        save_steps=args.save_steps,
        save_total_limit=args.save_total_limit,
        logging_steps=args.logging_steps,
        resume=not args.no_resume,
        pretrain_mm_mlp_adapter=args.pretrain_mm_mlp_adapter,
        hf_llama_path=args.hf_llama_path,
        hf_siglip_path=args.hf_siglip_path,
        use_wandb=args.use_wandb,
        attn_impl=args.attn_impl,
    )
    out = train(cfg, trainer_args, data_iter, multihost=args.multihost)
    print(json.dumps({"final_step": out["step"],
                      "metrics": {k: v for k, v in out["metrics"].items()
                                  if isinstance(v, (int, float))}}))


if __name__ == "__main__":
    main()
