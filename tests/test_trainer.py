"""End-to-end trainer loop test: synthetic data -> a few steps -> checkpoint ->
resume continues from the saved step."""

import json
import os

import numpy as np
import pytest

from metamorph_tpu.config import (MetaMorphConfig, LlamaConfig, SiglipConfig,
                                  MultimodalConfig, TrainConfig, MeshConfig)
from metamorph_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX, IM_START_TOKEN_ID
from metamorph_tpu.multimodal.packing import pack_sequences
from metamorph_tpu.train.trainer import TrainerArgs, train


def tiny_cfg(total_steps, **kw):
    return MetaMorphConfig(
        llama=LlamaConfig.tiny(vocab_size=128258),
        siglip=SiglipConfig.tiny(),
        mm=MultimodalConfig(num_image_tokens=4),
        mesh=MeshConfig(data=2, fsdp=2, tensor=2),
        train=TrainConfig(max_seq_len=24, batch_size=4, max_images_per_batch=4,
                          total_steps=total_steps, remat=False,
                          learning_rate=1e-3, **kw),
    )


class FakeData:
    def __init__(self, cfg):
        self.cfg = cfg
        self.state = {"epoch": 0, "step_in_epoch": 0}

    def state_dict(self):
        return dict(self.state)

    def load_state_dict(self, s):
        self.state = dict(s)

    def __iter__(self):
        cfg = self.cfg
        K = cfg.mm.num_image_tokens
        B = cfg.train.batch_size
        while True:
            ids = [[1, 2 + b, IM_START_TOKEN_ID, IMAGE_TOKEN_INDEX, 128257, 7, 8]
                   for b in range(B)]
            labs = [[IGNORE_INDEX, IGNORE_INDEX, IM_START_TOKEN_ID, 0, 128257, 7, 8]
                    for _ in range(B)]
            packed = pack_sequences(ids, labs, K, cfg.train.max_seq_len, B)
            pixels = np.random.default_rng(0).normal(
                size=(B, 28, 28, 3)).astype(np.float32)
            self.state["step_in_epoch"] += 1
            yield packed, pixels


def test_train_loop_and_resume(tmp_path):
    cfg = tiny_cfg(total_steps=3)
    args = TrainerArgs(output_dir=str(tmp_path), save_steps=2,
                       logging_steps=1, resume=True)
    out = train(cfg, args, FakeData(cfg))
    assert out["step"] == 3
    assert os.path.exists(tmp_path / "step_3")
    assert "loss" in out["metrics"]

    # metrics were logged
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) >= 3
    row = json.loads(lines[-1])
    assert {"loss", "loss_language", "loss_image_ar"} <= set(row)

    # resume: raising total_steps continues from step 3
    cfg2 = tiny_cfg(total_steps=5)
    out2 = train(cfg2, args, FakeData(cfg2))
    assert out2["step"] == 5


def test_stage1_adapter_saved(tmp_path):
    cfg = tiny_cfg(total_steps=2, tune_mm_mlp_adapter=True)
    args = TrainerArgs(output_dir=str(tmp_path), save_steps=10, resume=False)
    train(cfg, args, FakeData(cfg))
    assert os.path.exists(tmp_path / "mm_projector.safetensors")


def test_grad_accum(tmp_path):
    cfg = tiny_cfg(total_steps=2, grad_accum_steps=2)
    args = TrainerArgs(output_dir=str(tmp_path), save_steps=10, resume=False)
    out = train(cfg, args, FakeData(cfg))
    assert out["step"] == 2
    assert np.isfinite(out["metrics"]["loss"])


def test_mixed_K_accum_group_rejected(tmp_path):
    """A grad-accum group whose microbatches disagree on num_image_tokens must
    fail loudly (not silently stack wrong shapes / derive K from the last)."""
    from metamorph_tpu.train.data import PackedCollator

    cfg = tiny_cfg(total_steps=1, grad_accum_steps=2)

    class MixedKData(FakeData):
        def __iter__(self):
            col = PackedCollator(num_image_tokens=4,
                                 max_seq_len=cfg.train.max_seq_len,
                                 num_image_slots=cfg.train.batch_size,
                                 image_size=28)
            K_seq = [1, 4]
            i = 0
            while True:
                K = K_seq[i % 2]
                i += 1
                B = cfg.train.batch_size
                ids = [[1, 2, IM_START_TOKEN_ID, IMAGE_TOKEN_INDEX, 128257, 7]
                       for _ in range(B)]
                labs = [[IGNORE_INDEX, IGNORE_INDEX, IM_START_TOKEN_ID, 0,
                         128257, 7] for _ in range(B)]
                packed, pixels = col(
                    [{"input_ids": a, "labels": l,
                      "pixels": np.zeros((1, 28, 28, 3), np.float32),
                      "modality_length": 6} for a, l in zip(ids, labs)],
                    num_image_tokens=K)
                self.state["step_in_epoch"] += 1
                yield packed, pixels

    args = TrainerArgs(output_dir=str(tmp_path), save_steps=100, resume=False)
    with pytest.raises(ValueError, match="mixed num_image_tokens"):
        train(cfg, args, MixedKData(cfg))


def test_multires_buckets(tmp_path):
    """Multi-res bucket training: per-batch K varies over the bucket set and
    steps run on each variant (image_token_len==0 analog, bucketed)."""
    from metamorph_tpu.train.data import PackedCollator

    cfg = tiny_cfg(total_steps=3)
    object.__setattr__(cfg.mm, "num_image_tokens_buckets", (1, 4))

    class BucketData(FakeData):
        def __iter__(self):
            import random as _r

            K_seq = [1, 4, 1]
            i = 0
            col = PackedCollator(num_image_tokens=4,
                                 max_seq_len=cfg.train.max_seq_len,
                                 num_image_slots=cfg.train.batch_size,
                                 image_size=28)
            while True:
                K = K_seq[i % len(K_seq)]
                i += 1
                B = cfg.train.batch_size
                ids = [[1, 2 + b, IM_START_TOKEN_ID, IMAGE_TOKEN_INDEX, 128257, 7, 8]
                       for b in range(B)]
                labs = [[IGNORE_INDEX, IGNORE_INDEX, IM_START_TOKEN_ID, 0, 128257,
                         7, 8] for _ in range(B)]
                packed, pixels = col(
                    [{"input_ids": a, "labels": l,
                      "pixels": np.random.default_rng(0).normal(
                          size=(1, 28, 28, 3)).astype(np.float32),
                      "modality_length": 7} for a, l in zip(ids, labs)],
                    num_image_tokens=K)
                self.state["step_in_epoch"] += 1
                yield packed, pixels

    from metamorph_tpu.train.trainer import TrainerArgs, train

    args = TrainerArgs(output_dir=str(tmp_path), save_steps=100, resume=False)
    out = train(cfg, args, BucketData(cfg))
    assert out["step"] == 3
    assert np.isfinite(out["metrics"]["loss"])
