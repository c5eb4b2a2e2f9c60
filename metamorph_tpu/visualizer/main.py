"""Visualizer training CLI — the `visualization/train.py` + `submit.sh` entry.

    python -m metamorph_tpu.visualizer.main --shards shards.json \
        --siglip <hf-siglip-dir> [--sd <diffusers-sd15-dir>] --output-dir out/vis
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--shards", required=True,
                   help="JSON list of tar shard paths, or a glob pattern")
    p.add_argument("--siglip", required=True, help="HF SigLIP weights dir")
    p.add_argument("--sd", default=None,
                   help="diffusers SD-1.5 dir (model.safetensors per submodel); "
                        "omit for from-scratch UNet (unet_from_scratch path)")
    p.add_argument("--output-dir", default="./out/visualizer")
    p.add_argument("--adapter-mode", default="mlp",
                   choices=["mlp", "xattn", "xattnffn", "transformer"])
    p.add_argument("--batch-size", type=int, default=24)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--cfg-prob", type=float, default=0.1)
    p.add_argument("--noise-offset", type=float, default=0.0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--unet-lr", type=float, default=1e-5)
    p.add_argument("--unfreeze-unet", action="store_true")
    p.add_argument("--total-steps", type=int, default=16000)
    p.add_argument("--save-steps", type=int, default=1000)
    p.add_argument("--num-tokens", type=int, default=64)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from metamorph_tpu.config import MultimodalConfig, SiglipConfig
    from metamorph_tpu.inference.loader import save_visualizer
    from metamorph_tpu.models.hf_import import (load_safetensors_dir,
                                                siglip_params_from_hf)
    from metamorph_tpu.models.siglip import vision_tower_forward
    from metamorph_tpu.visualizer.train import (VisualizerTrainConfig,
                                                decode_and_preprocess,
                                                iter_tar_shards,
                                                make_visualizer_train_step)
    from metamorph_tpu.visualizer.unet import UNetConfig
    from metamorph_tpu.visualizer.vae import VAEConfig
    from metamorph_tpu.utils.logging import MetricsLogger, rank0_print

    if args.shards.endswith(".json"):
        with open(args.shards) as f:
            shards = json.load(f)
    else:
        shards = sorted(glob.glob(args.shards))
    if not shards:
        raise SystemExit("no shards found")

    sig_cfg = SiglipConfig()
    mm = MultimodalConfig(num_image_tokens=args.num_tokens, normalize_vision=True)
    sig_params = siglip_params_from_hf(load_safetensors_dir(args.siglip),
                                       sig_cfg, jnp.float32)

    tc = VisualizerTrainConfig(
        adapter_mode=args.adapter_mode, num_tokens=args.num_tokens,
        cfg_prob=args.cfg_prob, noise_offset=args.noise_offset,
        learning_rate=args.lr, unet_lr=args.unet_lr,
        unfreeze_unet=args.unfreeze_unet,
        unet_from_scratch=args.unet_path is None, batch_size=args.batch_size,
        resolution=args.resolution, total_steps=args.total_steps)
    unet_cfg, vae_cfg = UNetConfig(), VAEConfig()

    # DDP over every available chip (reference: 1 node x 8 GPUs, submit.sh);
    # params replicated, batch sharded on the data axis
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    step_fn, init_state = make_visualizer_train_step(tc, unet_cfg, vae_cfg,
                                                     mesh=mesh)
    state = init_state(jax.random.PRNGKey(tc.seed), dtype=jnp.float32)
    if args.sd:
        from metamorph_tpu.visualizer.hf_import import (unet_params_from_hf,
                                                        vae_params_from_hf)

        sd_unet = load_safetensors_dir(os.path.join(args.sd, "unet"))
        sd_vae = load_safetensors_dir(os.path.join(args.sd, "vae"))
        state["unet"] = unet_params_from_hf(sd_unet, unet_cfg)
        state["vae"] = vae_params_from_hf(sd_vae, vae_cfg)

    os.makedirs(args.output_dir, exist_ok=True)
    metrics = MetricsLogger(os.path.join(args.output_dir, "metrics.jsonl"))

    @jax.jit
    def encode(sig_params, sig_px):
        # params as args (closed-over arrays embed as giant HLO constants)
        return vision_tower_forward(sig_params, sig_cfg, mm, sig_px)

    def batches():
        sig_buf, vae_buf = [], []
        while True:  # resampled shards (WebDataset resampled=True)
            for raw in iter_tar_shards(shards, jax.process_index(),
                                       jax.process_count()):
                try:
                    sig, vimg = decode_and_preprocess(raw, sig_cfg.image_size,
                                                      args.resolution)
                except Exception:
                    continue  # corrupt image -> skip (ref :135-137)
                sig_buf.append(sig)
                vae_buf.append(vimg)
                if len(sig_buf) == args.batch_size:
                    yield np.stack(sig_buf), np.stack(vae_buf)
                    sig_buf, vae_buf = [], []

    step = 0
    t_last = time.time()
    state = jax.device_put(state, repl)
    for sig_px, vae_px in batches():
        embeds = encode(sig_params, jax.device_put(jnp.asarray(sig_px), batch_sh))
        state, loss = step_fn(state, embeds,
                              jax.device_put(jnp.asarray(vae_px), batch_sh),
                              jax.random.PRNGKey(step))
        step += 1
        if step % 10 == 0:
            rank0_print(f"vis step {step}: loss={float(loss):.4f} "
                        f"({10 / (time.time() - t_last):.2f} it/s)")
            metrics.log(step, {"loss": float(loss)})
            t_last = time.time()
        if step % args.save_steps == 0 or step >= args.total_steps:
            save_visualizer(args.output_dir, state["adapter"], state["unet"],
                            state["vae"], unet_cfg, vae_cfg, args.adapter_mode)
        if step >= args.total_steps:
            break


if __name__ == "__main__":
    main()
