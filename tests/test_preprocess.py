"""Fused device-side preprocessing == host numpy/torch bilinear + normalize."""

import jax.numpy as jnp
import numpy as np

from metamorph_tpu.multimodal.mm_utils import siglip_preprocess
from metamorph_tpu.ops.preprocess import fused_resize_normalize


def test_matches_host_preprocess():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (3, 50, 70, 3)).astype(np.uint8)
    dev = np.asarray(fused_resize_normalize(jnp.asarray(frames), out_size=32))
    host = np.stack([siglip_preprocess(f, 32) for f in frames])
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-4)


def test_matches_torch_interpolate():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    frames = rng.uniform(0, 255, (2, 37, 53, 3)).astype(np.float32)
    dev = np.asarray(fused_resize_normalize(jnp.asarray(frames), out_size=24))
    t = torch.from_numpy(frames.transpose(0, 3, 1, 2))
    ref = F.interpolate(t, size=(24, 24), mode="bilinear", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    ref = (ref / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(dev, ref, rtol=1e-4, atol=1e-4)
