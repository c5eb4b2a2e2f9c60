"""metamorph-tpu: a TPU-native unified multimodal understand-and-generate
framework (JAX / XLA / Pallas / pjit) with the capabilities of
facebookresearch/metamorph. See README.md and PARITY.md.

Public surface (lazy imports; jax loads on first use):

    from metamorph_tpu import MetaMorphConfig
    from metamorph_tpu.models.metamorph import init_metamorph_params, metamorph_forward
    from metamorph_tpu.inference.decode import generate, greedy_decode
    from metamorph_tpu.inference.loader import load_pretrained_model
    from metamorph_tpu.train.trainer import train, TrainerArgs
"""

from metamorph_tpu.config import (LlamaConfig, MeshConfig, MetaMorphConfig,
                                  MultimodalConfig, SiglipConfig, TrainConfig)
from metamorph_tpu.constants import (DEFAULT_IM_END_TOKEN, DEFAULT_IM_START_TOKEN,
                                     DEFAULT_IMAGE_TOKEN, IGNORE_INDEX,
                                     IM_END_TOKEN_ID, IM_START_TOKEN_ID,
                                     IMAGE_TOKEN_INDEX)

__version__ = "0.1.0"

__all__ = [
    "LlamaConfig", "MeshConfig", "MetaMorphConfig", "MultimodalConfig",
    "SiglipConfig", "TrainConfig",
    "IGNORE_INDEX", "IMAGE_TOKEN_INDEX", "IM_START_TOKEN_ID", "IM_END_TOKEN_ID",
    "DEFAULT_IMAGE_TOKEN", "DEFAULT_IM_START_TOKEN", "DEFAULT_IM_END_TOKEN",
    "__version__",
]
