"""Model-wide constants and special token ids.

Parity with reference `metamorph/constants.py:7-19` — same sentinel values so that
tokenized datasets and checkpoints interop bit-for-bit.
"""

IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200
DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_IMAGE_PATCH_TOKEN = "<im_patch>"
DEFAULT_IM_START_TOKEN = "<image_start>"
DEFAULT_IM_END_TOKEN = "<image_end>"
IMAGE_PLACEHOLDER = "<image-placeholder>"

# LLaMA-3 vocabulary is 128256 tokens; the two added vision tokens take the next slots.
# Reference relies on these exact ids for the answer-image detection trick
# (`metamorph/model/metamorph_arch.py:317`) and decode state machine
# (`metamorph/model/language_model/metamorph_llama.py:502`).
LLAMA3_BASE_VOCAB = 128256
IM_START_TOKEN_ID = 128256  # "<image_start>"
IM_END_TOKEN_ID = 128257    # "<image_end>"

# LLaMA-3 eos candidates used by greedy decode
# (`metamorph/model/language_model/metamorph_llama.py:502`).
LLAMA3_EOS_IDS = (128001, 128009)

# SigLIP-SO400M-patch14-384 geometry (`siglip_encoder.py:94-97`).
SIGLIP_HIDDEN = 1152
SIGLIP_PATCHES = 729  # 27 x 27
