"""mm_utils tests: square-pad, anyres helpers, sentinel tokenization vs the
reference list-splicing algorithm (`mm_utils.py:191-214`)."""

import numpy as np

from metamorph_tpu.constants import IMAGE_TOKEN_INDEX
from metamorph_tpu.multimodal.mm_utils import (
    expand2square, get_anyres_image_grid_shape, process_anyres_image,
    process_images, resize_bilinear, select_best_resolution, siglip_preprocess,
    tokenizer_image_token, get_model_name_from_path)


def test_expand2square():
    img = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    out = expand2square(img, (7, 8, 9))
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(out[1:3], img)
    np.testing.assert_array_equal(out[0], np.tile([7, 8, 9], (4, 1)))

    tall = np.ones((4, 2, 3), np.uint8)
    out = expand2square(tall, (0, 0, 0))
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(out[:, 1:3], tall)


def test_resize_matches_torch_bilinear():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (20, 30, 3)).astype(np.float32)
    ours = resize_bilinear(img, (11, 13))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    ref = F.interpolate(t, size=(11, 13), mode="bilinear", align_corners=False)
    ref = ref[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_siglip_preprocess_range():
    img = np.full((10, 10, 3), 255, np.uint8)
    out = siglip_preprocess(img, 384)
    assert out.shape == (384, 384, 3)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)  # (1-0.5)/0.5
    img0 = np.zeros((10, 10, 3), np.uint8)
    np.testing.assert_allclose(siglip_preprocess(img0, 8), -1.0, atol=1e-6)


def test_select_best_resolution():
    res = [(384, 768), (768, 384), (768, 768), (1152, 384)]
    assert select_best_resolution((1000, 300), res) == (1152, 384)
    assert select_best_resolution((300, 1000), res) == (384, 768)


def test_anyres_grid_shape():
    assert get_anyres_image_grid_shape((1000, 300), [(384, 768), (1152, 384)], 384) == (3, 1)


def test_process_anyres_image():
    img = np.random.default_rng(1).uniform(0, 255, (300, 1000, 3)).astype(np.uint8)
    out = process_anyres_image(img, [(384, 768), (1152, 384)], 384, 384)
    assert out.shape == (1 + 3, 384, 384, 3)  # global + 3x1 tiles


def test_process_images_pad():
    imgs = [np.zeros((10, 20, 3), np.uint8)]
    out = process_images(imgs, image_aspect_ratio="pad", image_size=384)
    assert out.shape == (1, 384, 384, 3)


def _ref_tokenizer_image_token(prompt, tokenize, bos):
    """Direct transcription of the reference splice (`mm_utils.py:191-214`)."""
    prompt_chunks = [tokenize(chunk) for chunk in prompt.split("<image>")]

    def insert_separator(X, sep):
        return [ele for sublist in zip(X, [sep] * len(X)) for ele in sublist][:-1]

    input_ids = []
    offset = 0
    if prompt_chunks and len(prompt_chunks[0]) > 0 and prompt_chunks[0][0] == bos:
        offset = 1
        input_ids.append(prompt_chunks[0][0])
    for x in insert_separator(prompt_chunks, [IMAGE_TOKEN_INDEX] * (offset + 1)):
        input_ids.extend(x[offset:])
    return input_ids


def test_tokenizer_image_token_matches_reference():
    BOS = 128000

    def tok(s):
        return [BOS] + [1000 + ord(c) for c in s]

    for prompt in ["hi <image> there", "<image>x", "a<image>b<image>c",
                   "no image", "<image>", "<image><image>"]:
        ours = tokenizer_image_token(prompt, tok, bos_token_id=BOS)
        ref = _ref_tokenizer_image_token(prompt, tok, BOS)
        assert ours == ref, prompt

    def tok_nobos(s):
        return [1000 + ord(c) for c in s]

    for prompt in ["hi <image> there", "<image>x"]:
        ours = tokenizer_image_token(prompt, tok_nobos, bos_token_id=BOS)
        ref = _ref_tokenizer_image_token(prompt, tok_nobos, BOS)
        assert ours == ref, prompt


def test_model_name_from_path():
    assert get_model_name_from_path("/a/b/model-x") == "model-x"
    assert get_model_name_from_path("/a/model-x/checkpoint-100") == "model-x_checkpoint-100"


def test_unpad_image():
    from metamorph_tpu.multimodal.mm_utils import unpad_image

    # wide original image (1000x300): vertical letterbox removed
    feat = np.arange(10 * 10 * 2, dtype=np.float32).reshape(10, 10, 2)
    out = unpad_image(feat, (1000, 300))
    assert out.shape[1] == 10 and out.shape[0] < 10
    # tall original
    out2 = unpad_image(feat, (300, 1000))
    assert out2.shape[0] == 10 and out2.shape[1] < 10


def test_merge_anyres_features():
    from metamorph_tpu.multimodal.mm_utils import merge_anyres_features

    s, d = 4, 8  # 4x4 patches per tile
    feats = np.random.default_rng(0).normal(size=(1 + 3, s * s, d)).astype(np.float32)
    merged = merge_anyres_features(
        feats, (1000, 300), [(1152, 384), (384, 768)], 384, s, "spatial")
    assert merged.shape == (s * s + 3 * s * s, d)
    merged_unpad = merge_anyres_features(
        feats, (1000, 300), [(1152, 384), (384, 768)], 384, s, "spatial_unpad",
        image_newline=np.zeros(d, np.float32))
    # 3x1 tile grid -> 4x12 spatial map; unpad rounds to 0 rows removed here,
    # newline adds one column: 16 base + 4*(12+1)
    assert merged_unpad.shape == (16 + 4 * 13, d)


def test_base64_roundtrip():
    """process_image b64 output -> load_image_from_base64 round trip."""
    from metamorph_tpu.multimodal.conversation import conv_llama_3
    from metamorph_tpu.multimodal.mm_utils import load_image_from_base64

    img = np.arange(20 * 30 * 3, dtype=np.uint8).reshape(20, 30, 3)
    b64 = conv_llama_3.copy().process_image(img, "Default", return_pil=False)
    back = load_image_from_base64(b64)
    np.testing.assert_array_equal(back, img)  # PNG is lossless


def test_pretty_print_semaphore():
    import asyncio

    from metamorph_tpu.utils.logging import pretty_print_semaphore

    assert pretty_print_semaphore(None) == "None"
    s = asyncio.Semaphore(3)  # the reference formats asyncio semaphores
    assert "value=3" in pretty_print_semaphore(s)
