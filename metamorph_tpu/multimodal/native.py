"""ctypes bridge to the native packer (native/packer.cpp).

Builds libmmpack.so on first use (g++ via the bundled Makefile) and exposes
`pack_sequences_native` with the same signature/semantics as the pure-Python
`pack_sequences`, plus `jsonl_index_native`. Falls back to None when no
compiler is available — callers should use the Python path then.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

from metamorph_tpu.constants import IGNORE_INDEX
from metamorph_tpu.multimodal.packing import PackedBatch

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmmpack.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.mm_pack.restype = ctypes.c_int
    lib.mm_pack.argtypes = [i32p, i32p, i32p,
                            ctypes.c_int, ctypes.c_int, ctypes.c_int,
                            ctypes.c_int, ctypes.c_int,
                            i32p, ctypes.c_int, ctypes.c_int,
                            i32p, i32p, i32p, i32p, i32p, u8p, i32p,
                            i32p, i32p, i32p, f32p, f32p]
    lib.jsonl_index.restype = ctypes.c_long
    lib.jsonl_index.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_int64), ctypes.c_long]
    lib.modality_lengths.restype = ctypes.c_long
    lib.modality_lengths.argtypes = [ctypes.c_char_p, i32p, ctypes.c_long]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def pack_sequences_native(
    input_ids: Sequence[Sequence[int]],
    labels: Optional[Sequence[Sequence[int]]],
    num_image_tokens: int,
    max_seq_len: int,
    num_image_slots: int,
    padding_side: str = "right",
    tokens_per_image: Optional[Sequence[int]] = None,
    gather_capacity: Optional[int] = None,
) -> PackedBatch:
    lib = _load()
    if lib is None:
        raise RuntimeError("native packer unavailable (no compiler?)")

    B, K, T, N = len(input_ids), num_image_tokens, max_seq_len, num_image_slots
    if tokens_per_image is not None:
        tpi = np.asarray(tokens_per_image, np.int32)
        A = gather_capacity if gather_capacity is not None else int(tpi.sum())
        tpi_ptr, n_tpi = _ptr(tpi, ctypes.c_int32), len(tpi)
    else:
        A = N * K
        tpi_ptr, n_tpi = None, 0
    flat_ids = np.asarray([t for row in input_ids for t in row], np.int32)
    if labels is None:
        flat_labs = np.full_like(flat_ids, IGNORE_INDEX)
    else:
        flat_labs = np.asarray([t for row in labels for t in row], np.int32)
        assert flat_labs.shape == flat_ids.shape
    row_lens = np.asarray([len(r) for r in input_ids], np.int32)

    tokens = np.zeros((B, T), np.int32)
    labels_out = np.zeros((B, T), np.int32)
    attn = np.zeros((B, T), np.int32)
    pos = np.zeros((B, T), np.int32)
    gather = np.zeros((B, T), np.int32)
    is_img = np.zeros((B, T), np.uint8)
    ar_mask = np.zeros((B, T), np.int32)
    ar_b = np.zeros((A,), np.int32)
    ar_p = np.zeros((A,), np.int32)
    ar_t = np.zeros((A,), np.int32)
    ar_v = np.zeros((A,), np.float32)
    slot_used = np.zeros((N,), np.float32)

    rc = lib.mm_pack(
        _ptr(flat_ids, ctypes.c_int32), _ptr(flat_labs, ctypes.c_int32),
        _ptr(row_lens, ctypes.c_int32), B, K, T, N,
        1 if padding_side == "left" else 0,
        tpi_ptr, n_tpi, A,
        _ptr(tokens, ctypes.c_int32), _ptr(labels_out, ctypes.c_int32),
        _ptr(attn, ctypes.c_int32), _ptr(pos, ctypes.c_int32),
        _ptr(gather, ctypes.c_int32), _ptr(is_img, ctypes.c_uint8),
        _ptr(ar_mask, ctypes.c_int32), _ptr(ar_b, ctypes.c_int32),
        _ptr(ar_p, ctypes.c_int32), _ptr(ar_t, ctypes.c_int32),
        _ptr(ar_v, ctypes.c_float), _ptr(slot_used, ctypes.c_float))
    if rc != 0:
        raise ValueError(
            f"native packer error {rc} (-1/-2: image slots exceed budget {N}; "
            f"-3: more images than tokens_per_image entries)")

    return PackedBatch(
        tokens=tokens, labels=labels_out, attn_mask=attn, position_ids=pos,
        img_gather_idx=gather, is_image=is_img.astype(bool),
        image_ar_mask=ar_mask, ar_batch_idx=ar_b, ar_pred_pos=ar_p,
        ar_target_idx=ar_t, ar_valid=ar_v, image_slot_used=slot_used)


def modality_lengths_native(path: str) -> np.ndarray:
    """Sign-coded per-line conversation word counts (positive = has image),
    computed in ONE native pass over the JSONL — no per-line json.loads
    (`metamorph/train/metamorph_trainer.py:66-91` sampler input). Raises on
    malformed lines; callers fall back to the Python scan."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native packer unavailable")
    n = lib.modality_lengths(path.encode(), None, 0)
    if n < 0:
        raise OSError(f"modality_lengths count failed on {path} ({n})")
    out = np.zeros((n,), np.int32)
    n2 = lib.modality_lengths(path.encode(), _ptr(out, ctypes.c_int32), n)
    if n2 != n:
        raise ValueError(f"modality_lengths failed on {path} ({n2})")
    return out


def jsonl_index_native(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native packer unavailable")
    n = lib.jsonl_index(path.encode(), None, 0)
    if n < 0:
        raise OSError(f"jsonl_index failed on {path} ({n})")
    out = np.zeros((n,), np.int64)
    n2 = lib.jsonl_index(path.encode(),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n)
    assert n2 == n
    return out
