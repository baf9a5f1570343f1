"""ctypes loader for the native host library (native/src/tpu_llm_native.cpp).

Everything here has a pure-numpy/Python fallback; the native path exists
because checkpoint repacking and prompt encoding are host-side serial work
(multi-GB transposes, O(n log n) BPE) that pure Python does 10-100x
slower. Build with `make native` at the repo root; absence is never an
error.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libtpu_llm_native.so")


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path) or os.environ.get("TPU_LLM_DISABLE_NATIVE"):
        return None
    lib = ctypes.CDLL(path)
    try:
        lib.tpu_llm_abi_version.restype = ctypes.c_int64
        if lib.tpu_llm_abi_version() != 2:
            return None  # stale build: fail closed, fallbacks take over
    except AttributeError:
        return None  # pre-versioning build
    i64, f32p, u8p, u16p, i8p, i32p, i64p = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
    )
    lib.f16_to_f32.argtypes = [u16p, f32p, i64]
    lib.repack_q4_0.argtypes = [u8p, i64, i64, u8p, f32p]
    lib.repack_q4_1.argtypes = [u8p, i64, i64, u8p, f32p, f32p]
    lib.repack_q8_0.argtypes = [u8p, i64, i64, i8p, f32p]
    lib.transpose_f32.argtypes = [f32p, f32p, i64, i64]
    lib.bpe_encode.argtypes = [u8p, i64, u8p, i64p, f32p, u8p, i64, i32p, i64]
    lib.bpe_encode.restype = i64
    _LIB = lib
    return lib


def available() -> bool:
    return load_library() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def repack_q4_0(raw: np.ndarray, rows: int, row_len: int) -> Tuple[np.ndarray, np.ndarray]:
    lib = load_library()
    assert lib is not None
    raw = np.ascontiguousarray(raw, np.uint8)
    q = np.empty((row_len // 2, rows), np.uint8)
    s = np.empty((row_len // 32, rows), np.float32)
    lib.repack_q4_0(
        _ptr(raw, ctypes.c_uint8), rows, row_len,
        _ptr(q, ctypes.c_uint8), _ptr(s, ctypes.c_float),
    )
    return q, s


def repack_q4_1(raw: np.ndarray, rows: int, row_len: int):
    lib = load_library()
    assert lib is not None
    raw = np.ascontiguousarray(raw, np.uint8)
    q = np.empty((row_len // 2, rows), np.uint8)
    s = np.empty((row_len // 32, rows), np.float32)
    m = np.empty((row_len // 32, rows), np.float32)
    lib.repack_q4_1(
        _ptr(raw, ctypes.c_uint8), rows, row_len,
        _ptr(q, ctypes.c_uint8), _ptr(s, ctypes.c_float),
        _ptr(m, ctypes.c_float),
    )
    return q, s, m


def repack_q8_0(raw: np.ndarray, rows: int, row_len: int) -> Tuple[np.ndarray, np.ndarray]:
    lib = load_library()
    assert lib is not None
    raw = np.ascontiguousarray(raw, np.uint8)
    q = np.empty((row_len, rows), np.int8)
    s = np.empty((row_len // 32, rows), np.float32)
    lib.repack_q8_0(
        _ptr(raw, ctypes.c_uint8), rows, row_len,
        _ptr(q, ctypes.c_int8), _ptr(s, ctypes.c_float),
    )
    return q, s


def f16_to_f32(bits: np.ndarray) -> np.ndarray:
    lib = load_library()
    assert lib is not None
    bits = np.ascontiguousarray(bits).view(np.uint16).reshape(-1)
    out = np.empty(bits.shape, np.float32)
    lib.f16_to_f32(_ptr(bits, ctypes.c_uint16), _ptr(out, ctypes.c_float), bits.size)
    return out


def bpe_encode(
    text: bytes,
    tokens: Sequence[bytes],
    scores: np.ndarray,
    is_byte: Optional[Sequence[bool]] = None,
) -> Optional[List[int]]:
    """``tokens`` are token CONTENT bytes (byte-fallback pieces already
    mapped to their raw byte); ``is_byte`` flags them so the encoder keeps
    them out of the merge index (see BPETokenizer.__init__)."""
    lib = load_library()
    if lib is None:
        return None
    vocab_bytes = b"".join(tokens)
    offsets = np.zeros(len(tokens) + 1, np.int64)
    np.cumsum([len(t) for t in tokens], out=offsets[1:])
    vb = np.frombuffer(vocab_bytes, np.uint8) if vocab_bytes else np.zeros(1, np.uint8)
    txt = np.frombuffer(text, np.uint8) if text else np.zeros(1, np.uint8)
    scores = np.ascontiguousarray(scores, np.float32)
    flags = np.asarray(
        is_byte if is_byte is not None else np.zeros(len(tokens)), np.uint8
    )
    out = np.empty(max(len(text), 1), np.int32)
    n = lib.bpe_encode(
        _ptr(txt, ctypes.c_uint8), len(text),
        _ptr(vb, ctypes.c_uint8), _ptr(offsets, ctypes.c_int64),
        _ptr(scores, ctypes.c_float),
        _ptr(flags, ctypes.c_uint8), len(tokens),
        _ptr(out, ctypes.c_int32), out.size,
    )
    return out[:n].tolist()
