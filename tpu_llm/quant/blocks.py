"""Host-side (numpy) GGML block-quant formats.

Layouts follow the GGML spec the reference targets (Q4_0 constants
``qk4=32`` at ``load.f90:7-8``; the pack2x4/unpack C helpers it stubs at
``load.f90:136-152``):

- Q4_0: blocks of 32 weights; per block [f16 scale d][16 bytes qs].
  byte j: low nibble = q[j], high nibble = q[j+16]; value = (q - 8) * d.
- Q4_1: [f16 d][f16 m][16 bytes]; value = q * d + m.
- Q5_0: [f16 d][u32 qh][16 bytes qs]; 5th (high) bit of weight j is bit j
  of qh; value = ((q | (bit << 4)) - 16) * d.
- Q5_1: [f16 d][f16 m][u32 qh][16 bytes qs]; value = q5 * d + m.
- Q8_0: [f16 d][32 int8]; value = q * d.

These run at load/convert time only; on-device dequant is fused into the
Pallas matmul kernels (tpu_llm/quant/pallas_matmul.py).
"""

from __future__ import annotations

import numpy as np

QK4_0 = 32
QK4_1 = 32
QK5_0 = 32
QK5_1 = 32
QK8_0 = 32

# bytes per block
Q4_0_BLOCK_BYTES = 2 + 16
Q4_1_BLOCK_BYTES = 4 + 16
Q5_0_BLOCK_BYTES = 2 + 4 + 16
Q5_1_BLOCK_BYTES = 4 + 4 + 16
Q8_0_BLOCK_BYTES = 2 + 32


def quantize_q4_0(x: np.ndarray) -> bytes:
    """Quantize a flat f32 array (len % 32 == 0) to GGML Q4_0 bytes."""
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1, QK4_0)
    amax_idx = np.argmax(np.abs(x), axis=1)
    maxv = x[np.arange(x.shape[0]), amax_idx]  # signed value of abs-max (ggml convention)
    d = maxv / -8.0
    inv_d = np.where(d != 0.0, 1.0 / np.where(d == 0.0, 1.0, d), 0.0)
    q = np.clip((x * inv_d[:, None]) + 8.5, 0.0, 15.0).astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    packed = (lo | (hi << 4)).astype(np.uint8)
    out = np.empty((x.shape[0], Q4_0_BLOCK_BYTES), dtype=np.uint8)
    out[:, :2] = d.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 2:] = packed
    return out.tobytes()


def dequantize_q4_0(buf: bytes | np.ndarray, n: int) -> np.ndarray:
    """Dequantize GGML Q4_0 bytes to a flat f32 array of length n."""
    raw = np.frombuffer(buf, dtype=np.uint8).reshape(-1, Q4_0_BLOCK_BYTES)
    assert raw.shape[0] * QK4_0 == n, (raw.shape, n)
    d = raw[:, :2].copy().view(np.float16).astype(np.float32)  # (nb, 1)
    qs = raw[:, 2:]
    lo = (qs & 0x0F).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    q = np.concatenate([lo, hi], axis=1).astype(np.float32)  # (nb, 32)
    return (q * d).reshape(-1)


def quantize_q4_1(x: np.ndarray) -> bytes:
    """Quantize a flat f32 array (len % 32 == 0) to GGML Q4_1 bytes
    (affine: value = d*q + m, q in [0, 15], d = (max-min)/15, m = min)."""
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1, QK4_1)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    d = (mx - mn) / 15.0
    inv_d = np.where(d != 0.0, 1.0 / np.where(d == 0.0, 1.0, d), 0.0)
    q = np.clip(np.round((x - mn[:, None]) * inv_d[:, None]), 0.0, 15.0)
    q = q.astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    out = np.empty((x.shape[0], Q4_1_BLOCK_BYTES), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = mn.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 4:] = (lo | (hi << 4)).astype(np.uint8)
    return out.tobytes()


def dequantize_q4_1(buf: bytes | np.ndarray, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, dtype=np.uint8).reshape(-1, Q4_1_BLOCK_BYTES)
    assert raw.shape[0] * QK4_1 == n
    d = raw[:, 0:2].copy().view(np.float16).astype(np.float32)
    m = raw[:, 2:4].copy().view(np.float16).astype(np.float32)
    qs = raw[:, 4:]
    lo = (qs & 0x0F).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    q = np.concatenate([lo, hi], axis=1)
    return (q * d + m).reshape(-1)


def _split_qh(qh_bytes: np.ndarray) -> np.ndarray:
    """(nb, 4) u8 high-bit words -> (nb, 32) 0/1 high bits (bit j of qh)."""
    qh = qh_bytes.copy().view(np.uint32).reshape(-1, 1)
    return ((qh >> np.arange(32, dtype=np.uint32)[None, :]) & 1).astype(np.uint8)


def _pack_qh(hi_bits: np.ndarray) -> np.ndarray:
    """(nb, 32) 0/1 high bits -> (nb, 4) u8 packed words."""
    qh = (hi_bits.astype(np.uint32)
          << np.arange(32, dtype=np.uint32)[None, :]).sum(axis=1, dtype=np.uint32)
    return qh.view(np.uint8).reshape(-1, 4)


def quantize_q5_0(x: np.ndarray) -> bytes:
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1, QK5_0)
    amax_idx = np.argmax(np.abs(x), axis=1)
    maxv = x[np.arange(x.shape[0]), amax_idx]
    d = maxv / -16.0
    inv_d = np.where(d != 0.0, 1.0 / np.where(d == 0.0, 1.0, d), 0.0)
    q = np.clip((x * inv_d[:, None]) + 16.5, 0.0, 31.0).astype(np.uint8)
    lo4, hi4 = q[:, :16] & 0x0F, q[:, 16:] & 0x0F
    out = np.empty((x.shape[0], Q5_0_BLOCK_BYTES), dtype=np.uint8)
    out[:, :2] = d.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 2:6] = _pack_qh(q >> 4)
    out[:, 6:] = lo4 | (hi4 << 4)
    return out.tobytes()


def dequantize_q5_0(buf: bytes | np.ndarray, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, dtype=np.uint8).reshape(-1, Q5_0_BLOCK_BYTES)
    assert raw.shape[0] * QK5_0 == n, (raw.shape, n)
    d = raw[:, :2].copy().view(np.float16).astype(np.float32)
    hi_bit = _split_qh(raw[:, 2:6])
    qs = raw[:, 6:]
    lo = (qs & 0x0F).astype(np.int16)
    hi = (qs >> 4).astype(np.int16)
    q4 = np.concatenate([lo, hi], axis=1)
    q = (q4 | (hi_bit.astype(np.int16) << 4)) - 16
    return (q.astype(np.float32) * d).reshape(-1)


def quantize_q5_1(x: np.ndarray) -> bytes:
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1, QK5_1)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    d = (mx - mn) / 31.0
    inv_d = np.where(d != 0.0, 1.0 / np.where(d == 0.0, 1.0, d), 0.0)
    q = np.clip((x - mn[:, None]) * inv_d[:, None] + 0.5, 0.0, 31.0).astype(np.uint8)
    out = np.empty((x.shape[0], Q5_1_BLOCK_BYTES), dtype=np.uint8)
    out[:, 0:2] = d.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 2:4] = mn.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 4:8] = _pack_qh(q >> 4)
    out[:, 8:] = (q[:, :16] & 0x0F) | ((q[:, 16:] & 0x0F) << 4)
    return out.tobytes()


def dequantize_q5_1(buf: bytes | np.ndarray, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, dtype=np.uint8).reshape(-1, Q5_1_BLOCK_BYTES)
    assert raw.shape[0] * QK5_1 == n, (raw.shape, n)
    d = raw[:, 0:2].copy().view(np.float16).astype(np.float32)
    m = raw[:, 2:4].copy().view(np.float16).astype(np.float32)
    hi_bit = _split_qh(raw[:, 4:8])
    qs = raw[:, 8:]
    lo = (qs & 0x0F).astype(np.uint16)
    hi = (qs >> 4).astype(np.uint16)
    q4 = np.concatenate([lo, hi], axis=1)
    q = q4 | (hi_bit.astype(np.uint16) << 4)
    return (q.astype(np.float32) * d + m).reshape(-1)


def quantize_q8_0(x: np.ndarray) -> bytes:
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1, QK8_0)
    amax = np.max(np.abs(x), axis=1)
    d = amax / 127.0
    inv_d = np.where(d != 0.0, 1.0 / np.where(d == 0.0, 1.0, d), 0.0)
    q = np.round(x * inv_d[:, None]).astype(np.int8)
    out = np.empty((x.shape[0], Q8_0_BLOCK_BYTES), dtype=np.uint8)
    out[:, :2] = d.astype(np.float16).view(np.uint8).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.tobytes()


def dequantize_q8_0(buf: bytes | np.ndarray, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, dtype=np.uint8).reshape(-1, Q8_0_BLOCK_BYTES)
    assert raw.shape[0] * QK8_0 == n
    d = raw[:, :2].copy().view(np.float16).astype(np.float32)
    q = raw[:, 2:].view(np.int8).astype(np.float32)
    return (q * d).reshape(-1)
