"""Fused dequant-matmul Pallas TPU kernels for block-quantized weights.

This is the TPU-native answer to the reference's native layer (SURVEY.md
§2.2): where llm.f90's four_bit_dev/optimize16 branches call C SIMD dot
routines per output element, here a single kernel streams the PACKED Q4_0
weight through VMEM, dequantizes in-register (nibble unpack + per-block
scale), and feeds the MXU — HBM traffic is 4.5 bits/weight, which sets the
decode speed-of-light.

Kernel structure (x: (B, K) @ W: (K, N) -> (B, N)):
- grid (B/TB, N/TN, K/TK), K innermost so each output tile accumulates in
  VMEM across K steps (zero-init at k==0); no HBM round-trips for partials.
- q4_0 tile unpack: (TK/2, TN) uint8 -> view (TK/32, 16, TN) -> lo/hi
  nibbles concat on the middle (sublane) axis -> (TK, TN); the block-local
  layout (see qtensor.py) makes this a reshape+concat, never an interleave.
- scales tile (TK/32, TN) broadcasts across the 32-element block axis.
- dequant arithmetic in ``acc_dtype`` (float32 default: exact q4 values and
  f16-origin scales; bandwidth-bound decode loses nothing to f32 MXU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llm.quant.qtensor import QTensor


def _pick_tile(dim: int, candidates) -> Optional[int]:
    for c in candidates:
        if dim % c == 0:
            return c
    return None


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref, *, tk: int, tn: int, kind: str, acc_dtype):
    k_step = pl.program_id(2)
    if kind == "q4_0":
        # nibble math in int32: Mosaic has no int8 vector sub/shift
        blocks = q_ref[:].reshape(tk // 32, 16, tn).astype(jnp.int32)
        lo = (blocks & 0x0F) - 8
        hi = ((blocks >> 4) & 0x0F) - 8
        vals = jnp.concatenate([lo, hi], axis=1).astype(acc_dtype)
    else:  # q8_0
        vals = q_ref[:].reshape(tk // 32, 32, tn).astype(acc_dtype)
    w = (vals * s_ref[:][:, None, :].astype(acc_dtype)).reshape(tk, tn)
    # HIGHEST so f32 dequantized values aren't silently rounded to bf16 in
    # the MXU (parity with the reference's exact-f32 dot products); the
    # decode matvec is HBM-bound, so the extra MXU passes are free.
    precision = (
        jax.lax.Precision.HIGHEST if acc_dtype == jnp.float32 else None
    )
    acc = jnp.dot(
        x_ref[:].astype(acc_dtype), w,
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = acc

    @pl.when(k_step > 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def _pick_tiles(K: int, N: int):
    """Tiles that divide the problem and keep the dequantized f32 tile at
    ~1MB of VMEM. Tuned on v5e (experiments/q4_kernel_tiles2.py): with
    parallel/arbitrary dimension semantics the read floor is ~520-536 GB/s
    and tk256/tn1024 hits 520 GB/s effective at HIGHEST precision (vs
    173 GB/s for the old tk512/tn256 without semantics); wider tn = wider
    HBM bursts of the row-major (K/2, N) packed plane."""
    tn = _pick_tile(N, (1024, 512, 256, 128))
    if tn is None:
        return None, None
    budget = 1024 * 1024  # dequantized f32 tile bytes
    for tk_cand in (2048, 1024, 512, 256, 128, 64, 32):
        if K % tk_cand == 0 and tk_cand * tn * 4 <= budget:
            return tk_cand, tn
    return None, tn


def pallas_tiles_ok(qt: QTensor) -> bool:
    if qt.q.ndim != 2:
        return False
    K, N = qt.shape[-2], qt.shape[-1]
    tk, tn = _pick_tiles(K, N)
    return tk is not None and tn is not None


def qmatmul_pallas(
    x: jax.Array,
    qt: QTensor,
    *,
    acc_dtype=jnp.float32,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """x: (..., K) @ QTensor (K, N) -> (..., N)."""
    *lead, K = x.shape
    Kq, N = qt.shape[-2], qt.shape[-1]
    assert K == Kq, (x.shape, qt.shape)
    out_dtype = out_dtype or x.dtype

    rows = 1
    for d in lead:
        rows *= d
    x2 = x.reshape(rows, K)
    # Partial blocks: rows need NOT be a multiple of tb — Pallas masks the
    # ragged edge. Padding x on the host path instead costs ~34us per call
    # (experiments/q4_wrapper_delta.py), 2.4x the whole kernel.
    tk, tn = _pick_tiles(K, N)
    tb = min(256, -(-rows // 8) * 8)
    if tn is None or tk is None:
        raise ValueError(f"shapes do not tile: K={K} N={N}")
    qrow = tk // 2 if qt.kind == "q4_0" else tk

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, tk=tk, tn=tn, kind=qt.kind, acc_dtype=acc_dtype),
        grid=(-(-rows // tb), N // tn, K // tk),
        out_shape=jax.ShapeDtypeStruct((rows, N), jnp.float32),
        in_specs=[
            pl.BlockSpec((tb, tk), lambda b, n, k: (b, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((qrow, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 32, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda b, n, k: (b, n), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * K * N,
            bytes_accessed=qt.q.size + qt.scales.size * 4 + rows * (K + N) * 4,
            transcendentals=0,
        ),
        # b/n blocks are independent; only k accumulates. Telling Mosaic so
        # is worth ~3x: it overlaps the next tile's DMA with compute.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(x2, qt.q, qt.scales)

    return out.reshape(*lead, N).astype(out_dtype)
