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
    else:  # q8_0 / q4_0i4: values in natural order, hardware widening
        vals = q_ref[:].reshape(tk // 32, 32, tn).astype(acc_dtype)
    w = (vals * s_ref[:][:, None, :].astype(acc_dtype)).reshape(tk, tn)
    # f32 mode (reference-parity): HIGHEST so dequantized values aren't
    # silently rounded to bf16 in the MXU — 6 passes, but exact.
    # bf16 mode (serving): ONE MXU pass with f32 accumulation — the q4
    # int values are exact in bf16 and activations are already bf16; the
    # 6x HIGHEST pass cost was the decode bottleneck (xprof: w13 42us
    # observed vs 28us DMA floor; MXU time 6 x 12us at 8 padded rows).
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


def _pick_tiles(K: int, N: int, acc_itemsize: int = 4):
    """Pick (tk, tn) to MINIMIZE GRID STEPS under a ~4MB dequantized-tile
    VMEM budget. In the model the kernels are chained (each consumes the
    previous one's output), so cross-call pipelining cannot hide per-step
    sequencing cost (~0.8us/step measured via xprof: a 256-step classifier
    ran at 205us, an 88-step w13 at 68us — both ~0.8us x steps, far above
    their DMA floor). Fewer, bigger steps win; the earlier ~1MB-tile
    choice optimized amortized throughput, the wrong regime.

    Constraints: tk must divide K (a ragged K-tile would accumulate
    garbage into real outputs) and be a multiple of 256 so the scales
    block (tk/32, tn) keeps a sublane multiple of 8. tn need NOT divide
    N — the ragged last N-tile is masked by Pallas and its garbage
    columns die in the masked store (vital for vocab-sized N = 32000)."""
    itemsize = 2 if acc_itemsize == 2 else 4
    budget = 4 * 1024 * 1024  # dequantized-tile VMEM bytes
    if N >= 512:
        best = None
        tks = [tk for tk in range(256, min(K, 4096) + 1, 256) if K % tk == 0]
        if not tks and K % 32 == 0:
            tks = [tk for tk in (32, 64, 128) if K % tk == 0]
        for tn in (512, 1024):
            for tk in tks:
                if tk * tn * itemsize > budget:
                    continue
                steps = -(-N // tn) * (K // tk)
                key = (steps, -(tk * tn))
                if best is None or key < best[0]:
                    best = (key, tk, tn)
        if best is not None:
            return best[1], best[2]
        return None, None
    # narrow outputs (e.g. unfused wk/wv with few kv heads)
    tn = _pick_tile(N, (256, 128))
    if tn is None:
        return None, None
    for tk_cand in (2048, 1024, 512, 256, 128, 64, 32):
        if K % tk_cand == 0 and tk_cand * tn * itemsize <= budget:
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
    acc_dtype=None,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """x: (..., K) @ QTensor (K, N) -> (..., N).

    acc_dtype defaults to the activation dtype's natural mode: bf16
    activations dequantize + dot in bf16 (single MXU pass, f32 accum);
    f32 activations get the exact f32/HIGHEST path (reference parity)."""
    if acc_dtype is None:
        acc_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
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
    tk, tn = _pick_tiles(K, N, acc_itemsize=jnp.dtype(acc_dtype).itemsize)
    tb = min(256, -(-rows // 8) * 8)
    if tn is None or tk is None:
        raise ValueError(f"shapes do not tile: K={K} N={N}")
    qrow = tk // 2 if qt.kind == "q4_0" else tk
    qbytes = qt.q.size // 2 if qt.kind == "q4_0i4" else qt.q.size

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, tk=tk, tn=tn, kind=qt.kind, acc_dtype=acc_dtype),
        grid=(-(-rows // tb), -(-N // tn), K // tk),
        out_shape=jax.ShapeDtypeStruct((rows, N), jnp.float32),
        in_specs=[
            pl.BlockSpec((tb, tk), lambda b, n, k: (b, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((qrow, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 32, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda b, n, k: (b, n), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * K * N,
            bytes_accessed=qbytes + qt.scales.size * 4 + rows * (K + N) * 4,
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
