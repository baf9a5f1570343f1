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
import os
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


def _scale_f32(s_ref) -> jax.Array:
    if s_ref.dtype == jnp.int16:
        # f16 scale BITS (pack_scales_f16): exact half->float rebuild —
        # Mosaic has no f16 type. Shift exponent+mantissa into f32
        # position and fix the bias with one float multiply by 2^112
        # (handles subnormal f16 scales exactly: they land in f32
        # normal/subnormal range and scale through the multiply).
        h = s_ref[:].astype(jnp.int32)
        bits = ((h & 0x7FFF) << 13) | ((h & 0x8000) << 16)
        return jax.lax.bitcast_convert_type(bits, jnp.float32) * jnp.float32(
            2.0 ** 112
        )
    # f32 scales: no-op. bf16 scales (pack_scales_bf16): one cheap
    # upcast on the (tk/block, tn) plane — <= 1/16 of the weight values.
    return s_ref[:].astype(jnp.float32)


def _qmm_kernel(x_ref, q_ref, s_ref, *rest, tk: int, tn: int, kind: str,
                acc_dtype, mins_mxu: bool = True, has_mins: bool = False,
                has_row_scale: bool = False):
    # rest = ([m_ref], [rs_ref], o_ref) by the has_* flags
    idx = 0
    m_ref = rest[idx] if has_mins else None
    idx += 1 if has_mins else 0
    rs_ref = rest[idx] if has_row_scale else None
    o_ref = rest[-1]
    k_step = pl.program_id(2)
    if kind == "q4_0":
        # nibble math in int32: Mosaic has no int8 vector sub/shift
        blocks = q_ref[:].reshape(tk // 32, 16, tn).astype(jnp.int32)
        lo = (blocks & 0x0F) - 8
        hi = ((blocks >> 4) & 0x0F) - 8
        vals = jnp.concatenate([lo, hi], axis=1).reshape(tk, tn)
    elif kind in ("q4_1", "q2_kp"):
        # unsigned nibbles: q4_1 (and loaded-as-q4_1 q4_K) [0,15] affine;
        # packed q2_K [0,3] affine (per-16 planes)
        blocks = q_ref[:].reshape(tk // 32, 16, tn).astype(jnp.int32)
        vals = jnp.concatenate(
            [blocks & 0x0F, (blocks >> 4) & 0x0F], axis=1).reshape(tk, tn)
    elif kind == "q3_kp":
        # packed q3_K stores u = q+4 in [0, 7]; recenter IN the unpack
        # like q4_0's -8 — the in-unpack VPU subtract is free at full
        # bandwidth (r5: the MXU-deferred variant measured 579 tok/s vs
        # the int8 plane's 598 — the per-16 block-sum matmuls and their
        # VMEM-stack indicator mats ate the entire byte saving)
        blocks = q_ref[:].reshape(tk // 32, 16, tn).astype(jnp.int32)
        lo = (blocks & 0x0F) - 4
        hi = ((blocks >> 4) & 0x0F) - 4
        vals = jnp.concatenate([lo, hi], axis=1).reshape(tk, tn)
    elif kind == "q6_kp":
        # true 6-bit q6_K (pack_q6_k): ql nibbles like q4_0 plus a 2-bit
        # qh plane riding the mins operand; value = (lo | hi<<4) - 32.
        # The -32 recentering is NOT subtracted here — it rides the MXU
        # as an affine correction with m = -32*s (no extra operand).
        blocks = q_ref[:].reshape(tk // 32, 16, tn).astype(jnp.int32)
        lo = jnp.concatenate([blocks & 0x0F, (blocks >> 4) & 0x0F], axis=1)
        hb = m_ref[:].reshape(tk // 32, 8, tn).astype(jnp.int32)
        hi = jnp.concatenate(
            [hb & 3, (hb >> 2) & 3, (hb >> 4) & 3, (hb >> 6) & 3], axis=1)
        vals = (lo | (hi << 4)).reshape(tk, tn)   # unsigned [0, 63]
        m_ref = None                      # consumed; NOT an affine plane
    else:  # int8/int4 value planes in natural order, hardware widening
        vals = q_ref[:]
    # Dequant stays 2D the whole way (the 3D reshape-broadcast multiply
    # cost a sublane relayout per tile — 35.6 -> 18.9 us on the w13 shape,
    # experiments/q4_vpu_variants.py): expand scales with a sublane repeat
    # and multiply in f32.
    nb = s_ref.shape[0]
    # (An all-bf16 dequant chain for bf16 scale planes — no 16->32
    # upcast relayout — was tried and measured CATASTROPHIC at 7B:
    # 150.4 -> 103.0 tok/s; bf16 VPU elementwise work is far slower
    # than the f32 chain plus its relayout. r4 scales A/B trail.)
    if os.environ.get("TPU_LLM_SCALE_3D"):
        # A/B: sublane-split broadcast multiply instead of materializing
        # the repeated scale plane (r2 measured the 2D repeat faster for
        # per-32 q4_0; per-16 kinds double the repeat input so re-check)
        w = (vals.reshape(nb, tk // nb, tn).astype(jnp.float32)
             * _scale_f32(s_ref)[:, None, :]).reshape(tk, tn)
    else:
        s = jnp.repeat(_scale_f32(s_ref), tk // nb, axis=0)  # (tk, tn) f32
        w = vals.astype(jnp.float32) * s

    x_in = x_ref[:].astype(jnp.float32)
    if rs_ref is not None:
        # folded norm weight: h = x_normed * w_norm applied HERE, as a
        # (tb, tk) broadcast multiply against the streamed (1, tk) row
        # vector — instead of 2 per-layer f32[E] weight reads outside the
        # kernel that surfaced as ~50 latency-bound VMEM prefetch copies
        # per step (~500us at 7B, experiments/r4_7b_norm_probe.py)
        x_in = x_in * rs_ref[:]

    def _block_sum_dot(plane_f32):
        # Affine work on the MXU instead of a full-tile VPU pass: the
        # contribution sum_k x[k]*p[k//block, n] = (per-block sums of x)
        # @ p — two small matmuls replacing a (tk, tn) broadcast-add
        # (BASELINE r3: scale packing was not the lever; the affine add
        # was). Block sums ride the MXU too, via a 0/1 group-indicator
        # matrix (Mosaic rejects lane-splitting reshapes).
        block = tk // plane_f32.shape[0]
        nbp = plane_f32.shape[0]
        kio = jax.lax.broadcasted_iota(jnp.int32, (tk, nbp), 0)
        gio = jax.lax.broadcasted_iota(jnp.int32, (tk, nbp), 1)
        grp = (kio // block == gio).astype(jnp.float32)
        xg = jax.lax.dot_general(
            x_in, grp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # (tb, nbp)
        return jax.lax.dot_general(
            xg, plane_f32, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    mins_acc = None
    if m_ref is not None and not mins_mxu:
        w = w + jnp.repeat(_scale_f32(m_ref), tk // nb, axis=0)
    elif m_ref is not None:
        mins_acc = _block_sum_dot(_scale_f32(m_ref))
    elif kind == "q6_kp":
        # the deferred -32 recentering: -32 * sum_k x[k] * s[k//16, n]
        mins_acc = _block_sum_dot(_scale_f32(s_ref) * (-32.0))
    if acc_dtype == jnp.float32:
        # f32 mode (reference-parity): HIGHEST so dequantized values
        # aren't silently rounded to bf16 in the MXU — 6 passes, exact.
        acc = jnp.dot(
            x_in, w,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        # bf16 serving mode: hand the MXU f32 operands at DEFAULT
        # precision — it rounds to bf16 on ingest (one pass, f32 accum),
        # so no explicit VPU cast pass over the weight tile is paid.
        # Numerics: round_bf16(q * s_f32) — at least as accurate as the
        # previous q_bf16 * s_bf16.
        acc = jax.lax.dot_general(
            x_in, w,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    if mins_acc is not None:
        acc = acc + mins_acc

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = acc

    @pl.when(k_step > 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def _pick_tiles(K: int, N: int, acc_itemsize: int = 4,  # noqa: ARG001 — unused; kept so older experiment call sites (q4_serial_latency.py et al.) keep working
                *, packed_itemsize: float = 0.5, scale_itemsize: float = 2.0,
                tb: int = 8, x_itemsize: float = 4.0,
                bsum_block: int = 0):
    """Pick (tk, tn): FULL-WIDTH n stripes, LARGEST legal K-tile (plus a
    4096-wide stripe for vocab-sized N).

    Measured on the honest slope-timed decode harness
    (experiments/decode_slope.py — earlier per-call microbenches divided
    a constant ~30ms tunnel round-trip by REPS and mis-ranked policies):
    full-width tiles beat the old min-step (tk<=4096, tn<=1024) policy
    979 vs 868 tok/s on TinyLlama q4_0 batch-1 decode. The serialized
    per-shape sweep (experiments/r2_tile_pipeline.py, on-chip 2026-08-18)
    then showed BIGGER tk monotonically wins — fewer grid steps beat
    deeper k-pipelining at these shapes — and that the old 32MB dequant-
    tile budget was leaving bandwidth on the table: w2 (5632, 2048)
    forced to tk=512 ran at 649 GB/s vs 756 at tk=5632 (46MB tile), and
    w13 (2048, 11264) at tk=1024 hits 823 GB/s vs 786 at tk=512. Tiles
    up to ~46MB compile and stream at full rate on v5e.

    The budget models what actually limits tile size: Mosaic DOUBLE-
    BUFFERS the input tiles, and the scoped VMEM limit is 16MB — so
    2 x (packed weight tile + scales tile) must leave headroom for
    x/out/accumulator. The dequantized f32 (tk, tn) product is NEVER
    materialized (Mosaic fuses the multiply into the MXU feed): 46MB
    "dequant" tiles run fine while a 2x11.2MB double-buffered int8 tile
    OOMs ("Scoped allocation with size 22.41M and limit 16.00M", the
    q8_0 w13 shape at tk=1024). This is why the budget is per-KIND:
    q8_0 packs 1 byte/weight vs q4's 0.5.

    Constraints: tk must divide K (a ragged K-tile would accumulate
    garbage into real outputs) and be a multiple of 256 so the scales
    block (tk/32, tn) keeps a sublane multiple of 8. tn need NOT divide
    N — the ragged last N-tile is masked by Pallas and its garbage
    columns die in the masked store (vital for vocab-sized N = 32000)."""
    budget = 14 * 1024 * 1024   # total double-buffered window bytes
    # against the 16MB scoped VMEM: Mosaic double-buffers EVERY window
    # (packed weights, scales, x, out), so the constraint is
    # 2*(q + scales + x + out). For decode-shaped tb=8 the x/out terms
    # are tiny and this admits exactly the measured-best tiles the old
    # 6.75MB-per-(q+scales)-buffer budget chose (w13 q4+bf16s tk=1024:
    # 13.76MB; q4+f32s tk=1024: 15.2MB rejected -> 512; q8 tk=1024:
    # rejected). NOT raised to admit Llama-2 7B's w13 full-width
    # stripe (512, 22016, 14.1MB): the serialized-chain sweep rated it
    # 810 vs 640 GB/s for the (1024/2048, 4096) fallback, but the FULL
    # MODEL runs the narrow-stripe fallback at ~795 GB/s and got SLOWER
    # with the full-width stripe admitted (153.1 -> 147.5 tok/s) —
    # single-matmul chains under-rate narrow stripes
    # (experiments/r3_7b_tiles.py vs r3_7b_trace.py). For PREFILL
    # (tb=256) the out tile dominates — a
    # full-width w13 stripe is 2x256x11264x4 = 22.5MB of out buffer
    # alone, the exact scoped-VMEM OOM r3 hit at T=2048 — so wide-N
    # shapes drop to narrower stripes (pinned by
    # test_pick_tiles_prefill_shapes).

    def fits(tk, tn, slack=0):
        # bsum_block > 0: the kind runs _block_sum_dot (MXU affine mins /
        # deferred recentering), whose (tk, tk//block) iota/indicator
        # temporaries live on the kernel's VMEM stack — quadratic in tk
        # and NOT double-buffered, so they check against the REAL 16MB
        # scoped limit (minus 0.5M safety), not the 14M window budget
        # (whose 2M implicit margin covered the per-32 mats all along).
        # 7 mats is the empirical fit: per-16 deferred q3_kp at
        # tk=2048/tn=4096 allocated 18.35M vs the model's 10.9M of
        # windows + 7*1.05M of mats = 18.2M; per-32 q4_K's shipped tiles
        # (13.76M windows + 0.9M mats; 10.87M + 3.7M) stayed under 16M.
        windows = 2 * (tk * tn * packed_itemsize
                       + (tk // 32) * tn * scale_itemsize
                       + tb * tk * x_itemsize
                       + tb * tn * 4)
        if bsum_block and windows + 7 * tk * (tk // bsum_block) * 4 \
                > 15.5 * 1024 * 1024:
            return False
        return windows <= budget - slack

    # LARGEST legal K-tile for every kind. The r5 q8_0 serialized-chain
    # sweep (experiments/r5_q8_sweep.py) measured tk=256/512 beating the
    # largest tile on every 1-byte decode shape (wqkv 603 vs 483 GB/s,
    # w2 657 vs 555, wcls 737 vs 723) — but the FULL MODEL with that
    # policy dropped 610 -> 529 tok/s: serialized single-matmul chains
    # cannot see the cross-call overlap the real step already gets from
    # adjacent kernels' DMA, the same trap that mis-rated narrow stripes
    # at 7B in r3 (r3_7b_tiles.py vs r3_7b_trace.py). TPU_LLM_MIN_KSTEPS
    # remains as the probe knob that produced the A/B.
    min_steps = int(os.environ.get("TPU_LLM_MIN_KSTEPS", "0"))

    def best_tk(width, slack=0):
        cands = [t for t in range(256, K + 1, 256)
                 if K % t == 0 and fits(t, width, slack)]
        if not cands:
            return None
        if min_steps > 1:
            small = [t for t in cands if K // t >= min_steps]
            if small:
                return max(small)
        return max(cands)

    def best_pair(widths, slack=0):
        # largest tk first, then the wider stripe
        pairs = [(best_tk(tn, slack), tn) for tn in widths if tn <= N]
        pairs = [(tk, tn) for tk, tn in pairs if tk is not None]
        return max(pairs) if pairs else None

    if N > 16384:  # vocab-sized: full width would blow the tile budget
        # prefer the largest tk, then the wider stripe: q4 gets
        # (2048, 4096) — 719 GB/s vs 699 at tn=2048 (r2_tile_pipeline) —
        # q8's bigger tiles get (2048, 2048). 3MB slack: Mosaic's real
        # scoped usage on single-k-step vocab stripes runs ~2.8MB above
        # the window model (phi-2's (2560, 4096) classifier tile modeled
        # 13.5MB but OOM'd at 16.32M); TinyLlama's pinned wcls tiles
        # model <= 10.9MB and keep their choices.
        pair = best_pair((4096, 2048), slack=3 * 1024 * 1024)
        if pair:
            return pair
    tk = best_tk(N)
    if tk is not None:
        return tk, N
    # full width does not fit (big tb — prefill rows): narrower stripes
    pair = best_pair((4096, 2048, 1024, 512))
    if pair:
        return pair
    # K has no 256-multiple divisor: small tk (scales block keeps legal
    # sublanes only when tk == K, i.e. the block spans the full array dim)
    if N >= 512:
        if K % 32 == 0 and K in (32, 64, 128):
            return K, min(N, 1024)
        return None, None
    tn = _pick_tile(N, (256, 128))
    if tn is None:
        return None, None
    for tk_cand in (2048, 1024, 512, 256, 128, 64, 32):
        if K % tk_cand == 0:
            return tk_cand, tn
    return None, tn


_PALLAS_KINDS = ("q4_0", "q8_0", "q4_0i4", "q4_1", "q5_0", "q5_1",
                 "q2_k", "q2_kp", "q3_k", "q3_kp", "q6_k", "q6_kp")


def _tile_params(qt: QTensor) -> dict:
    """Per-kind byte weights for the VMEM tile budget.

    ``scale_itemsize`` is normalized to bytes-per-32-weights so the
    budget formula's (tk//32) term stays valid for per-16 scale blocks
    (folded q2/q3/q6_K) and for affine kinds' extra mins plane."""
    K = qt.shape[-2]
    block = K // qt.scales.shape[-2]
    planes = 1 if qt.mins is None else 2
    # kinds whose kernel runs _block_sum_dot: affine mins on the MXU
    # (unless the TPU_LLM_MINS_VPU escape hatch is set) or the deferred
    # -32 recentering (q6_kp; q3_kp recenters in the unpack instead)
    bsum = (qt.kind == "q6_kp"
            or (qt.mins is not None
                and not os.environ.get("TPU_LLM_MINS_VPU")))
    return {
        "bsum_block": block if bsum else 0,
        # int4 planes (q4_0i4) stay 2-per-byte in VMEM (E(4) layout).
        # q6_kp: ql is nibble-packed; its qh plane (tk/4 rows of uint8 =
        # 8 bytes per 32 weights) happens to weigh exactly like a second
        # f32 per-16 plane, so the planes=2 scale term models it.
        "packed_itemsize": 0.5 if qt.kind in ("q4_0", "q4_1", "q4_0i4",
                                              "q6_kp", "q2_kp", "q3_kp")
        else 1.0,
        "scale_itemsize": float(jnp.dtype(qt.scales.dtype).itemsize)
        * planes * (32.0 / block),
    }


def pallas_tiles_ok(qt: QTensor, rows: int = 1, x_itemsize: float = 4.0) -> bool:
    """True if the fused kernel can tile this shape.

    ``x_itemsize`` must match the activation dtype the kernel will see —
    the gate and ``qmatmul_pallas`` evaluate the same VMEM budget, so a
    mismatch (e.g. modelling bf16 prefill activations as f32) can gate a
    compilable shape off to the slower XLA dequant path."""
    if qt.kind not in _PALLAS_KINDS:
        return False
    if qt.q.ndim != 2:
        return False
    K, N = qt.shape[-2], qt.shape[-1]
    tk, tn = _pick_tiles(K, N, tb=_row_tile(rows), x_itemsize=x_itemsize,
                         **_tile_params(qt))
    return tk is not None and tn is not None


def _row_tile(rows: int) -> int:
    return min(256, -(-rows // 8) * 8)


def qmatmul_pallas(
    x: jax.Array,
    qt: QTensor,
    *,
    acc_dtype=None,
    out_dtype=None,
    row_scale: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """x: (..., K) @ QTensor (K, N) -> (..., N).

    acc_dtype defaults to the activation dtype's natural mode: bf16
    activations dequantize + dot in bf16 (single MXU pass, f32 accum);
    f32 activations get the exact f32/HIGHEST path (reference parity).

    ``row_scale`` (K,) f32 multiplies x elementwise INSIDE the kernel —
    the folded rmsnorm weight (models/llama._block). It streams as a
    (1, tk) pipelined operand instead of a separate per-layer weight
    read, which at 32-layer scale surfaced as ~50 latency-bound VMEM
    prefetch copies per decode step (experiments/r4_7b_norm_probe.py)."""
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
    tb = _row_tile(rows)
    tk, tn = _pick_tiles(K, N, tb=tb,
                         x_itemsize=float(jnp.dtype(x.dtype).itemsize),
                         **_tile_params(qt))
    if tn is None or tk is None:
        raise ValueError(f"shapes do not tile: K={K} N={N}")
    qrow = (tk // 2 if qt.kind in ("q4_0", "q4_1", "q6_kp", "q2_kp",
                                   "q3_kp") else tk)
    qbytes = qt.q.size // 2 if qt.kind == "q4_0i4" else qt.q.size
    block = K // qt.scales.shape[-2]
    scale_spec = pl.BlockSpec((tk // block, tn), lambda b, n, k: (k, n),
                              memory_space=pltpu.VMEM)
    operands = [x2, qt.q, qt.scales]
    in_specs = [
        pl.BlockSpec((tb, tk), lambda b, n, k: (b, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((qrow, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
        scale_spec,
    ]
    scale_bytes = qt.scales.size * qt.scales.dtype.itemsize
    if qt.mins is not None:
        operands.append(qt.mins)
        if qt.kind == "q6_kp":
            # the qh 2-bit plane (K/4, N) uint8, not a scale-shaped plane
            in_specs.append(pl.BlockSpec((tk // 4, tn), lambda b, n, k: (k, n),
                                         memory_space=pltpu.VMEM))
            scale_bytes += qt.mins.size
        else:
            in_specs.append(scale_spec)
            scale_bytes *= 2
    if row_scale is not None:
        assert row_scale.shape[-1] == K, (row_scale.shape, K)
        operands.append(row_scale.astype(jnp.float32).reshape(1, K))
        in_specs.append(pl.BlockSpec((1, tk), lambda b, n, k: (0, k),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, tk=tk, tn=tn, kind=qt.kind,
                          acc_dtype=acc_dtype,
                          # A/B escape hatch: TPU_LLM_MINS_VPU=1 restores
                          # the broadcast-add affine path
                          mins_mxu=not os.environ.get("TPU_LLM_MINS_VPU"),
                          has_mins=qt.mins is not None,
                          has_row_scale=row_scale is not None),
        grid=(-(-rows // tb), -(-N // tn), K // tk),
        out_shape=jax.ShapeDtypeStruct((rows, N), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, tn), lambda b, n, k: (b, n), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * K * N,
            bytes_accessed=qbytes + scale_bytes + rows * (K + N) * 4,
            transcendentals=0,
        ),
        # b/n blocks are independent; only k accumulates. Telling Mosaic so
        # is worth ~3x: it overlaps the next tile's DMA with compute.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(*operands)

    return out.reshape(*lead, N).astype(out_dtype)
