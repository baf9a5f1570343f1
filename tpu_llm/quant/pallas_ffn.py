"""Fused SwiGLU FFN megakernel: h13 = x @ w13; g = silu(gate)·up;
out = g @ w2 — ONE pallas call per layer instead of two matmul kernels
plus XLA glue.

Why it was built: an early xprof reading suggested a ~12us serialized
launch floor per pallas call; honest slope timing later showed that
number was tunnel-round-trip bias and per-call overhead is small — the
measured benefit of this fusion is neutral, which is why it stays
opt-in. The intermediate h13/g HBM round-trip it removes is real but
minor at decode shapes.

Structure: one linear grid. Phase A (stepsA = ceil(2F/tnA)) computes
x @ w13 one tnA-column stripe at a time — full-K dot, stripe stored into
a VMEM scratch h13 (B, 2F) f32. On the last A step the gate
silu(h13[:, :F]) * h13[:, F:] is materialized into a bf16 scratch. Phase
B accumulates g @ w2 over kB tiles into the output block per tnB stripe.
Inputs not used by the current phase keep a pinned block index, so
Mosaic skips their re-fetch (no wasted DMA).

bf16 serving numerics (single MXU pass, f32 accumulation), matching the
unfused bf16 path. f32-parity mode falls back to the two-kernel path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llm.quant.qtensor import QTensor


def _dequant_q4_bf16(q, s, tk, tn):
    blocks = q.reshape(tk // 32, 16, tn).astype(jnp.int32)
    lo = (blocks & 0x0F) - 8
    hi = ((blocks >> 4) & 0x0F) - 8
    vals = jnp.concatenate([lo, hi], axis=1).astype(jnp.bfloat16)
    return (vals * s[:, None, :].astype(jnp.bfloat16)).reshape(tk, tn)


def _dequant_q8_bf16(q, s, tk, tn):
    vals = q.reshape(tk // 32, 32, tn).astype(jnp.bfloat16)
    return (vals * s[:, None, :].astype(jnp.bfloat16)).reshape(tk, tn)


def _ffn_kernel(x_ref, q13_ref, s13_ref, q2_ref, s2_ref, o_ref,
                h13_ref, g_ref, *, E, F, tnA, tkB, tnB,
                steps_a, kb_steps, kind):
    t = pl.program_id(0)
    dequant = _dequant_q4_bf16 if kind == "q4_0" else _dequant_q8_bf16

    @pl.when(t < steps_a)
    def _phase_a():
        w = dequant(q13_ref[:], s13_ref[:], E, tnA)          # (E, tnA) bf16
        h = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
        h13_ref[:, pl.ds(t * tnA, tnA)] = h

    @pl.when(t == steps_a - 1)
    def _gate():
        a = h13_ref[:, :F]
        b = h13_ref[:, F:]
        g_ref[:] = (a * jax.nn.sigmoid(a) * b).astype(jnp.bfloat16)

    @pl.when(t >= steps_a)
    def _phase_b():
        j = t - steps_a
        kb = jax.lax.rem(j, kb_steps)
        w2 = dequant(q2_ref[:], s2_ref[:], tkB, tnB)         # (tkB, tnB)
        xg = g_ref[:, pl.ds(kb * tkB, tkB)]
        acc = jnp.dot(xg, w2, preferred_element_type=jnp.float32)

        @pl.when(kb == 0)
        def _():
            o_ref[:] = acc

        @pl.when(kb > 0)
        def _():
            o_ref[:] = o_ref[:] + acc


def ffn_tiles_ok(E: int, F: int, w13: QTensor, w2: QTensor) -> bool:
    """Megakernel preconditions: q4_0/q8_0, 2F stripeable by 1024 or 512,
    F splittable into 256-multiple kB tiles, e.g. TinyLlama E2048/F5632."""
    if not isinstance(w13, QTensor) or not isinstance(w2, QTensor):
        return False
    if w13.kind != w2.kind or w13.kind not in ("q4_0", "q8_0"):
        return False
    if w13.scales.dtype == jnp.int16 or w2.scales.dtype == jnp.int16:
        return False  # f16-bit scale planes: this kernel predates them
    if w13.q.ndim != 2 or w2.q.ndim != 2:
        return False
    return _ffn_tiles(E, F) is not None


def _ffn_tiles(E: int, F: int):
    tnA = next((t for t in (1024, 512) if (2 * F) % t == 0), None)
    tnB = next((t for t in (1024, 512) if E % t == 0), None)
    # largest 256-multiple divisor of F with a <=4MB bf16 dequant tile
    tkB = None
    for cand in range(min(F, 4096), 0, -256):
        if F % cand == 0 and cand * (tnB or 0) * 2 <= 4 * 1024 * 1024:
            tkB = cand
            break
    if tnA is None or tnB is None or tkB is None:
        return None
    if E % 256 or E * tnA * 2 > 4 * 1024 * 1024:
        return None
    return tnA, tkB, tnB


def ffn_fused_pallas(
    x: jax.Array,         # (..., E) bf16 activations
    w13: QTensor,         # (E, 2F) packed, gate|up
    w2: QTensor,          # (F, E) packed
    *,
    interpret: bool = False,
) -> jax.Array:
    """silu-gated FFN in one kernel. Returns (..., E) in x.dtype."""
    *lead, E = x.shape
    F2 = w13.shape[-1]
    F = F2 // 2
    assert w2.shape == (F, E), (w2.shape, F, E)
    tiles = _ffn_tiles(E, F)
    assert tiles is not None, (E, F)
    tnA, tkB, tnB = tiles
    steps_a = F2 // tnA
    kb_steps = F // tkB
    steps_b = (E // tnB) * kb_steps

    rows = 1
    for d in lead:
        rows *= d
    assert rows <= 8, f"megakernel is the decode path; rows={rows} > 8"
    x2 = x.reshape(rows, E).astype(jnp.bfloat16)
    B = 8  # sublane quantum; ragged rows masked by Pallas

    div = 2 if w13.kind == "q4_0" else 1

    def ix_x(t):
        return (0, 0)

    def ix_w13(t):
        return (0, jnp.minimum(t, steps_a - 1))

    def ix_w2(t):
        j = jnp.maximum(t - steps_a, 0)
        return (jax.lax.rem(j, kb_steps), j // kb_steps)

    def ix_out(t):
        j = jnp.maximum(t - steps_a, 0)
        return (0, j // kb_steps)

    out = pl.pallas_call(
        functools.partial(
            _ffn_kernel, E=E, F=F, tnA=tnA, tkB=tkB, tnB=tnB,
            steps_a=steps_a, kb_steps=kb_steps, kind=w13.kind,
        ),
        grid=(steps_a + steps_b,),
        out_shape=jax.ShapeDtypeStruct((rows, E), jnp.float32),
        in_specs=[
            pl.BlockSpec((B, E), ix_x, memory_space=pltpu.VMEM),
            pl.BlockSpec((E // div, tnA), ix_w13, memory_space=pltpu.VMEM),
            pl.BlockSpec((E // 32, tnA), ix_w13, memory_space=pltpu.VMEM),
            pl.BlockSpec((tkB // div, tnB), ix_w2, memory_space=pltpu.VMEM),
            pl.BlockSpec((tkB // 32, tnB), ix_w2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tnB), ix_out, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, F2), jnp.float32),       # h13
            pltpu.VMEM((B, F), jnp.bfloat16),       # gated
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(x2, w13.q, w13.scales, w2.q, w2.scales)

    return out.reshape(*lead, E).astype(x.dtype)
