"""Grid-step pipelining sweep on the PRODUCTION decode shapes/kinds.

Hypothesis: the shipped _pick_tiles policy gives wqkv (2048x2560) and wo
(2048x2048) a SINGLE grid step (tk=K, tn=N), so Mosaic cannot overlap the
weight-tile DMA with the dequant+dot compute — the whole tile DMA is
exposed. Splitting K into 2-8 grid steps (tk 1024/512/256, tn still full
width) lets the k+1 tile's DMA ride under the k tile's compute. Per-layer
exposure estimate ~4-6us across wqkv+wo -> ~90-130us/step at 22 layers.

Production config: q4_0i4 QTensor (int4 planes) + bf16 scale planes,
bf16 activations (1, K), DEFAULT-precision dot — exactly what the bench
decode runs after unpack_params_int4(pack_scales="bf16").

Serialized chain (each call consumes the previous output) so cross-call
pipelining can't hide per-call latency; fori_loop with a traced bound so
both slope lengths share one executable; slope timing cancels the
tunnel's ~30ms round trip.

Writes JSON lines to /tmp/r2_tiles.jsonl as results land.
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

from tpu_llm.quant.pallas_matmul import _qmm_kernel
from tpu_llm.quant.qtensor import (pack_scales_bf16, quantize_tensor,
                                   to_int4)
from tpu_llm.runtime.timing import slope_time_s

OUT = open("/tmp/r2_tiles.jsonl", "a")
T0 = time.time()


def emit(**row):
    row["t"] = round(time.time() - T0, 1)
    print(json.dumps(row), flush=True)
    OUT.write(json.dumps(row) + "\n")
    OUT.flush()


def qcall(x, q, s, K, N, tk, tn):
    """Direct pallas_call with the production kernel at a forced tile."""
    rows = x.shape[0]
    tb = min(256, -(-rows // 8) * 8)
    return pl.pallas_call(
        functools.partial(_qmm_kernel, tk=tk, tn=tn, kind="q4_0i4",
                          acc_dtype=jnp.bfloat16),
        grid=(-(-rows // tb), -(-N // tn), K // tk),
        out_shape=jax.ShapeDtypeStruct((rows, N), jnp.float32),
        in_specs=[
            pl.BlockSpec((tb, tk), lambda b, n, k: (b, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda b, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 32, tn), lambda b, n, k: (k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda b, n, k: (b, n),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(x, q, s)


def sweep(K, N, tks, label, chain=4096):
    # slope_time_s already returns per-ITERATION seconds (one qcall);
    # chain=4096 with a 5x upper length gives a >=40ms device-time delta
    # per pair — tunnel jitter is ~1-2ms, so the error stays <5% (the
    # first two attempts measured noise: chain=24 gave negative slopes,
    # chain=512 gave above-HBM-spec bandwidths)
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N), np.float32) * 0.02
    # int4 cannot cross a jit boundary on the axon backend — pass the
    # packed uint8 q4_0 QTensor in and convert INSIDE jit (XLA hoists
    # the conversion out of the fori loop; slope timing cancels it),
    # exactly like production's unpack_params_int4-inside-decode_n.
    qt0 = quantize_tensor(w, "q4_0")
    q, s = jax.device_put(qt0.q), jax.device_put(qt0.scales)
    x0 = jnp.full((1, K), 0.01, jnp.bfloat16)
    qbytes = K * N // 2 + (K // 32) * N * 2

    for tile in tks:
        tk, tn = tile if isinstance(tile, tuple) else (tile, N)
        if K % tk or (tk // 32) % 8:
            continue

        @jax.jit
        def loop(x, q, s, n, tk=tk, tn=tn):
            from tpu_llm.quant.qtensor import QTensor

            qt = pack_scales_bf16(to_int4(QTensor(q, s, "q4_0")))
            qi, si = qt.q, qt.scales

            def body(_, c):
                o = qcall(c, qi, si, K, N, tk, tn)
                # fold (1, N) back to (1, K): bounded, data-dependent
                o = jnp.tanh(o[:, : min(N, K)]).astype(jnp.bfloat16)
                pad = K - o.shape[1]
                if pad > 0:
                    o = jnp.concatenate(
                        [o, jnp.broadcast_to(o[:, :1], (1, pad))], axis=1)
                return o * 0.5 + x * 0.5
            return jax.lax.fori_loop(0, n, body, x)

        def make(n):
            nd = jnp.int32(n)

            def thunk():
                got = loop(x0, q, s, nd)
                np.asarray(jax.device_get(got[0, 0]))

            return thunk

        try:
            dt = slope_time_s(make, chain, chain * 5)
            emit(shape=label, K=K, N=N, tk=tk, tn=tn, ksteps=K // tk,
                 us=round(dt * 1e6, 2), gbs=round(qbytes / dt / 1e9, 1))
        except Exception as e:
            emit(shape=label, tk=tk, err=str(e)[:160])


def main():
    # Round A (measured 2026-08-18, /tmp/r2_tiles.jsonl): BIGGER tk wins
    # everywhere — the grid-pipelining hypothesis was wrong; single-step
    # kernels still stream at 744-750 GB/s. Shipped policy confirmed for
    # wqkv (750), wo (744), w13 (786). w2 lags at 641 GB/s because
    # _pick_tiles candidates miss tk=2816 (= 11*256: divides 5632, keeps
    # the scales block sublane-aligned).
    # Round B: w2 big-tk variants, tn splits on the 1-step shapes, and
    # the wcls classifier shape (absent from round A).
    sweep(5632, 2048, [2816, (2816, 1024), 5632, 512], "w2")
    sweep(2048, 2560, [(2048, 1280), 2048], "wqkv")
    sweep(2048, 2048, [(2048, 1024), 2048], "wo")
    sweep(2048, 11264, [(1024, 11264), (2048, 5632), (1024, 5632),
                        (512, 11264)], "w13")
    sweep(2048, 32000, [(2048, 2048), (2048, 4096), (1024, 4096),
                        (2048, 1024)], "wcls")
    emit(stage="DONE")


if __name__ == "__main__":
    main()
