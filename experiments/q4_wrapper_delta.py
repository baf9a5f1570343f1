"""Pinpoint the gap between the raw pallas kernel (13.9us for 2048x5632)
and the production matmul wrapper (48us): pad? slice? cost_estimate?
x rank? Measure each variant in the same scan harness."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llm.quant.qtensor import quantize_tensor
from tpu_llm.quant.pallas_matmul import qmatmul_pallas, _qmm_kernel, _pick_tiles

K, N = 2048, 5632
REPS = 2000


def raw_call(x, qt, tk, tn, cost, sem):
    qrow = tk // 2
    kw = {}
    if cost:
        kw["cost_estimate"] = pl.CostEstimate(
            flops=2 * x.shape[0] * K * N,
            bytes_accessed=qt.q.size + qt.scales.size * 4,
            transcendentals=0,
        )
    if sem:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    return pl.pallas_call(
        functools.partial(_qmm_kernel, tk=tk, tn=tn, kind="q4_0",
                          acc_dtype=jnp.float32),
        grid=(x.shape[0] // 8, N // tn, K // tk),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], N), jnp.float32),
        in_specs=[
            pl.BlockSpec((8, tk), lambda b, n, k: (b, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((qrow, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 32, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tn), lambda b, n, k: (b, n), memory_space=pltpu.VMEM),
        **kw,
    )(x, qt.q, qt.scales)


def bench(label, fn, x, qt, reps=REPS):
    @jax.jit
    def loop(x0):
        def body(c, _):
            o = fn(x0, qt)
            return c + o[0, :1] * 1e-9, None
        return jax.lax.scan(body, jnp.zeros((1,), jnp.float32), None, length=reps)[0]

    _ = np.asarray(loop(x))
    t0 = time.perf_counter()
    _ = np.asarray(loop(x))
    dt = (time.perf_counter() - t0) / reps
    qbytes = qt.q.size + qt.scales.size * 4
    print(f"{label:40s}: {dt*1e6:7.1f} us, {qbytes/dt/1e9:5.0f} GB/s", flush=True)


def main():
    rng = np.random.default_rng(0)
    qt = quantize_tensor(rng.standard_normal((K, N)).astype(np.float32) * 0.05)
    x1 = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    x8 = jnp.asarray(rng.standard_normal((8, K)).astype(np.float32))
    tk, tn = _pick_tiles(K, N)
    print(f"picked tiles tk={tk} tn={tn}")

    bench("production qmatmul x(1,K)", lambda x, q: qmatmul_pallas(x, q), x1, qt)
    bench("production qmatmul x(8,K)", lambda x, q: qmatmul_pallas(x, q), x8, qt)
    bench("raw x8 cost+sem", lambda x, q: raw_call(x, q, tk, tn, True, True), x8, qt)
    bench("raw x8 sem only", lambda x, q: raw_call(x, q, tk, tn, False, True), x8, qt)
    bench("raw x8 cost only", lambda x, q: raw_call(x, q, tk, tn, True, False), x8, qt)
    bench("raw x8 neither", lambda x, q: raw_call(x, q, tk, tn, False, False), x8, qt)
    bench("raw x1 padded inline",
          lambda x, q: raw_call(jnp.pad(x, ((0, 7), (0, 0))), q, tk, tn, False, True)[:1],
          x1, qt)
    for tk2, tn2 in [(256, 1024), (512, 512), (1024, 512)]:
        if K % tk2 == 0 and N % tn2 == 0:
            bench(f"raw x8 sem tk{tk2}/tn{tn2}",
                  lambda x, q, a=tk2, b=tn2: raw_call(x, q, a, b, False, True), x8, qt)


if __name__ == "__main__":
    main()
