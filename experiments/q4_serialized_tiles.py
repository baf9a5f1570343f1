"""Tile sweep under SERIALIZED dependency (each call consumes the previous
call's output), matching the model's layer chain — amortized-throughput
sweeps (q4_kernel_tiles2) hid per-call latency behind cross-call
pipelining. Grid-step count is the suspected cost driver."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llm.quant.qtensor import quantize_tensor
from tpu_llm.quant.pallas_matmul import _qmm_kernel

CHAIN = 20


def call(x, qt, K, N, tk, tn):
    qrow = tk // 2
    return pl.pallas_call(
        functools.partial(_qmm_kernel, tk=tk, tn=tn, kind="q4_0",
                          acc_dtype=jnp.float32),
        grid=(1, -(-N // tn), K // tk),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], N), jnp.float32),
        in_specs=[
            pl.BlockSpec((8, tk), lambda b, n, k: (b, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((qrow, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 32, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tn), lambda b, n, k: (b, n), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, qt.q, qt.scales)


def sweep(K, N, tiles):
    rng = np.random.default_rng(0)
    qt = quantize_tensor(rng.standard_normal((K, N)).astype(np.float32) * 0.05)
    # chain: out (1,N) -> (1,K) via cheap elementwise reshaping (a dense
    # reducer matmul would dwarf the kernel under test)
    reps = -(-K // N)
    def red(o):
        o = jnp.tile(o, (1, reps))[:, :K] if reps > 1 else o[:, :K]
        return jnp.tanh(o)
    x0 = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32) * 0.1)
    qbytes = qt.q.size + qt.scales.size * 4
    print(f"--- K={K} N={N} ({qbytes/1e6:.1f} MB) ---", flush=True)
    for tk, tn in tiles:
        if K % tk or tk % 32:
            continue
        steps = -(-N // tn) * (K // tk)

        @jax.jit
        def loop(x, q, s):
            from tpu_llm.quant.qtensor import QTensor
            qt2 = QTensor(q, s, "q4_0")
            def body(c, _):
                o = call(c, qt2, K, N, tk, tn)
                return red(o), None
            c, _ = jax.lax.scan(body, x, None, length=CHAIN)
            return c

        try:
            _ = np.asarray(loop(x0, qt.q, qt.scales))
            t0 = time.perf_counter()
            _ = np.asarray(loop(x0, qt.q, qt.scales))
            dt = (time.perf_counter() - t0) / CHAIN
            print(f"  tk{tk:5d}/tn{tn:5d} ({steps:4d} steps): "
                  f"{dt*1e6:7.1f} us, {qbytes/dt/1e9:5.0f} GB/s", flush=True)
        except Exception as e:
            print(f"  tk{tk}/tn{tn}: FAIL {str(e)[:80]}", flush=True)


def main():
    sweep(2048, 11264, [(256, 1024), (512, 1024), (1024, 1024), (2048, 1024),
                        (2048, 512), (1024, 2048), (2048, 2048)])
    sweep(5632, 2048, [(256, 1024), (512, 1024), (704, 1024), (1408, 1024),
                       (2816, 1024), (1408, 2048), (2816, 512)])
    sweep(2048, 2560, [(256, 1024), (512, 1024), (1024, 1024), (2048, 512),
                       (2048, 1024), (2048, 2560)])
    sweep(2048, 32000, [(256, 1024), (1024, 1024), (2048, 1024), (2048, 2048),
                        (2048, 4096), (1024, 4096)])


if __name__ == "__main__":
    main()
