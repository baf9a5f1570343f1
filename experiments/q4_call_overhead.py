"""Measure per-pallas_call fixed overhead vs bytes: time a scan of repeated
q4 matvecs at several weight sizes; the intercept of time-vs-bytes is the
per-call cost that projection fusion would eliminate."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpu_llm.quant.qtensor import quantize_tensor
from tpu_llm.quant.linear import matmul

REPS = 2000


def bench(K, N, reps=REPS):
    rng = np.random.default_rng(0)
    qt = quantize_tensor(rng.standard_normal((K, N)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))

    @jax.jit
    def loop(x0):
        def body(c, _):
            o = matmul(x0, qt)
            return c + o[0, :1] * 1e-9, None
        return jax.lax.scan(body, jnp.zeros((1,), jnp.float32), None, length=reps)[0]

    _ = np.asarray(loop(x))
    t0 = time.perf_counter()
    _ = np.asarray(loop(x))
    dt = (time.perf_counter() - t0) / reps
    qbytes = qt.q.size + qt.scales.size * 4
    print(f"K{K} N{N}: {dt*1e6:7.1f} us/call, {qbytes/1e6:6.2f} MB, "
          f"{qbytes/dt/1e9:5.0f} GB/s", flush=True)
    return qbytes, dt


def main():
    pts = []
    for K, N in [(2048, 256), (2048, 1024), (2048, 2048), (2048, 5632),
                 (5632, 2048), (2048, 11264), (2048, 32000)]:
        pts.append(bench(K, N))
    b = np.array([p[0] for p in pts], np.float64)
    t = np.array([p[1] for p in pts], np.float64)
    A = np.vstack([b, np.ones_like(b)]).T
    slope, intercept = np.linalg.lstsq(A, t, rcond=None)[0]
    print(f"fit: {1/slope/1e9:.0f} GB/s stream rate, "
          f"{intercept*1e6:.1f} us fixed per call")


if __name__ == "__main__":
    main()
