"""Isolate the fixed per-pallas-call cost from per-scan-step overhead.

Body variants inside one jitted lax.scan (chained carry):
  empty  — carry arithmetic only
  callx1 — one read-only pallas call on a W-byte buffer
  callx2 — two chained calls
  callx4 — four chained calls

Marginal cost per call = slope over #calls; the intercept is scan-step +
harness overhead. Run for a small (2.6 MB) and a large (33 MB) buffer to
split fixed-vs-bandwidth.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 512


def make_call(qrow, N, tn):
    def kern(q_ref, o_ref):
        v = jnp.sum(q_ref[:8, :128].astype(jnp.int32).astype(jnp.float32),
                    axis=1, keepdims=True)
        o_ref[:] = jnp.broadcast_to(v, o_ref.shape)

    nn = -(-N // tn)
    return pl.pallas_call(
        kern,
        grid=(1, nn, 1),
        out_shape=jax.ShapeDtypeStruct((8, tn), jnp.float32),
        in_specs=[pl.BlockSpec((qrow, tn), lambda b, n, k: (0, n),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, tn), lambda b, n, k: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )


def bench(label, qrow, N, tn, ncalls):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 255, (qrow, N), dtype=np.uint8))
    call = make_call(qrow, N, tn)

    @jax.jit
    def loop(q):
        def body(c, _):
            acc = c
            for _ in range(ncalls):
                o = call(q)
                acc = acc + o[0, :1] * 1e-9
            return acc, None

        return jax.lax.scan(body, jnp.zeros((1,), jnp.float32), None,
                            length=REPS)[0]

    _ = np.asarray(loop(q))
    t0 = time.perf_counter()
    _ = np.asarray(loop(q))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:6s} x{ncalls}: {dt*1e6:8.1f} us/step", flush=True)
    return dt


def main():
    for label, qrow, N, tn in (("small", 1024, 2560, 512),
                               ("large", 1024, 32000, 1024)):
        times = {}
        for ncalls in (0, 1, 2, 4):
            times[ncalls] = bench(label, qrow, N, tn, ncalls)
        marg21 = (times[2] - times[1]) * 1e6
        marg42 = (times[4] - times[2]) / 2 * 1e6
        nb = qrow * N
        print(f"{label}: marginal/call {marg21:.1f} us (2-1), "
              f"{marg42:.1f} us (4-2) -> {nb/ (marg42*1e-6) /1e9:.0f} GB/s marginal",
              flush=True)


if __name__ == "__main__":
    main()
