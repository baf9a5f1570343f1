"""Measure achievable HBM read bandwidth on this chip — the honest
speed-of-light denominator for the weight-bound decode budget (TinyLlama
Q4_0 ~ 620 MB/token).

All timing loops run INSIDE one jitted program (lax.scan) — under the axon
tunnel each dispatch costs ~ms, so host-side loops measure dispatch, not
the chip.

Probes:
  xla_sum     — jnp.sum over a 512 MB int8 buffer (XLA reduce)
  pallas_sum  — streaming-reduce Pallas kernel over the same buffer
  dense_mv    — bf16 matvec (1, 2048) @ (2048, 32000): 125 MB of bf16
  q4_mv       — Q4_0 fused dequant matvec, same logical shape (36.9 MB)
  q4_mv_f32   — same kernel, f32/HIGHEST parity path
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed_scan(fn, carry, steps=32, label="", nbytes=0):
    @jax.jit
    def loop(carry):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, carry, None, length=steps)
        return c

    c = loop(carry)
    _ = np.asarray(jax.tree_util.tree_leaves(c)[0]).ravel()[:1]
    t0 = time.perf_counter()
    c = loop(carry)
    _ = np.asarray(jax.tree_util.tree_leaves(c)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / steps
    gbs = nbytes / dt / 1e9
    print(f"{label:12s}: {dt*1e6:8.1f} us/step -> {gbs:7.1f} GB/s", flush=True)


def _sum_kernel(x_ref, o_ref):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.sum(x_ref[:].astype(jnp.float32), axis=0, keepdims=True)


def stream_sum(x, tile_rows=2048):
    rows, cols = x.shape
    return pl.pallas_call(
        _sum_kernel,
        grid=(rows // tile_rows,),
        out_shape=jax.ShapeDtypeStruct((8, cols), jnp.float32),
        in_specs=[pl.BlockSpec((tile_rows, cols), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, cols), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(x)


def main():
    from tpu_llm.quant.pallas_matmul import qmatmul_pallas
    from tpu_llm.quant.qtensor import quantize_tensor

    nbytes = 512 * 1024 * 1024
    cols = 1024
    x = jnp.ones((nbytes // cols, cols), jnp.int8)

    # keep the carry tiny; fold a data dependence in so scan can't dedupe
    timed_scan(lambda c: c + jnp.sum(x, dtype=jnp.int32),
               jnp.int32(0), label="xla_sum", nbytes=nbytes)
    timed_scan(lambda c: c + stream_sum(x)[0, :1],
               jnp.zeros((1,), jnp.float32), label="pallas_sum", nbytes=nbytes)

    K, N = 2048, 32000
    rng = np.random.default_rng(0)
    wf = rng.standard_normal((K, N)).astype(np.float32) * 0.02
    wd = jnp.asarray(wf, jnp.bfloat16)
    v = jnp.ones((1, K), jnp.bfloat16)

    timed_scan(lambda c: (c + jnp.matmul(c, wd, preferred_element_type=jnp.float32)
                          [:, :K].astype(jnp.bfloat16) * 0),
               v, label="dense_mv", nbytes=K * N * 2)

    qt = quantize_tensor(wf, "q4_0")
    qbytes = qt.q.size + qt.scales.size * qt.scales.dtype.itemsize

    timed_scan(lambda c: (c + qmatmul_pallas(c, qt)[:, :K].astype(jnp.bfloat16) * 0),
               v, label="q4_mv", nbytes=qbytes)
    vf = jnp.ones((1, K), jnp.float32)
    timed_scan(lambda c: (c + qmatmul_pallas(c, qt)[:, :K] * 0),
               vf, label="q4_mv_f32", nbytes=qbytes)


if __name__ == "__main__":
    main()
