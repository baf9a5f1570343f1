"""Round 2 of q4 kernel tuning: burst width vs dot precision.

Hypotheses from the bisect (read floor 281 GB/s @ tk512/tn256, full 173):
  1. DMA bursts are tn bytes wide (row-major (K/2, N) packed layout);
     tn=256 -> 256B bursts is the floor. Wider tn + shallower tk should
     lift the read floor.
  2. HIGHEST f32 dot costs ~60%; bf16 dequant + default precision or a
     mixed path should close it. Check numeric delta too.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llm.quant.qtensor import quantize_tensor, dequantize

K, N = 2048, 5632
B = 8


def kernel(x_ref, q_ref, s_ref, o_ref, *, tk, tn, mode):
    k_step = pl.program_id(2)
    blocks = q_ref[:].reshape(tk // 32, 16, tn).astype(jnp.int32)
    lo = (blocks & 0x0F) - 8
    hi = ((blocks >> 4) & 0x0F) - 8
    vals = jnp.concatenate([lo, hi], axis=1)
    if mode == "f32_highest":
        w = (vals.astype(jnp.float32) * s_ref[:][:, None, :]).reshape(tk, tn)
        acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    elif mode == "f32_default":
        w = (vals.astype(jnp.float32) * s_ref[:][:, None, :]).reshape(tk, tn)
        acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    elif mode == "bf16":
        w = (vals.astype(jnp.bfloat16)
             * s_ref[:][:, None, :].astype(jnp.bfloat16)).reshape(tk, tn)
        acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32)
    elif mode == "read":
        acc = jnp.broadcast_to(
            (blocks[:1, 0, :].astype(jnp.float32) + s_ref[0, :][None]),
            (x_ref.shape[0], tn),
        )

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = acc

    @pl.when(k_step > 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def call(x, qt, tk, tn, mode, semantics):
    qrow = tk // 2
    kw = {}
    if semantics:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        )
    return pl.pallas_call(
        functools.partial(kernel, tk=tk, tn=tn, mode=mode),
        grid=(B // 8, N // tn, K // tk),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        in_specs=[
            pl.BlockSpec((8, tk), lambda b, n, k: (b, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((qrow, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 32, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tn), lambda b, n, k: (b, n), memory_space=pltpu.VMEM),
        **kw,
    )(x, qt.q, qt.scales)


def main():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    qt = quantize_tensor(w, "q4_0")
    x = jnp.asarray(rng.standard_normal((B, K)).astype(np.float32) * 0.1)
    ref = jnp.matmul(x, dequantize(qt, jnp.float32))
    qbytes = qt.q.size + qt.scales.size * 4

    def bench(tk, tn, mode, semantics, reps=2000):
        try:
            f = jax.jit(functools.partial(call, tk=tk, tn=tn, mode=mode,
                                          semantics=semantics))

            def loop(x0):
                def body(c, _):
                    o = f(x0, qt)
                    return c + o[0, 0] * 0, None
                return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]

            lj = jax.jit(loop)
            _ = np.asarray(lj(x))
            t0 = time.perf_counter()
            _ = np.asarray(lj(x))
            dt = (time.perf_counter() - t0) / reps
            err = ""
            if mode != "read":
                out = f(x, qt)
                rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
                err = f" maxrel={rel:.2e}"
            print(f"tk{tk}/tn{tn} {mode} sem={semantics}: "
                  f"{dt*1e6:.1f} us, {qbytes/dt/1e9:.0f} GB/s{err}", flush=True)
        except Exception as e:
            print(f"tk{tk}/tn{tn} {mode}: FAIL {type(e).__name__} {str(e)[:120]}",
                  flush=True)

    for tk, tn in [(512, 256), (2048, 512), (256, 1024), (128, 2048),
                   (256, 2048), (512, 1024), (64, 2816), (128, 1408)]:
        bench(tk, tn, "read", True)
        bench(tk, tn, "f32_highest", True)
        bench(tk, tn, "f32_default", True)
        bench(tk, tn, "bf16", True)


if __name__ == "__main__":
    main()
