"""q4 unpack cost: current reshape+concat assembly vs a two-dot split that
never assembles the interleaved weight tile — x is split into the matching
16-row groups instead (tiny relayout on the activation, none on the
weight). bf16 mode, min-step tiles, amortized harness (q4 is VPU-bound so
unpack cost shows regardless of pipelining)."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llm.quant.qtensor import quantize_tensor, dequantize

REPS = 1000


def kernel(x_ref, xlo_ref, xhi_ref, q_ref, s_ref, o_ref, *, tk, tn, mode):
    k_step = pl.program_id(2)
    q = q_ref[:]
    s = s_ref[:]                                  # (tk//32, tn) f32
    if mode == "current":
        blocks = q.reshape(tk // 32, 16, tn).astype(jnp.int32)
        lo = (blocks & 0x0F) - 8
        hi = ((blocks >> 4) & 0x0F) - 8
        vals = jnp.concatenate([lo, hi], axis=1).astype(jnp.bfloat16)
        w = (vals * s[:, None, :].astype(jnp.bfloat16)).reshape(tk, tn)
        acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32)
    elif mode == "twodot":
        b32 = q.astype(jnp.int32)                 # (tk//2, tn)
        sh = jnp.broadcast_to(
            s[:, None, :].astype(jnp.bfloat16), (tk // 32, 16, tn)
        ).reshape(tk // 2, tn)
        wlo = ((b32 & 0x0F) - 8).astype(jnp.bfloat16) * sh
        whi = (((b32 >> 4) & 0x0F) - 8).astype(jnp.bfloat16) * sh
        acc = (jnp.dot(xlo_ref[:], wlo, preferred_element_type=jnp.float32)
               + jnp.dot(xhi_ref[:], whi, preferred_element_type=jnp.float32))
    elif mode == "read":
        acc = jnp.broadcast_to(
            q[:1, :].astype(jnp.int32).astype(jnp.float32) + s[0, :][None], (x_ref.shape[0], tn)
        )

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = acc

    @pl.when(k_step > 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def bench(K, N, tk, tn, mode):
    rng = np.random.default_rng(0)
    qt = quantize_tensor(rng.standard_normal((K, N)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)

    def call(x, q, s):
        B = x.shape[0]
        xb = x.astype(jnp.bfloat16).reshape(B, K // 32, 32)
        xlo = xb[:, :, :16].reshape(B, K // 2)
        xhi = xb[:, :, 16:].reshape(B, K // 2)
        return pl.pallas_call(
            functools.partial(kernel, tk=tk, tn=tn, mode=mode),
            grid=(1, -(-N // tn), K // tk),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            in_specs=[
                pl.BlockSpec((8, tk), lambda b, n, k: (b, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, tk // 2), lambda b, n, k: (b, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, tk // 2), lambda b, n, k: (b, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((tk // 2, tn), lambda b, n, k: (k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tk // 32, tn), lambda b, n, k: (k, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, tn), lambda b, n, k: (b, n),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, xlo, xhi, q, s)

    f = jax.jit(call)
    if mode != "read":
        ref = jnp.matmul(x.astype(jnp.float32),
                         dequantize(qt, jnp.float32),
                         preferred_element_type=jnp.float32)
        got = f(x, qt.q, qt.scales)
        rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    else:
        rel = 0.0

    @jax.jit
    def loop(x0, q, s):
        def body(c, _):
            o = f(x0, q, s)
            return c + o[0, :1] * 1e-9, None
        return jax.lax.scan(body, jnp.zeros((1,), jnp.float32), None,
                            length=REPS)[0]

    _ = np.asarray(loop(x, qt.q, qt.scales))
    t0 = time.perf_counter()
    _ = np.asarray(loop(x, qt.q, qt.scales))
    dt = (time.perf_counter() - t0) / REPS
    qb = qt.q.size + qt.scales.size * 4
    print(f"K{K} N{N} tk{tk}/tn{tn} {mode:8s}: {dt*1e6:7.1f} us, "
          f"{qb/dt/1e9:5.0f} GB/s, maxrel={rel:.1e}", flush=True)


def main():
    for mode in ("read", "current", "twodot"):
        bench(2048, 11264, 2048, 1024, mode)
    for mode in ("read", "current", "twodot"):
        bench(5632, 2048, 2816, 1024, mode)


if __name__ == "__main__":
    main()
