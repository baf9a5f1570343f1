"""Bisect where time goes in the q4 kernel: HBM read floor, nibble unpack,
scale application, MXU dot. Also try a no-concat two-dot half-plane variant
and bf16 dequant."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llm.quant.qtensor import quantize_tensor
from tpu_llm.quant.pallas_matmul import qmatmul_pallas

K, N = 2048, 5632
TK, TN = 512, 256


def make_kernel(stage):
    def kernel(x_ref, q_ref, s_ref, o_ref, *, tk=TK, tn=TN):
        k_step = pl.program_id(2)
        q = q_ref[:]  # (tk//2, tn) uint8
        if stage == "read":
            acc = jnp.zeros((x_ref.shape[0], tn), jnp.float32)
            acc += (q[:8, :].astype(jnp.int32).astype(jnp.float32).sum(axis=0, keepdims=True)
                    + s_ref[0, :][None, :])
        else:
            b32 = q.astype(jnp.int32)
            lo = (b32 & 0x0F) - 8
            hi = ((b32 >> 4) & 0x0F) - 8
            if stage == "unpack":
                acc = (lo + hi).astype(jnp.float32)[:8, :].sum(0, keepdims=True)
                acc = jnp.broadcast_to(acc, (x_ref.shape[0], tn)) + s_ref[0, :][None]
            else:
                blocks_lo = lo.reshape(tk // 32, 16, tn)
                blocks_hi = hi.reshape(tk // 32, 16, tn)
                vals = jnp.concatenate([blocks_lo, blocks_hi], axis=1).astype(jnp.float32)
                w = (vals * s_ref[:][:, None, :]).reshape(tk, tn)
                if stage == "scale":
                    acc = w[:8, :].sum(0, keepdims=True)
                    acc = jnp.broadcast_to(acc, (x_ref.shape[0], tn))
                else:  # full
                    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)

        @pl.when(k_step == 0)
        def _():
            o_ref[:] = acc

        @pl.when(k_step > 0)
        def _():
            o_ref[:] = o_ref[:] + acc

    return kernel


def twodot_kernel(x_ref, q_ref, s_ref, o_ref, *, tk=TK, tn=TN):
    """Per-32-block half planes, NO concat: byte j of block b holds
    elements 32b+j and 32b+16+j -> lo covers j 0..15, hi j 16..31.
    Shuffle-free if x is pre-permuted so lo/hi halves are contiguous...
    here instead dot lo and hi against x slices gathered with the SAME
    block-local interleave (x repacked host-side)."""
    k_step = pl.program_id(2)
    b32 = q_ref[:].astype(jnp.int32)          # (tk//2, tn)
    lo = ((b32 & 0x0F) - 8).astype(jnp.float32)
    hi = (((b32 >> 4) & 0x0F) - 8).astype(jnp.float32)
    s = s_ref[:]                               # (tk//32, tn)
    srep = jnp.broadcast_to(s[:, None, :], (tk // 32, 16, tn)).reshape(tk // 2, tn)
    lo = lo * srep
    hi = hi * srep
    acc = jnp.dot(x_ref[0:x_ref.shape[0] // 2 * 2][: x_ref.shape[0], :].astype(jnp.float32)[:, : tk // 2] * 0.0 + x_ref[:, : tk // 2], lo,
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    acc = acc + jnp.dot(x_ref[:, tk // 2 :], hi,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = acc

    @pl.when(k_step > 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def call(kernel, x, q, s, qrow):
    B = x.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(1, N // TN, K // TK),
        in_specs=[
            pl.BlockSpec((B, TK), lambda b, n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((qrow, TN), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK // 32, TN), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda b, n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(x, q, s)


def main():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N)).astype(np.float32)
    x8 = jnp.asarray(rng.standard_normal((8, K)).astype(np.float32))
    qt = quantize_tensor(w, "q4_0")

    e = jax.jit(lambda x: x + 1.0)
    r = e(x8); _ = np.asarray(r[0, 0])
    t0 = time.perf_counter(); r = e(x8); _ = np.asarray(r[0, 0])
    rtt = time.perf_counter() - t0
    qbytes = qt.q.size + qt.scales.size * 4

    def bench(fn, label, reps=3000):
        def f(x0):
            def body(carry, _):
                out = fn(carry)
                return x0 + out[:, :K] * 1e-30, ()
            c, _ = jax.lax.scan(body, x0, None, length=reps)
            return c
        g = jax.jit(f)
        r = g(x8); _ = np.asarray(r[0, 0])
        t0 = time.perf_counter(); r = g(x8); _ = np.asarray(r[0, 0])
        dt = (time.perf_counter() - t0 - rtt) / reps
        print(f"{label}: {dt*1e6:.1f} us, {qbytes/dt/1e9:.0f} GB/s effective")

    for stage in ("read", "unpack", "scale", "full"):
        kern = functools.partial(make_kernel(stage), tk=TK, tn=TN)
        bench(lambda c, kern=kern: call(kern, c, qt.q, qt.scales, TK // 2),
              f"stage={stage}")


if __name__ == "__main__":
    main()
