"""Serialized per-call latency of the q4 kernels — the number that actually
predicts decode time (the model is a serial chain of kernels).

Method: lax.scan whose body output feeds the next step (carry-dependent, so
XLA can NOT hoist the matmul out of the loop — a previous harness was
hoisted and reported >HBM-peak "bandwidth"). Program dispatch overhead is
measured separately with an empty-body scan and subtracted.

Variants per shape:
  u8_bf16  — production kernel, bf16 acc (single MXU pass)
  u8_f32   — production kernel, f32 HIGHEST (parity path)
  i4_bf16  — int4-dtype storage, Mosaic native widening
  q8_bf16  — q8_0 int8 storage
  dense_bf16 — plain XLA bf16 matmul (2x q8 bytes, zero unpack)
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llm.quant.qtensor import quantize_tensor, to_int4
from tpu_llm.quant.pallas_matmul import qmatmul_pallas, _pick_tiles

STEPS = 256


def run_loop(loop, x, ws):
    r = loop(x, *ws)
    _ = np.asarray(r)
    t0 = time.perf_counter()
    r = loop(x, *ws)
    _ = np.asarray(r)
    return (time.perf_counter() - t0) / STEPS


def make_loop(fn, K, prep=None):
    @jax.jit
    def loop(x0, *ws):
        ws2 = prep(*ws) if prep is not None else ws
        def body(c, _):
            out = fn(c, *ws2)            # carry-dependent: serialized
            c2 = (x0 + jnp.sum(out) * 1e-30).astype(x0.dtype)
            return c2, ()
        c, _ = jax.lax.scan(body, x0, None, length=STEPS)
        return c
    return loop


def dispatch_overhead():
    @jax.jit
    def loop(x0):
        def body(c, _):
            return c * 1.0000001, ()
        c, _ = jax.lax.scan(body, x0, None, length=STEPS)
        return c

    x = jnp.ones((1, 128), jnp.float32)
    dt = run_loop(loop, x, ())
    print(f"empty-scan step: {dt*1e6:6.1f} us/step  "
          f"(program+step overhead floor)", flush=True)
    return dt


from tpu_llm.quant.pallas_matmul import _qmm_kernel  # noqa: E402


def _i4_kernel(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    k_step = pl.program_id(2)
    vals = q_ref[:].astype(jnp.bfloat16)
    s = s_ref[:].astype(jnp.bfloat16)
    w = (vals.reshape(tk // 32, 32, tn) * s[:, None, :]).reshape(tk, tn)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = acc

    @pl.when(k_step > 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def i4_matmul(x, q_i4, scales, tk, tn):
    rows = x.shape[0]
    N = q_i4.shape[1]
    K = q_i4.shape[0]
    return pl.pallas_call(
        functools.partial(_i4_kernel, tk=tk, tn=tn),
        grid=(1, -(-N // tn), K // tk),
        out_shape=jax.ShapeDtypeStruct((rows, N), jnp.float32),
        in_specs=[
            pl.BlockSpec((8, tk), lambda b, n, k: (b, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 32, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tn), lambda b, n, k: (b, n), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(x, q_i4, scales)


def main():
    base = dispatch_overhead()
    rng = np.random.default_rng(0)
    for K, N in [(2048, 2560), (2048, 2048), (2048, 11264),
                 (5632, 2048), (2048, 32000)]:
        print(f"-- K={K} N={N}", flush=True)
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        qt = quantize_tensor(w, "q4_0")
        qbytes = qt.q.size + qt.scales.size * 4
        xb = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
        xf = jnp.asarray(rng.standard_normal((1, K)), jnp.float32)

        def report(label, dt, nbytes):
            net = dt - base
            print(f"  {label:10s}: {dt*1e6:7.1f} us ({net*1e6:6.1f} net) "
                  f"{nbytes/net/1e9:5.0f} GB/s", flush=True)

        dt = run_loop(make_loop(lambda c, q: qmatmul_pallas(c, q), K),
                      xb, (qt,))
        report("u8_bf16", dt, qbytes)

        dt = run_loop(make_loop(lambda c, q: qmatmul_pallas(c, q), K),
                      xf, (qt,))
        report("u8_f32", dt, qbytes)

        blocks = np.asarray(qt.q).reshape(K // 32, 16, N)
        lo = (blocks & 0x0F).astype(np.int8) - 8
        hi = ((blocks >> 4) & 0x0F).astype(np.int8) - 8
        vals = np.concatenate([lo, hi], axis=1).reshape(K, N)
        v8 = jnp.asarray(vals, jnp.int8)
        tk, tn = _pick_tiles(K, N, acc_itemsize=2)
        dt = run_loop(
            make_loop(lambda c, q, s: i4_matmul(c, q, s, tk, tn), K,
                      prep=lambda q, s: (q.astype(jnp.int4), s)),
            xb, (v8, qt.scales))
        report("i4_bf16", dt, K * N // 2 + qt.scales.size * 4)

        qt8 = quantize_tensor(w, "q8_0")
        dt = run_loop(make_loop(lambda c, q: qmatmul_pallas(c, q), K),
                      xb, (qt8,))
        report("q8_bf16", dt, qt8.q.size + qt8.scales.size * 4)

        from tpu_llm.quant.qtensor import dequantize
        dt = run_loop(make_loop(lambda c, q: jnp.matmul(
            c, dequantize(q, jnp.bfloat16),
            preferred_element_type=jnp.float32), K), xb, (qt,))
        report("xla_deq", dt, qbytes)

        dt = run_loop(make_loop(lambda c, q: jnp.matmul(
            c, dequantize(q, jnp.bfloat16),
            preferred_element_type=jnp.float32), K,
            prep=lambda q: (to_int4(q),)), xb, (qt,))
        report("xla_deq_i4", dt, qbytes)

        wd = jnp.asarray(w, jnp.bfloat16)
        dt = run_loop(
            make_loop(lambda c, wdense: jnp.matmul(
                c, wdense, preferred_element_type=jnp.float32), K),
            xb, (wd,))
        report("dense_bf16", dt, K * N * 2)


if __name__ == "__main__":
    main()
