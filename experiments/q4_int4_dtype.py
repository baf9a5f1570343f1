"""Q4_0 kernel storage experiment: manual nibble unpack (uint8, int32 math,
concat) vs XLA's native int4 dtype (Mosaic hardware-assisted widening).

Same 4.5 bits/weight in HBM either way (XLA packs int4 2-per-byte); the
difference is pure VPU unpack cost, which the decode bisect shows is the
kernel bottleneck (q4 387 tok/s vs q8 410 despite 1.8x fewer bytes).

Variants (bf16 acc, pipelined scan — VPU cost shows regardless):
  u8_manual — current production kernel (pallas_matmul._qmm_kernel)
  i4_native — q stored (K, N) jnp.int4; kernel does astype(bf16) only
  i8_ref    — q8_0-style int8 planes (unpack-free floor, 2x bytes)
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llm.quant.qtensor import quantize_tensor
from tpu_llm.quant.pallas_matmul import qmatmul_pallas, _pick_tiles

REPS = 1000


def _i4_kernel(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    k_step = pl.program_id(2)
    vals = q_ref[:].astype(jnp.bfloat16)               # (tk, tn)
    s = s_ref[:].astype(jnp.bfloat16)                  # (tk//32, tn)
    w = (vals.reshape(tk // 32, 32, tn) * s[:, None, :]).reshape(tk, tn)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = acc

    @pl.when(k_step > 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def i4_matmul(x, q_i4, scales, tk, tn):
    rows, K = x.shape
    N = q_i4.shape[1]
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


def bench(label, fn, x, w_args, nbytes, reps=REPS, prep=None):
    # weights must be jit ARGUMENTS: closure capture constant-folds them.
    # int4 can't cross the jit boundary on this backend (device_put
    # recursion bug), so `prep` converts inside the program, outside the
    # scan (one hoisted int8->int4 copy, amortized over `reps`).
    @jax.jit
    def loop(x0, *ws):
        if prep is not None:
            ws = prep(*ws)
        def body(c, _):
            out = fn(x0, *ws)
            return c + out[0, :1] * 1e-30, ()
        return jax.lax.scan(body, jnp.zeros((1,), jnp.float32), None, length=reps)[0]

    r = loop(x, *w_args)
    _ = np.asarray(r)
    t0 = time.perf_counter()
    r = loop(x, *w_args)
    _ = np.asarray(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:10s}: {dt*1e6:7.1f} us/call, {nbytes/dt/1e9:5.0f} GB/s eff",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    for K, N in [(2048, 32000), (2048, 11264), (2048, 2048)]:
        print(f"-- K={K} N={N}")
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        qt = quantize_tensor(w, "q4_0")
        qbytes = qt.q.size + qt.scales.size * 4
        x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)

        bench("u8_manual", lambda x0, q0: qmatmul_pallas(x0, q0), x, (qt,), qbytes)

        # int4 plane: same logical values, natural (K, N) order
        blocks = np.asarray(qt.q).reshape(K // 32, 16, N)
        lo = (blocks & 0x0F).astype(np.int8) - 8
        hi = ((blocks >> 4) & 0x0F).astype(np.int8) - 8
        vals = np.concatenate([lo, hi], axis=1).reshape(K, N)
        v8 = jnp.asarray(vals, jnp.int8)
        sc = qt.scales
        tk, tn = _pick_tiles(K, N, acc_itemsize=2)
        bench("i4_native", lambda x0, q0, s0: i4_matmul(x0, q0, s0, tk, tn),
              x, (v8, sc), K * N // 2 + sc.size * 4,
              prep=lambda q0, s0: (q0.astype(jnp.int4), s0))

        qt8 = quantize_tensor(w, "q8_0")
        bench("i8_ref", lambda x0, q0: qmatmul_pallas(x0, q0), x, (qt8,),
              qt8.q.size + qt8.scales.size * 4)


if __name__ == "__main__":
    main()
