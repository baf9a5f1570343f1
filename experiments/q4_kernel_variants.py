"""Dev harness: compare Q4_0 dequant-matmul kernel formulations on the
real chip. Not part of the library — results feed tpu_llm/quant/.

Variants:
  current   — int8 tile, int32 nibble math, f32 HIGHEST dot
  plane32   — weights packed as int32 words of 8 plane-strided nibbles;
              unpack via shift/mask + f32 magic-number bias, no int8 ops
  xla       — dequantize with XLA ops + dense dot (fusion baseline)
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llm.quant.qtensor import quantize_tensor, dequantize
from tpu_llm.quant.pallas_matmul import qmatmul_pallas

MAGIC = 0x4B000000  # f32 8388608.0; OR-ing a nibble n gives 8388608 + n


def pack_plane32(qt, tk):
    """TPU q4 layout -> per-K-tile plane-strided int32 words.
    word[r, n] of tile t holds nibbles for k = t*tk + j*(tk//8) + r."""
    K, N = qt.shape
    vals = np.asarray(jnp.asarray(dequantize(qt, jnp.float32)))  # cheat: get ints back
    scales = np.asarray(qt.scales)
    sc_rep = np.repeat(scales, 32, axis=0)
    q = np.rint(vals / sc_rep).astype(np.int64) + 8  # 0..15
    q = q.astype(np.uint32)
    words = np.zeros((K // 8, N), np.uint32)
    stride = tk // 8
    for t in range(K // tk):
        tile = q[t * tk : (t + 1) * tk]  # (tk, N)
        for j in range(8):
            words[t * stride : (t + 1) * stride] |= (
                tile[j * stride : (j + 1) * stride] << (4 * j)
            )
    return jnp.asarray(words.view(np.int32)), jnp.asarray(scales)


def plane32_kernel(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    k_step = pl.program_id(2)
    w32 = q_ref[:]                       # (tk//8, tn) int32
    planes = []
    for j in range(8):
        nib = (w32 >> (4 * j)) & 0xF if j else w32 & 0xF
        f = pltpu.bitcast(nib | MAGIC, jnp.float32)
        planes.append(f)
    w = jnp.concatenate(planes, axis=0)  # (tk, tn), value = 8388608 + q
    scale = s_ref[:][:, None, :] * jnp.ones((1, 32, 1), jnp.float32)
    scale = scale.reshape(tk, tn)
    w = (w - (8388608.0 + 8.0)) * scale
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = acc

    @pl.when(k_step > 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def plane32_matmul(x, words, scales, K, N, tk=512, tn=256):
    B = x.shape[0]
    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    out = pl.pallas_call(
        functools.partial(plane32_kernel, tk=tk, tn=tn),
        grid=(1, N // tn, K // tk),
        in_specs=[
            pl.BlockSpec((Bp, tk), lambda b, n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 8, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 32, tn), lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bp, tn), lambda b, n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, N), jnp.float32),
    )(x, words, scales)
    return out[:B]


def main():
    rng = np.random.default_rng(0)
    K, N = 2048, 5632
    w = rng.standard_normal((K, N)).astype(np.float32)
    x = rng.standard_normal((1, K)).astype(np.float32)
    xj = jnp.asarray(x)
    qt = quantize_tensor(w, "q4_0")
    words, scales = pack_plane32(qt, tk=512)

    wd = np.asarray(dequantize(qt, jnp.float32)).astype(np.float64)
    exp = x.astype(np.float64) @ wd

    got = np.asarray(plane32_matmul(xj, words, scales, K, N))
    print("plane32 rel err:", np.abs(got - exp).max() / np.abs(exp).max())

    e = jax.jit(lambda x: x + 1.0)
    r = e(xj); _ = np.asarray(r[0, 0])
    t0 = time.perf_counter(); r = e(xj); _ = np.asarray(r[0, 0])
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
        r = g(xj); _ = np.asarray(r[0, 0])
        t0 = time.perf_counter(); r = g(xj); _ = np.asarray(r[0, 0])
        dt = (time.perf_counter() - t0 - rtt) / reps
        print(f"{label}: {dt*1e6:.1f} us, {qbytes/dt/1e9:.0f} GB/s effective")

    bench(lambda c: qmatmul_pallas(c, qt), "current")
    bench(lambda c: plane32_matmul(c, words, scales, K, N), "plane32")
    bench(lambda c: jnp.matmul(c, dequantize(qt, jnp.float32),
                               preferred_element_type=jnp.float32), "xla-dequant")


if __name__ == "__main__":
    main()
