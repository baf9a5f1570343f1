"""Re-measure with tunnel-corrected slope timing (experiments/slope_timer):

  empty        — scan-step floor (carry add only)
  read:<shape> — read-only kernel per production tile plan (pure DMA)
  qmm:<shape>  — production q4 kernel (u8 nibbles, bf16)
  i4mm:<shape> — production kernel on int4-plane storage
  hbm:xla_sum  — XLA reduce over 512 MB (bandwidth ceiling probe)

Every prior per-call number (12us launch floor, 270-470 GB/s read
floors) included tunnelRT/REPS ~ 30-100 us of constant bias; this is the
honest re-baseline that the tile/layout strategy should be judged on.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slope_timer import time_scan_body
from tpu_llm.quant.qtensor import quantize_tensor, to_int4
from tpu_llm.quant.pallas_matmul import qmatmul_pallas, _pick_tiles

SHAPES = [
    ("wqkv", 2048, 2560),
    ("wo", 2048, 2048),
    ("w13", 2048, 11264),
    ("w2", 5632, 2048),
    ("cls", 2048, 32000),
]


def read_call(qrow, N, tr, tn):
    def kern(q_ref, o_ref):
        v = jnp.sum(q_ref[:8, :128].astype(jnp.int32).astype(jnp.float32),
                    axis=1, keepdims=True)
        o_ref[:] = jnp.broadcast_to(v, o_ref.shape)

    return pl.pallas_call(
        kern,
        grid=(1, -(-N // tn), qrow // tr),
        out_shape=jax.ShapeDtypeStruct((8, tn), jnp.float32),
        in_specs=[pl.BlockSpec((tr, tn), lambda b, n, k: (k, n),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, tn), lambda b, n, k: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )


def main():
    rng = np.random.default_rng(0)

    us = time_scan_body(lambda c: c * (1.0 - 1e-9) + 1e-9,
                        jnp.zeros((1,), jnp.float32))
    print(f"empty            : {us:8.2f} us/step", flush=True)

    big = jnp.asarray(rng.integers(0, 255, (512 * 1024, 1024), dtype=np.uint8))
    us = time_scan_body(
        lambda c, b: c + jnp.sum(b, dtype=jnp.int32)[None].astype(jnp.float32) * 1e-9,
        jnp.zeros((1,), jnp.float32), (big,))
    print(f"hbm:xla_sum 512MB: {us:8.2f} us/step -> {big.size/us/1e3:6.1f} GB/s",
          flush=True)

    for label, K, N in SHAPES:
        w = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
        qt = quantize_tensor(w)
        qi4 = to_int4(qt)
        x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32) * 0.1
                        ).astype(jnp.bfloat16)
        tk, tn = _pick_tiles(K, N, acc_itemsize=2)
        qbytes = qt.q.size + qt.scales.size * 4

        rd = read_call(K // 2, N, tk // 2, tn)
        us = time_scan_body(
            lambda c, q: c + rd(q)[0, :1] * 1e-9,
            jnp.zeros((1,), jnp.float32), (qt.q,))
        print(f"read:{label:5s}      : {us:8.2f} us/step -> "
              f"{qt.q.size/us/1e3:6.1f} GB/s", flush=True)

        def qstep(c, x, qt):
            o = qmatmul_pallas(c, qt)
            return x + (jnp.mean(o) * 1e-9).astype(jnp.bfloat16)

        us = time_scan_body(qstep, x, (x, qt))
        print(f"qmm:{label:5s}       : {us:8.2f} us/step -> "
              f"{qbytes/us/1e3:6.1f} GB/s", flush=True)

        # int4 arrays can't cross the jit boundary under axon (device_put
        # recursion bug) — convert from u8 inside the jit, outside the scan
        us = time_scan_body(qstep, x, (x, qt),
                            prep=lambda x, qt: (x, to_int4(qt)))
        print(f"i4mm:{label:5s}      : {us:8.2f} us/step -> "
              f"{qbytes/us/1e3:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
