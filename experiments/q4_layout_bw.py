"""DMA layout experiment: is the q4 kernel's read floor (469 GB/s on w13,
276 GB/s on w2 — experiments/q4_twodot.py) a STRIDED-DMA artifact?

A BlockSpec tile (tk/2, tn) with tn < N reads rows of tn bytes at stride
N from the (K/2, N) uint8 q array — sub-KB bursts. Layouts over the same
bytes, measured with the q4_twodot harness (parallel n-dim, (8, tn)
output blocks, chained scan):

  strided   — production layout, tiles (tk/2, tn)   [rows of tn bytes]
  fullwidth — tiles (tr, N), grid over K only       [fully contiguous]
  tilepack  — q pre-reshaped to (nk, nn, tk/2, tn) so every kernel block
              is one contiguous HBM slab (load-time repack, free offline)

Kernel body touches one sublane row only (the DMA brings the whole block
either way), so the number is pure DMA.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 512

SHAPES = [  # (K, N) of the TinyLlama fused q4 projections
    ("wqkv", 2048, 2560),
    ("wo", 2048, 2048),
    ("w13", 2048, 11264),
    ("w2", 5632, 2048),
    ("cls", 2048, 32000),
]


def _read2d_kernel(q_ref, o_ref):
    v = jnp.sum(q_ref[:8, :128].astype(jnp.int32).astype(jnp.float32),
                axis=1, keepdims=True)
    o_ref[:] = jnp.broadcast_to(v, o_ref.shape)


def _read4d_kernel(q_ref, o_ref):
    v = jnp.sum(q_ref[0, 0][:8, :128].astype(jnp.int32).astype(jnp.float32),
                axis=1, keepdims=True)
    o_ref[:] = jnp.broadcast_to(v, o_ref.shape)


def bench(label, K, N, mode):
    from tpu_llm.quant.pallas_matmul import _pick_tiles

    qrow = K // 2
    rng = np.random.default_rng(0)
    qh = rng.integers(0, 255, (qrow, N), dtype=np.uint8)
    tk, tn = _pick_tiles(K, N, acc_itemsize=2)
    tr = tk // 2

    if mode == "strided":
        nn, nk = -(-N // tn), K // tk
        q = jnp.asarray(qh)
        grid = (1, nn, nk)
        spec = pl.BlockSpec((tr, tn), lambda b, n, k: (k, n),
                            memory_space=pltpu.VMEM)
        kern, otn = _read2d_kernel, tn
    elif mode == "fullwidth":
        tr = max(8, min(qrow, (2 * 1024 * 1024) // N // 8 * 8))
        while qrow % tr:
            tr -= 8
        q = jnp.asarray(qh)
        grid = (1, 1, qrow // tr)
        spec = pl.BlockSpec((tr, N), lambda b, n, k: (k, 0),
                            memory_space=pltpu.VMEM)
        kern, otn = _read2d_kernel, min(N, 1024)
    else:  # tilepack
        nn, nk = -(-N // tn), K // tk
        npad = nn * tn - N
        if npad:
            qh = np.pad(qh, ((0, 0), (0, npad)))
        q4d = qh.reshape(nk, tr, nn, tn).transpose(0, 2, 1, 3).copy()
        q = jnp.asarray(q4d)  # (nk, nn, tr, tn) contiguous blocks
        grid = (1, nn, nk)
        spec = pl.BlockSpec((1, 1, tr, tn), lambda b, n, k: (k, n, 0, 0),
                            memory_space=pltpu.VMEM)
        kern, otn = _read4d_kernel, tn

    call = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((8, otn), jnp.float32),
        in_specs=[spec],
        out_specs=pl.BlockSpec((8, otn), lambda b, n, k: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )

    @jax.jit
    def loop(q):
        def body(c, _):
            o = call(q)
            return c + o[0, :1] * 1e-9, None

        return jax.lax.scan(body, jnp.zeros((1,), jnp.float32), None,
                            length=REPS)[0]

    _ = np.asarray(loop(q))
    t0 = time.perf_counter()
    _ = np.asarray(loop(q))
    dt = (time.perf_counter() - t0) / REPS
    nb = qh.size
    print(f"{label:5s} K{K:5d} N{N:5d} {mode:9s}: {dt*1e6:7.1f} us, "
          f"{nb/dt/1e9:6.1f} GB/s  (grid={grid})", flush=True)


def main():
    for label, K, N in SHAPES:
        for mode in ("strided", "fullwidth", "tilepack"):
            bench(label, K, N, mode)


if __name__ == "__main__":
    main()
