"""Hand-rolled double-buffered DMA streaming rate inside one Pallas kernel.

Question: is the q4 kernel's ~300-450 GB/s effective rate a property of
Mosaic's automatic grid pipeline (BlockSpec prefetch), or the chip? XLA
dense matvecs in-model sustain ~714 GB/s on the same weights, so the DMA
engines can go faster. This kernel owns the pipeline: grid=(1,), weights
left in HBM (memory_space=ANY), an explicit fori_loop issues
make_async_copy per chunk with N-deep buffering, compute is a trivial
reduce (so the measured rate is pure DMA).

Sweep: chunk size x pipeline depth, on a 37 MB buffer (classifier-sized).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS = 36864, 1024   # 36 MB int8


def _stream_kernel(hbm_ref, bias_ref, o_ref, *, chunk_rows, depth):
    n_chunks = ROWS // chunk_rows

    def body(scratch, sems):
        def get_dma(slot, idx):
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(idx * chunk_rows, chunk_rows), :],
                scratch.at[slot],
                sems.at[slot],
            )

        for i in range(depth):
            get_dma(i, i).start()

        def loop(idx, acc):
            slot = jax.lax.rem(idx, depth)
            get_dma(slot, idx).wait()
            acc = acc + jnp.sum(
                scratch[slot][:8, :].astype(jnp.float32), axis=0, keepdims=True
            )

            @pl.when(idx + depth < n_chunks)
            def _():
                get_dma(slot, idx + depth).start()

            return acc

        acc = jax.lax.fori_loop(
            0, n_chunks, loop, bias_ref[:1, :].astype(jnp.float32))
        o_ref[:] = jnp.broadcast_to(acc, o_ref.shape)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((depth, chunk_rows, COLS), jnp.int8),
        sems=pltpu.SemaphoreType.DMA((depth,)),
    )


def stream(x, bias, chunk_rows, depth):
    # bias is carry-dependent so the scan can't hoist the call
    return pl.pallas_call(
        functools.partial(_stream_kernel, chunk_rows=chunk_rows, depth=depth),
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct((8, COLS), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, bias)


def main():
    x = jnp.ones((ROWS, COLS), jnp.int8)
    nbytes = ROWS * COLS
    for chunk_rows, depth in [(1024, 2), (1024, 4), (2048, 2), (2048, 4),
                              (4096, 2), (512, 8)]:
        if chunk_rows * COLS * depth > 12 * 1024 * 1024:
            continue
        try:
            f = functools.partial(stream, chunk_rows=chunk_rows, depth=depth)

            @jax.jit
            def loop(x):
                def body(c, _):
                    r = f(x, c)
                    return r[:1, :] * 1e-30, ()
                return jax.lax.scan(
                    body, jnp.zeros((1, COLS), jnp.float32), None,
                    length=64)[0]

            r = loop(x)
            _ = np.asarray(r)
            t0 = time.perf_counter()
            r = loop(x)
            _ = np.asarray(r)
            dt = (time.perf_counter() - t0) / 64
            print(f"chunk={chunk_rows:5d} depth={depth}: {dt*1e6:7.1f} us "
                  f"-> {nbytes/dt/1e9:5.0f} GB/s", flush=True)
        except Exception as e:
            print(f"chunk={chunk_rows:5d} depth={depth}: FAILED "
                  f"{type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
