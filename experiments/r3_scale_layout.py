"""Probe: does a 2D (N*8, SP) scale pool stop XLA's per-layer relayout
ping-pong between the scatter and the Pallas ANY operand?

The production (N, Hkv, SP) pools cost 5.06 ms/step in f32[560,4,128]
layout-conversion copies (r3_int8_step_trace at bs64). Compare compiled
HLO + device time for a scatter->kernel->scatter chain in both forms."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

N, Hkv, SP, bs = 560, 4, 128, 64
B = 8


def kernel3d(tbl_ref, s_hbm, o_ref, buf, sem):
    b = pl.program_id(0)
    bid = tbl_ref[b]
    cp = pltpu.make_async_copy(s_hbm.at[pl.ds(bid, 1)], buf, sem)
    cp.start(); cp.wait()
    o_ref[...] = jnp.full((8, 128), jnp.sum(buf[0][:, :bs]), jnp.float32)


def kernel2d(tbl_ref, s_hbm, o_ref, buf, sem):
    b = pl.program_id(0)
    bid = tbl_ref[b]
    cp = pltpu.make_async_copy(s_hbm.at[pl.ds(bid * 8, 8)], buf, sem)
    cp.start(); cp.wait()
    o_ref[...] = jnp.full((8, 128), jnp.sum(buf[:Hkv, :bs]), jnp.float32)


def run(form):
    if form == "3d":
        pool = jnp.zeros((N, Hkv, SP), jnp.float32)
        k = pl.pallas_call(
            kernel3d,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(B,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((8, 128), lambda b, tbl: (0, 0)),
                scratch_shapes=[pltpu.VMEM((1, Hkv, SP), jnp.float32),
                                pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        )
    else:
        pool = jnp.zeros((N * 8, SP), jnp.float32)
        k = pl.pallas_call(
            kernel2d,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(B,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((8, 128), lambda b, tbl: (0, 0)),
                scratch_shapes=[pltpu.VMEM((8, SP), jnp.float32),
                                pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        )

    tbl = jnp.arange(B, dtype=jnp.int32) + 1
    sc = jnp.ones((B, 1, Hkv), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def step(pool, tbl, sc, layers=22):
        outs = []
        for _ in range(layers):
            bid = tbl[:, None]                      # (B,1)
            offs = jnp.full((B, 1), 7, jnp.int32)
            if form == "3d":
                pool = pool.at[bid, :, offs].set(sc)
            else:
                rows = bid[..., None] * 8 + jnp.arange(Hkv)[None, None, :]
                pool = pool.at[rows, offs[..., None]].set(sc[:, :, :])
            outs.append(k(tbl, pool)[:, 0])
        return pool, jnp.stack(outs).sum()

    lowered = step.lower(pool, tbl, sc, 22).compile()
    hlo = lowered.as_text()
    ncopy = hlo.count(" copy(")
    print(f"{form}: {ncopy} copy ops in compiled HLO")
    p = pool
    for _ in range(3):
        p, o = step(p, tbl, sc, 22)
    _ = np.asarray(jax.device_get(o))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            p, o = step(p, tbl, sc, 22)
        _ = np.asarray(jax.device_get(o))
        ts.append((time.perf_counter() - t0) / 10)
    print(f"{form}: {min(ts)*1e6:.1f} us/step (22 layers)")


if __name__ == "__main__":
    run("3d")
    run("2d")
