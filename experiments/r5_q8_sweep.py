"""q8_0 per-shape tile sweep (VERDICT r4 #7: 610 tok/s vs ~700 roofline,
no bisect trail). Serialized-chain slope timing on the five TinyLlama
decode shapes, q8_0 kind (int8 plane + f32 per-32 scales, bf16
activations, DEFAULT-precision dot) at a grid of K-tiles.

Roofline per shape: (K*N + K/32*N*4) bytes / 819 GB/s.
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
if not os.environ.get("TPU_LLM_NO_COMPILE_CACHE"):
    from tpu_llm.runtime.compile_cache import enable_compile_cache
    enable_compile_cache()

from tpu_llm.quant.pallas_matmul import _qmm_kernel, _pick_tiles, _tile_params
from tpu_llm.quant.qtensor import quantize_tensor
from tpu_llm.runtime.timing import slope_time_s

T0 = time.time()


def emit(**row):
    row["t"] = round(time.time() - T0, 1)
    print(json.dumps(row), flush=True)


def qcall(x, q, s, K, N, tk, tn):
    rows = x.shape[0]
    tb = min(256, -(-rows // 8) * 8)
    return pl.pallas_call(
        functools.partial(_qmm_kernel, tk=tk, tn=tn, kind="q8_0",
                          acc_dtype=jnp.bfloat16),
        grid=(-(-rows // tb), -(-N // tn), K // tk),
        out_shape=jax.ShapeDtypeStruct((rows, N), jnp.float32),
        in_specs=[
            pl.BlockSpec((tb, tk), lambda b, n, k: (b, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda b, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 32, tn), lambda b, n, k: (k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tn), lambda b, n, k: (b, n),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(x, q, s)


def sweep(K, N, tiles, label, chain=4096):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N), np.float32) * 0.02
    qt = quantize_tensor(w, "q8_0")
    q, s = jax.device_put(qt.q), jax.device_put(qt.scales)
    x0 = jnp.full((1, K), 0.01, jnp.bfloat16)
    qbytes = K * N + (K // 32) * N * 4

    for tile in tiles:
        tk, tn = tile if isinstance(tile, tuple) else (tile, N)
        if K % tk or (tk // 32) % 8 or N % tn and N <= 16384:
            continue

        @jax.jit
        def loop(x, q, s, n, tk=tk, tn=tn):
            def body(_, c):
                o = qcall(c, q, s, K, N, tk, tn)
                o = jnp.tanh(o[:, : min(N, K)]).astype(jnp.bfloat16)
                pad = K - o.shape[1]
                if pad > 0:
                    o = jnp.concatenate(
                        [o, jnp.broadcast_to(o[:, :1], (1, pad))], axis=1)
                return o * 0.5 + x * 0.5
            return jax.lax.fori_loop(0, n, body, x)

        def make(n):
            nd = jnp.int32(n)

            def thunk():
                got = loop(x0, q, s, nd)
                np.asarray(jax.device_get(got[0, 0]))

            return thunk

        try:
            dt = slope_time_s(make, chain, chain * 5)
            emit(shape=label, K=K, N=N, tk=tk, tn=tn, ksteps=K // tk,
                 us=round(dt * 1e6, 2), gbs=round(qbytes / dt / 1e9, 1))
        except Exception as e:
            emit(shape=label, tk=tk, tn=tn, err=str(e)[:200])


def main():
    shapes = [
        ("wqkv", 2048, 2560),
        ("wo", 2048, 2048),
        ("w13", 2048, 11264),
        ("w2", 5632, 2048),
        ("wcls", 2048, 32000),
    ]
    for label, K, N in shapes:
        qt = quantize_tensor(np.zeros((K, N), np.float32), "q8_0")
        shipped = _pick_tiles(K, N, tb=8, x_itemsize=2.0, **_tile_params(qt))
        emit(shape=label, shipped=list(shipped))
        if label == "wcls":
            tiles = [(512, 4096), (1024, 4096), (2048, 4096), (1024, 2048),
                     (2048, 2048), (512, 8192), (1024, 8192)]
        elif label == "w13":
            tiles = [(256, N), (512, N), (1024, N), (512, 5632), (1024, 5632),
                     (2048, 5632)]
        elif label == "w2":
            tiles = [(704, N), (1408, N), (2816, N), (5632, N)]
        else:
            tiles = [(256, N), (512, N), (1024, N), (2048, N)]
        sweep(K, N, tiles, label)


if __name__ == "__main__":
    main()
