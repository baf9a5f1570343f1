"""Sweep _chunk_blocks target_rows on the PRODUCTION paged kernels in
isolation (scan of 256 calls, slope-free: the op is µs-scale so one
fetch amortizes over the scan). B=32, bs=64, S=1024, TinyLlama dims."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

import tpu_llm.ops.flash_attention as FA

B, S, H, Hkv, D, bs = 32, 1024, 32, 4, 64, 64
kvd = Hkv * D
MB = S // bs
N = B * MB + 1


def run(target_rows, quant):
    orig = FA._chunk_blocks
    FA._chunk_blocks = lambda bs_, mb_, target_rows=target_rows, **kw: \
        max(1, min(mb_, target_rows // bs_))
    try:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))
        table = jnp.asarray(
            np.arange(B * MB, dtype=np.int32).reshape(B, MB) + 1)
        pos = jnp.full((B,), S - 2, jnp.int32)
        if quant:
            kp = jnp.asarray(rng.integers(-127, 127, (N, bs, kvd), np.int8))
            vp = jnp.asarray(rng.integers(-127, 127, (N, bs, kvd), np.int8))
            hp = 8
            ks = jnp.asarray(
                rng.standard_normal((N * hp, 128)).astype(np.float32))
            vs = jnp.asarray(
                rng.standard_normal((N * hp, 128)).astype(np.float32))

            @jax.jit
            def many(q, pos, table, kp, vp, ks, vs):
                def body(c, _):
                    o = FA.paged_flash_decode_q(c, kp, vp, ks, vs, table, pos)
                    return o, None
                out, _ = jax.lax.scan(body, q, None, length=256)
                return out

            args = (q, pos, table, kp, vp, ks, vs)
        else:
            kp = jnp.asarray(
                rng.standard_normal((N, bs, kvd)).astype(np.float32)
            ).astype(jnp.bfloat16)
            vp = kp

            @jax.jit
            def many(q, pos, table, kp, vp):
                def body(c, _):
                    o = FA.paged_flash_decode_attention(c, kp, vp, table, pos)
                    return o, None
                out, _ = jax.lax.scan(body, q, None, length=256)
                return out

            args = (q, pos, table, kp, vp)

        def timed():
            t0 = time.perf_counter()
            out = many(*args)
            _ = np.asarray(jax.device_get(out))[0, 0, 0, 0]
            return time.perf_counter() - t0

        timed()
        best = min(timed() for _ in range(3))
        us = best / 256 * 1e6
        print(f"quant={int(quant)} target_rows={target_rows}: "
              f"{us:8.2f} us/call", flush=True)
    finally:
        FA._chunk_blocks = orig


if __name__ == "__main__":
    for quant in (True, False):
        for tr in (256, 512, 1024):
            run(tr, quant)
