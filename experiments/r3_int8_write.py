"""Isolate the paged WRITE cost: int8 4-scatter vs dense 2-scatter,
decode shape (B=8, T=1), TinyLlama pool dims, slope over 256 chained
writes. Also: a variant writing scales into DENSE per-slot planes
(B, Hkv, S) via one DUS pair instead of lane-granular pool scatters."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

from tpu_llm.ops.paged_kv import PagedKV, paged_update

B, S, Hkv, D, bs = 8, 1024, 4, 64, 16
kvd = Hkv * D
MB = S // bs
N = B * MB + 1


def mk(quant):
    kv = PagedKV.zeros(N, bs, B, MB, kvd,
                       dtype=(jnp.int8 if quant else jnp.bfloat16),
                       n_kv_heads=Hkv)
    table = jnp.asarray(
        np.arange(B * MB, dtype=np.int32).reshape(B, MB) + 1)
    return PagedKV(kv.k_pool, kv.v_pool, table, kv.lengths,
                   kv.k_scale, kv.v_scale)


def run(label, quant, scales_dense=False):
    kv = mk(quant)
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((B, 1, Hkv, D)).astype(np.float32))
    sd_k = jnp.zeros((B, Hkv, S), jnp.float32)
    sd_v = jnp.zeros((B, Hkv, S), jnp.float32)

    @functools.partial(jax.jit, static_argnums=(4,))
    def many(kv, sd_k, sd_v, k, n_steps):
        def body(c, i):
            kv, sd_k, sd_v = c
            pos = jnp.full((B,), 8, jnp.int32) + i
            if scales_dense:
                from tpu_llm.ops.kv_cache import quantize_kv
                kq, ks = quantize_kv(k)
                vq, vs = quantize_kv(k)
                bi = jnp.take_along_axis(kv.block_table,
                                         (pos[:, None] // bs), axis=1)
                offs = (pos % bs)[:, None]
                kv2 = PagedKV(
                    kv.k_pool.at[bi, offs].set(kq.reshape(B, 1, kvd)),
                    kv.v_pool.at[bi, offs].set(vq.reshape(B, 1, kvd)),
                    kv.block_table, kv.lengths, kv.k_scale, kv.v_scale)
                # scales: (B,1,Hkv) -> lane write at pos in (B,Hkv,S)
                sd_k = jax.vmap(
                    lambda a, s, p: jax.lax.dynamic_update_slice(
                        a, s.reshape(Hkv, 1), (0, p)))(sd_k, ks[:, 0], pos)
                sd_v = jax.vmap(
                    lambda a, s, p: jax.lax.dynamic_update_slice(
                        a, s.reshape(Hkv, 1), (0, p)))(sd_v, vs[:, 0], pos)
                return (kv2, sd_k, sd_v), None
            kv2 = paged_update(kv, k, k, pos)
            kv2 = PagedKV(kv2.k_pool, kv2.v_pool, kv.block_table,
                          kv.lengths, kv2.k_scale, kv2.v_scale)
            return (kv2, sd_k, sd_v), None

        (kv, sd_k, sd_v), _ = jax.lax.scan(
            body, (kv, sd_k, sd_v), jnp.arange(n_steps))
        return kv.k_pool

    def timed(n):
        t0 = time.perf_counter()
        out = many(kv, sd_k, sd_v, k, n)
        _ = np.asarray(jax.device_get(out))[0, 0, 0]
        return time.perf_counter() - t0

    many(kv, sd_k, sd_v, k, 32); many(kv, sd_k, sd_v, k, 256)
    best = 1e9
    for _ in range(3):
        a = timed(32); b = timed(256)
        best = min(best, (b - a) / 224)
    print(f"{label:22s}: {best*1e6:8.2f} us/step")


if __name__ == "__main__":
    run("dense-pool (2 scatter)", False)
    run("int8 (4 scatter)", True)
    run("int8 scales-dense", True, scales_dense=True)
