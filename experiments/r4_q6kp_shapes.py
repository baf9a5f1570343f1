"""Per-shape isolation: q6_k int8 vs packed kernels on the TinyLlama
projection shapes (serialized-chain slope timing like r2_tile_pipeline)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()
from tpu_llm.quant.qtensor import QTensor, pack_q6_k
from tpu_llm.quant.pallas_matmul import qmatmul_pallas

SHAPES = [("wqkv", 2048, 2560), ("wo", 2048, 2048),
          ("w13", 2048, 11264), ("w2", 5632, 2048), ("wcls", 2048, 32000)]

def bench(qt, K, N, reps=400):
    x = jnp.ones((1, K), jnp.bfloat16)
    @jax.jit
    def chain(x, qt):
        def body(i, acc):
            y = qmatmul_pallas(acc, qt)           # (1, N)
            return jnp.broadcast_to(y[:, :1] * 1e-9, (1, K)).astype(jnp.bfloat16) + x
        return jax.lax.fori_loop(0, reps, body, x)
    r = chain(x, qt); _ = np.asarray(r[0, 0])
    t0 = time.perf_counter(); r = chain(x, qt); _ = np.asarray(r[0, 0])
    dt = (time.perf_counter() - t0) / reps
    return dt

for name, K, N in SHAPES:
    key = jax.random.PRNGKey(0)
    v = jax.random.randint(key, (K, N), -32, 32, jnp.int32).astype(jnp.int8)
    s = jax.random.uniform(key, (K//16, N), jnp.float32, 0.001, 0.01)
    qt8 = QTensor(v, s, "q6_k")
    qtp = pack_q6_k(qt8)
    t8 = bench(qt8, K, N)
    tp = bench(qtp, K, N)
    b8 = (K*N*1.0 + (K//16)*N*4) / t8 / 1e9
    bp = (K*N*0.75 + (K//16)*N*4) / tp / 1e9
    print(f"{name} K={K} N={N}: int8 {t8*1e6:7.1f}us ({b8:5.0f} GB/s eff) "
          f"packed {tp*1e6:7.1f}us ({bp:5.0f} GB/s eff) speedup {t8/tp:.3f}x",
          flush=True)
