"""A/B: Llama-2 7B q4_0 batch-1 decode with and without defer_kv.
r3_7b_ops.py traced ~1.1ms/step of copy/copy-done in the plain path —
the fori carry copying KV planes the un-fused append can't alias."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

def run(defer_kv: bool, steps=128, reps=3):
    from tpu_llm.config import llama2_7b
    from tpu_llm.models import llama as M
    from tpu_llm.runtime.bench_cli import synth_quant_llama
    from tpu_llm.quant.convert_params import unpack_params_int4

    cfg = llama2_7b()
    params = synth_quant_llama(cfg)
    jax.block_until_ready(params["layers"][0]["wqkv"].q)
    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
    token = jnp.ones((1,), jnp.int32)

    import functools

    @functools.partial(jax.jit, static_argnums=(4,))
    def decode_n(params, token, cache, pos0, n):
        params = unpack_params_int4(params)

        def body(i, c):
            token, cache, pos = c
            logits, cache = M.decode_step(params, cfg, token, cache, pos,
                                          defer_kv=defer_kv)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1)

        return jax.lax.fori_loop(0, n, body, (token, cache, pos0))

    # slope timing: t(steps) - t(16) removes dispatch+prologue
    def timed(n):
        t0 = time.perf_counter()
        out = decode_n(params, token, cache, jnp.int32(128), n)
        _ = np.asarray(jax.device_get(out[0][0]))
        return time.perf_counter() - t0

    timed(16); timed(steps)      # compile both
    best = 1e9
    for _ in range(reps):
        a = timed(16)
        b = timed(steps)
        best = min(best, (b - a) / (steps - 16))
    print(f"defer_kv={defer_kv}: {best*1e3:.3f} ms/step = {1/best:.1f} tok/s")
    return 1 / best

if __name__ == "__main__":
    r_plain = run(False)
    r_defer = run(True)
    print(f"speedup: {r_defer/r_plain:.3f}x")
