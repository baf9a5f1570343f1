"""Retry bf16 scale planes on Llama-2 7B q4_0 decode with the round-3
kernel (generalized scale decode, kind-aware tiles). Round-2 measured a
LOSS (153.1 -> 147.5) which is anomalous: scales are ~0.84 GB/token of
4.2 at f32 — halving them should win ~10% if the kernel streams at the
same rate. Slope-timed like r3_7b_defer.py."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()


def run(pack: str, steps=128, reps=3):
    from tpu_llm.config import llama2_7b
    from tpu_llm.models import llama as M
    from tpu_llm.runtime.bench_cli import synth_quant_llama
    from tpu_llm.quant.convert_params import unpack_params_int4

    cfg = llama2_7b()
    params = synth_quant_llama(cfg)
    jax.block_until_ready(params["layers"][0]["wqkv"].q)
    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
    token = jnp.ones((1,), jnp.int32)

    @functools.partial(jax.jit, static_argnums=(4,))
    def decode_n(params, token, cache, pos0, n):
        params = unpack_params_int4(params, pack_scales=pack or False)

        def body(i, c):
            token, cache, pos = c
            logits, cache = M.decode_step(params, cfg, token, cache, pos)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1)

        return jax.lax.fori_loop(0, n, body, (token, cache, pos0))

    def timed(n):
        t0 = time.perf_counter()
        out = decode_n(params, token, cache, jnp.int32(128), n)
        _ = np.asarray(jax.device_get(out[0][0]))
        return time.perf_counter() - t0

    timed(16); timed(steps)
    best = 1e9
    for _ in range(reps):
        a = timed(16)
        b = timed(steps)
        best = min(best, (b - a) / (steps - 16))
    print(f"pack_scales={pack!r}: {best*1e3:.3f} ms/step = {1/best:.1f} tok/s",
          flush=True)
    return 1 / best


if __name__ == "__main__":
    r_f32 = run("")
    r_bf16 = run("bf16")
    r_f16 = run("f16")
    print(f"bf16 speedup {r_bf16/r_f32:.3f}x, f16-bits {r_f16/r_f32:.3f}x")
