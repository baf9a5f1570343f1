"""A/B: TinyLlama q4_k decode with f32 vs bf16 scale+min planes.
q4_k device layout is 4-bit + per-32 scales + per-32 mins: f32 planes
cost 2 bits/weight (833 tok/s measured, 87% of the 6-bit roofline);
bf16 planes cut that to 1 bit/weight -> 5-bit SOL ~1110."""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()


def run(pack, steps=128, reps=3):
    from tpu_llm.config import tinyllama_1_1b
    from tpu_llm.models import llama as M
    from tpu_llm.runtime.bench_cli import synth_quant_llama
    from tpu_llm.quant.convert_params import unpack_params_int4

    cfg = tinyllama_1_1b()
    params = synth_quant_llama(cfg, kind="q4_k")
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
        a, b = timed(16), timed(steps)
        best = min(best, (b - a) / (steps - 16))
    print(f"q4_k pack_scales={pack!r}: {best*1e3:.3f} ms/step = "
          f"{1/best:.1f} tok/s", flush=True)
    return 1 / best


if __name__ == "__main__":
    r32 = run("")
    rb = run("bf16")
    rf = run("f16")
    print(f"bf16 {rb/r32:.3f}x, f16-bits {rf/r32:.3f}x")
