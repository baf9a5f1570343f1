"""fold + S=256 cache + fused attention+append kernel (defer_kv on TPU)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()
from fast_params import synth_q4_llama
from tpu_llm.models import llama as M
from tpu_llm.quant.convert_params import fold_rope_interleave, unpack_params_int4
from tpu_llm.runtime.timing import slope_time_s

def run_variant(label, params, cfg, S, defer, cache_dtype=jnp.float32):
    # f32 cache: _use_flash_append requires unpacked sublane tiling for
    # the in-kernel single-row append DMA (bf16 would silently fall back
    # to gqa_attention_deferred)
    cache = M.init_cache(cfg, 1, S, dtype=cache_dtype, stacked=False)
    token = jnp.ones((1,), jnp.int32)
    @jax.jit
    def run_n(params, token, cache, n):
        params = unpack_params_int4(params)
        def body(i, c):
            token, cache, pos = c
            logits, cache = M.decode_step(params, cfg, token, cache, pos,
                                          defer_kv=defer)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1)
        return jax.lax.fori_loop(0, n, body, (token, cache, jnp.int32(16)))
    def make(n):
        nd = jnp.int32(n)
        def thunk():
            out = run_n(params, token, cache, nd)
            np.asarray(jax.device_get(out[0][0]))
        return thunk
    t0 = time.time()
    make(4)()
    print(f"[{label}] compile+warm {time.time()-t0:.1f}s", flush=True)
    dt = slope_time_s(make, 16, 144)
    print(f"[{label}] full step: {dt*1e6:.1f} us -> {1/dt:.1f} tok/s", flush=True)

def main():
    params, cfg = synth_q4_llama(fused=True)
    params = M.unstack_layers(params)
    params, cfg = fold_rope_interleave(params, cfg)
    jax.block_until_ready(params["layers"][0]["wqkv"].q)
    run_variant("fold+S1024+append-f32", params, cfg, 1024, True)
    run_variant("fold+S1024+flash-bf16", params, cfg, 1024, False,
                cache_dtype=jnp.bfloat16)

if __name__ == "__main__":
    main()
