"""Full-step slope time of the deferred-KV decode (one batched DUS for
all layers) vs the per-layer-write baseline. Upper bound from
r2_overhead.py no-dus: ~906us (includes k-rope DCE, so expect less)."""
import sys, time
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

from fast_params import synth_q4_llama
from tpu_llm.models import llama as M
from tpu_llm.quant.convert_params import unpack_params_int4
from tpu_llm.runtime.timing import slope_time_s


def run_variant(label, params, cfg, cache, defer):
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
    jax.block_until_ready(params["tok_emb"])

    c0 = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
    run_variant("baseline", params, cfg, c0, False)
    c1 = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, flat_stacked=True)
    run_variant("defer", params, cfg, c1, True)


if __name__ == "__main__":
    main()
