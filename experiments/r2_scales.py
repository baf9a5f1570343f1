"""Scale-plane dtype sweep on the bench config (TinyLlama q4_0 fused
unstacked, int4 planes, bf16 KV, batch 1): f32 scales (baseline) vs
f16-bit int16 planes (5-op in-kernel rebuild) vs bf16 (1-op upcast).

Round-1 measured f16-bit scales as a LOSS (944 vs 980) when the kernel
was VPU-bound; projections now run at ~90% of HBM SoL, so the ~68MB of
f32 scale traffic per token (~10% of the 690MB total) is back on the
table. Run AFTER the rope-hoist change (full step 986.7us baseline)."""
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


def main():
    t0 = time.time()
    params, cfg = synth_q4_llama(fused=True)
    params = M.unstack_layers(params)
    jax.block_until_ready(params["tok_emb"])
    print(f"params ready in {time.time()-t0:.1f}s", flush=True)

    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
    token = jnp.ones((1,), jnp.int32)

    for mode in (False, "bf16", "f16"):
        @jax.jit
        def run_n(params, token, cache, n, mode=mode):
            params = unpack_params_int4(params, pack_scales=mode)
            def body(i, c):
                token, cache, pos = c
                logits, cache = M.decode_step(params, cfg, token, cache, pos)
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
        print(f"[{mode}] compile+warm in {time.time()-t0:.1f}s", flush=True)
        dt = slope_time_s(make, 16, 144)
        print(f"[{mode}] full step: {dt*1e6:.1f} us -> {1/dt:.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
