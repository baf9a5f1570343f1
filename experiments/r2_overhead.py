"""Upper-bound measurements for the non-matmul decode overheads found by
r2_trace.py: (a) baseline, (b) neox rope (timing proxy for folding the
interleave permutation into wq/wk columns — same math cost, no
(B,T,H,D/2,2) reshapes), (c) no-op KV cache update (bounds the 44
tiny-DUS cost), (d) both."""
import sys, time
sys.path.insert(0, "/root/repo")

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

from fast_params import synth_q4_llama
from tpu_llm.models import llama as M
from tpu_llm.quant.convert_params import unpack_params_int4
from tpu_llm.runtime.timing import slope_time_s


def run_variant(label, params, cfg, update_fn=None):
    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
    token = jnp.ones((1,), jnp.int32)

    @jax.jit
    def run_n(params, token, cache, n):
        params = unpack_params_int4(params)
        def body(i, c):
            token, cache, pos = c
            x, cache2 = M.forward(params, cfg, token[:, None], cache, pos,
                                  update_fn=update_fn)
            logits = M.lm_head(params, cfg, x)[:, 0, :]
            return (jnp.argmax(logits, -1).astype(jnp.int32)[:, 0]
                    if logits.ndim == 3 else
                    jnp.argmax(logits, -1).astype(jnp.int32), cache2, pos + 1)
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

    noop = lambda kc, vc, k, v, offset, **kw: (kc, vc)

    run_variant("baseline", params, cfg)
    cfg_nx = dataclasses.replace(cfg, rope_variant="neox")
    run_variant("neox-rope", params, cfg_nx)
    run_variant("no-dus", params, cfg, update_fn=noop)
    run_variant("both", params, cfg_nx, update_fn=noop)


if __name__ == "__main__":
    main()
