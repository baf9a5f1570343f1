"""Round-2 phase decomposition on the bench config (TinyLlama q4_0 fused
unstacked + int4 planes + bf16 KV), plus the full-step slope time.
Identifies where the gap to the ~1190 tok/s HBM roofline lives."""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from tpu_llm.config import tinyllama_1_1b
from tpu_llm.models import llama as M
from tpu_llm.quant.convert_params import quantize_llama_params, unpack_params_int4
from tpu_llm.runtime.phase_timing import measure_phase_times
from tpu_llm.runtime.timing import slope_time_s

POS = 512

def full_step_time(params, cfg):
    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
    token = jnp.ones((1,), jnp.int32)

    @jax.jit
    def run_n(params, token, cache, n):
        params = unpack_params_int4(params)

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

    return slope_time_s(make, 16, 144)


def main():
    cfg = tinyllama_1_1b()
    _, (params, _, _, _) = ge.entry()
    params = quantize_llama_params(params, "q4_0", fuse=True)
    params = M.unstack_layers(params)

    dt = full_step_time(params, cfg)
    print(f"full step: {dt*1e6:.1f} us -> {1/dt:.1f} tok/s", flush=True)

    times = measure_phase_times(params, cfg, batch=1, pos=POS, max_seq=1024,
                                int4=True)
    total = sum(times.values())
    for k, v in times.items():
        print(f"  {k:<11s}{v*1000:9.1f} us", flush=True)
    print(f"  {'sum':<11s}{total*1000:9.1f} us (isolated phases; full step "
          f"{dt*1e6:.1f})", flush=True)


if __name__ == "__main__":
    main()
