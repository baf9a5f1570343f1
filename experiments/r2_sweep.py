"""One-claim perf sweep for the q4_0 batch-1 headline (run on chip).

Variants (all slope-timed, bench.py-shaped scan from pos 16, S=1024):
  base          — current default path (_attend flash decode kernel)
  defer         — decode_step(defer_kv=True): fused attention+append kernel
  bf16s         — bf16 scale planes (halve scale HBM, cast-only rebuild)
  defer+bf16s   — both
  int8kv        — int8 KV cache (flash gate rejects QuantKV -> einsum attn)

Run everything in ONE process = one axon claim (see memory: killed claims
wedge the pool).
"""
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


def run_variant(label, params, cfg, *, defer=False, pack_scales=False,
                cache_dtype=jnp.bfloat16, steps=(128, 640)):
    cache = M.init_cache(cfg, 1, 1024, dtype=cache_dtype, stacked=False)
    token = jnp.ones((1,), jnp.int32)

    def make_run(length):
        @jax.jit
        def decode_n(params, token, cache, pos0):
            params = unpack_params_int4(params, pack_scales=pack_scales)

            def body(carry, _):
                token, cache, pos = carry
                logits, cache = M.decode_step(params, cfg, token, cache, pos,
                                              defer_kv=defer)
                token = jnp.argmax(logits, -1).astype(jnp.int32)
                return (token, cache, pos + 1), token

            (token_, cache_, _), toks = jax.lax.scan(
                body, (token, cache, pos0), None, length=length)
            return toks, cache_

        def run():
            toks, _ = decode_n(params, token, cache, jnp.int32(16))
            _ = np.asarray(toks[-1])

        return run

    t0 = time.time()
    tok_s = 1.0 / slope_time_s(make_run, *steps)
    print(f"[{label:>14}] {tok_s:7.1f} tok/s  (wall {time.time()-t0:.0f}s)",
          flush=True)
    return tok_s


def main():
    from tpu_llm.config import tinyllama_1_1b

    params, cfg = synth_q4_llama(fused=True)
    params = M.unstack_layers(params)
    params, cfg = fold_rope_interleave(params, cfg)
    jax.block_until_ready(params["layers"][0]["wqkv"].q)
    print("params ready", flush=True)

    # known-good paths first; the fused-append variants (never scan-run
    # on chip) go LAST so a Mosaic hang there can't cost the rest of the
    # sweep (killed claims wedge the pool — memory/axon-wedge-recovery)
    run_variant("base", params, cfg)
    run_variant("bf16s", params, cfg, pack_scales="bf16")
    run_variant("int8kv", params, cfg, cache_dtype="int8")
    run_variant("defer", params, cfg, defer=True)
    run_variant("defer+bf16s", params, cfg, defer=True, pack_scales="bf16")


if __name__ == "__main__":
    main()
