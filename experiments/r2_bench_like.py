"""Bench-shaped measurement (scan loop, slope legs 128 vs 640 steps from
pos 16 — positions reach 656, S=1024): einsum vs flash-decode attention,
both with the rope fold. Decides the default decode attention path."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()
from fast_params import synth_q4_llama
from tpu_llm.models import llama as M
from tpu_llm.ops.flash_attention import flash_decode_attention
from tpu_llm.quant.convert_params import fold_rope_interleave, unpack_params_int4
from tpu_llm.runtime.timing import slope_time_s

def attn_flash(q, kc, vc, positions, offset):
    B, T, H, D = q.shape
    S = kc.shape[1]
    Hkv = kc.shape[2] // D
    return flash_decode_attention(
        q, kc.reshape(B, S, Hkv, D), vc.reshape(B, S, Hkv, D), positions)

def run_variant(label, params, cfg, attn_fn):
    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
    token = jnp.ones((1,), jnp.int32)
    def make_run(length):
        @jax.jit
        def decode_n(params, token, cache, pos0):
            params = unpack_params_int4(params)
            def body(carry, _):
                token, cache, pos = carry
                x, cache2 = M.forward(params, cfg, token[:, None], cache, pos,
                                      attn_fn=attn_fn)
                logits = M.lm_head(params, cfg, x)[:, 0, :]
                token = jnp.argmax(logits, -1).astype(jnp.int32)
                return (token, cache2, pos + 1), token
            (token, cache, _), toks = jax.lax.scan(
                body, (token, cache, pos0), None, length=length)
            return toks, cache
        def run():
            toks, _ = decode_n(params, token, cache, jnp.int32(16))
            _ = np.asarray(toks[-1])
        return run
    t0 = time.time()
    dt = 1.0 / slope_time_s(make_run, 128, 640)
    print(f"[{label}] {dt:.1f} tok/s  (setup+compile {time.time()-t0:.0f}s)",
          flush=True)

def main():
    params, cfg = synth_q4_llama(fused=True)
    params = M.unstack_layers(params)
    params, cfg = fold_rope_interleave(params, cfg)
    jax.block_until_ready(params["layers"][0]["wqkv"].q)
    run_variant("fold+einsum", params, cfg, None)
    run_variant("fold+flash", params, cfg, attn_flash)

if __name__ == "__main__":
    main()
