"""Probe: pass the 64 per-layer norm vectors as TWO stacked (L, E) f32
buffers (sliced per layer inside jit) instead of 64 separate 16KB
parameters — does the latency-bound prefetch-copy cost collapse into two
bulk transfers? (TPU_LLM_NO_NORM_FOLD=1 so the unfolded rmsnorm path
runs; slicing happens in the harness, no model change.)"""
import os, sys, time, functools
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
os.environ["TPU_LLM_NO_NORM_FOLD"] = "1"
import numpy as np, jax, jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()
from tpu_llm.config import llama2_7b
from tpu_llm.models import llama as M
from tpu_llm.runtime.bench_cli import synth_quant_llama
from tpu_llm.quant.convert_params import unpack_params_int4

cfg = llama2_7b()
params = synth_quant_llama(cfg)
jax.block_until_ready(params["layers"][0]["wqkv"].q)
token = jnp.ones((1,), jnp.int32)

an = jnp.stack([lp["attn_norm"] for lp in params["layers"]])
fn = jnp.stack([lp["ffn_norm"] for lp in params["layers"]])
jax.block_until_ready((an, fn))

def measure(stacked, label):
    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
    @functools.partial(jax.jit, static_argnums=(6,))
    def decode_n(params, an, fn, token, cache, pos0, n):
        params = unpack_params_int4(params)
        if stacked:
            params = dict(params, layers=[
                dict(lp, attn_norm=an[i], ffn_norm=fn[i])
                for i, lp in enumerate(params["layers"])])
        def body(carry, _):
            token, cache, pos = carry
            logits, cache = M.decode_step(params, cfg, token, cache, pos)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1), ()
        (tok_, _, _), _ = jax.lax.scan(body, (token, cache, pos0), None, length=n)
        return tok_
    def timed(n):
        t0 = time.perf_counter()
        out = decode_n(params, an, fn, token, cache, jnp.int32(128), n)
        _ = np.asarray(jax.device_get(out[0]))
        return time.perf_counter() - t0
    timed(128); timed(640)
    best = 1e9
    for _ in range(3):
        a, b = timed(128), timed(640)
        best = min(best, (b - a) / 512)
    print(f"{label}: {best*1e3:.3f} ms/step = {1/best:.1f} tok/s", flush=True)

measure(False, "7b per-layer norm params (shipped)")
measure(True,  "7b stacked norm buffers")
