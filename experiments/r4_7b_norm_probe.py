"""Diagnosis probe (numerics intentionally wrong): drop the per-layer
norm-weight multiplies so their f32[4096] VMEM prefetch copies (~50/step,
~600us busy in the r4 traces) disappear, and measure the step-time delta.
Confirms/denies that the latency-bound norm prefetches are the 7B
decode's largest non-matmul excess."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import numpy as np, jax, jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()
import tpu_llm.ops.norms as norms_mod
from tpu_llm.config import llama2_7b
from tpu_llm.models import llama as M
from tpu_llm.runtime.bench_cli import synth_quant_llama
from tpu_llm.quant.convert_params import unpack_params_int4

cfg = llama2_7b()
params = synth_quant_llama(cfg)
jax.block_until_ready(params["layers"][0]["wqkv"].q)
token = jnp.ones((1,), jnp.int32)

def measure(label):
    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
    @functools.partial(jax.jit, static_argnums=(4,))
    def decode_n(params, token, cache, pos0, n):
        params = unpack_params_int4(params)
        def body(carry, _):
            token, cache, pos = carry
            logits, cache = M.decode_step(params, cfg, token, cache, pos)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1), ()
        (tok_, _, _), _ = jax.lax.scan(body, (token, cache, pos0), None, length=n)
        return tok_
    def timed(n):
        t0 = time.perf_counter()
        out = decode_n(params, token, cache, jnp.int32(128), n)
        _ = np.asarray(jax.device_get(out[0]))
        return time.perf_counter() - t0
    timed(128); timed(640)
    best = 1e9
    for _ in range(3):
        a, b = timed(128), timed(640)
        best = min(best, (b - a) / 512)
    print(f"{label}: {best*1e3:.3f} ms/step = {1/best:.1f} tok/s", flush=True)

measure("baseline (weighted rmsnorm)")
orig = norms_mod.rmsnorm
def rmsnorm_noweight(x, w, eps=1e-5):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
            ).astype(x.dtype)
norms_mod.rmsnorm = rmsnorm_noweight
M.rmsnorm = rmsnorm_noweight
measure("PROBE no norm-weight reads")
