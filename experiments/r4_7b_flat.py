"""7B q4_0 cache-write strategy A/B at the shipped deep regime
(slope 128 vs 640 decode steps from pos 128): eager per-layer DUS vs
defer per-layer vs defer flat-stacked (ONE batched DUS for all layers).
The r4 traces show ~700us/step of per-layer data movement (copy-done/
reshape/dus) at L=32 — r2 measured flat a LOSS at TinyLlama (22 layers,
small planes); 7B's 32 big planes re-open the question."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
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

def run(defer, flat, label):
    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False,
                         flat_stacked=flat)

    @functools.partial(jax.jit, static_argnums=(4,))
    def decode_n(params, token, cache, pos0, n):
        params = unpack_params_int4(params)
        def body(carry, _):
            token, cache, pos = carry
            logits, cache = M.decode_step(params, cfg, token, cache, pos,
                                          defer_kv=defer)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1), ()
        (tok_, cache_, _), _ = jax.lax.scan(body, (token, cache, pos0), None,
                                            length=n)
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
    return 1 / best

run(False, False, "eager per-layer (shipped)")
run(True, False, "defer per-layer")
run(True, True, "defer flat-stacked")
