"""A/B the folded-norm row_scale kernels: 7B q4_0 and TinyLlama q4_0
(headline defer_kv config) with and without TPU_LLM_NO_NORM_FOLD."""
import os, sys, time, functools
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import numpy as np, jax, jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()
from tpu_llm.config import llama2_7b, tinyllama_1_1b
from tpu_llm.models import llama as M
from tpu_llm.runtime.bench_cli import synth_quant_llama
from tpu_llm.quant.convert_params import unpack_params_int4

def measure(cfg, params, label, defer, pack_scales, steps=(128, 640)):
    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
    token = jnp.ones((1,), jnp.int32)
    @functools.partial(jax.jit, static_argnums=(4,))
    def decode_n(params, token, cache, pos0, n):
        params = unpack_params_int4(params, pack_scales=pack_scales)
        def body(carry, _):
            token, cache, pos = carry
            logits, cache = M.decode_step(params, cfg, token, cache, pos,
                                          defer_kv=defer)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1), ()
        (tok_, _, _), _ = jax.lax.scan(body, (token, cache, pos0), None, length=n)
        return tok_
    def timed(n):
        t0 = time.perf_counter()
        out = decode_n(params, token, cache, jnp.int32(128), n)
        _ = np.asarray(jax.device_get(out[0]))
        return time.perf_counter() - t0
    lo, hi = steps
    timed(lo); timed(hi)
    best = 1e9
    for _ in range(3):
        a, b = timed(lo), timed(hi)
        best = min(best, (b - a) / (hi - lo))
    print(f"{label}: {best*1e3:.3f} ms/step = {1/best:.1f} tok/s", flush=True)

cfg7 = llama2_7b()
p7 = synth_quant_llama(cfg7)
jax.block_until_ready(p7["layers"][0]["wqkv"].q)
os.environ.pop("TPU_LLM_NORM_FOLD", None)
measure(cfg7, p7, "7b q4_0 no-fold (shipped)", defer=False, pack_scales=False)
os.environ["TPU_LLM_NORM_FOLD"] = "1"
measure(cfg7, p7, "7b q4_0 norm-fold", defer=False, pack_scales=False)
del p7

cfgT = tinyllama_1_1b()
import dataclasses
cfgT = dataclasses.replace(cfgT, rope_variant="neox")
pT = synth_quant_llama(cfgT)
jax.block_until_ready(pT["layers"][0]["wqkv"].q)
os.environ.pop("TPU_LLM_NORM_FOLD", None)
measure(cfgT, pT, "tinyllama q4_0 defer no-fold (headline)", defer=True,
        pack_scales="bf16")
os.environ["TPU_LLM_NORM_FOLD"] = "1"
measure(cfgT, pT, "tinyllama q4_0 defer norm-fold", defer=True,
        pack_scales="bf16")
