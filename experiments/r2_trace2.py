"""Trace the fold+win256 decode config: what's left above SOL?"""
import collections, glob, gzip, json, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()
from fast_params import synth_q4_llama
from tpu_llm.models import llama as M
from tpu_llm.quant.convert_params import fold_rope_interleave, unpack_params_int4

TRACE_DIR = "/tmp/xprof_r2c"
STEPS = 32

params, cfg = synth_q4_llama(fused=True)
params = M.unstack_layers(params)
params, cfg = fold_rope_interleave(params, cfg)
jax.block_until_ready(params["layers"][0]["wqkv"].q)
cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
token = jnp.ones((1,), jnp.int32)

@jax.jit
def decode_n(params, token, cache, pos0):
    params = unpack_params_int4(params)
    def body(i, c):
        token, cache, pos = c
        logits, cache = M.decode_step(params, cfg, token, cache, pos,
                                      kv_window=256)
        return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1)
    return jax.lax.fori_loop(0, STEPS, body, (token, cache, pos0))

out = decode_n(params, token, cache, jnp.int32(64))
_ = np.asarray(jax.device_get(out[0][0]))
with jax.profiler.trace(TRACE_DIR):
    out = decode_n(params, token, cache, jnp.int32(64))
    _ = np.asarray(jax.device_get(out[0][0]))

path = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as f:
    data = json.load(f)
ev = data["traceEvents"]
pids = {e["pid"]: e["args"].get("name", "") for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"}
per = collections.defaultdict(lambda: [0.0, 0])
for e in ev:
    if e.get("ph") != "X" or "dur" not in e:
        continue
    if "TPU" not in pids.get(e["pid"], ""):
        continue
    nm = e["name"]
    if nm.startswith("jit_") or nm.startswith("while"):
        continue
    fam = nm.rsplit(".", 1)[0] if nm.rsplit(".", 1)[-1].isdigit() else nm
    per[fam][0] += e["dur"]
    per[fam][1] += 1
total = sum(v[0] for v in per.values())
print(f"total device busy: {total/STEPS:.0f} us/step")
for nm, (us, n) in sorted(per.items(), key=lambda kv: -kv[1][0])[:25]:
    print(f"  {us/STEPS:9.2f} us/step (n={n:5d})  {nm[:80]}")
