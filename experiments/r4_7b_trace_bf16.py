"""xprof one Llama-2 7B q4_0 batch-1 decode step: per-op device time.
Measured 147-153 tok/s vs a 216 tok/s roofline; find the slow ops."""
import collections, glob, gzip, json, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import numpy as np
import jax
import jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

STEPS = 48

def report(trace_dir, label):
    path = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
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
    print(f"=== {label}: total device busy {total/STEPS:.0f} us/step")
    for nm, (us, n) in sorted(per.items(), key=lambda kv: -kv[1][0])[:20]:
        print(f"  {us/STEPS:9.2f} us/step ({n//STEPS:4d} ops)  {nm[:100]}")

def main():
    from tpu_llm.config import llama2_7b
    from tpu_llm.models import llama as M
    from tpu_llm.runtime.bench_cli import synth_quant_llama
    from tpu_llm.quant.convert_params import unpack_params_int4

    cfg = llama2_7b()
    params = synth_quant_llama(cfg)
    jax.block_until_ready(params["layers"][0]["wqkv"].q)
    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
    token = jnp.ones((1,), jnp.int32)

    @jax.jit
    def decode_n(params, token, cache, pos0):
        params = unpack_params_int4(params, pack_scales="bf16")

        def body(i, c):
            token, cache, pos = c
            logits, cache = M.decode_step(params, cfg, token, cache, pos)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1)

        return jax.lax.fori_loop(0, STEPS, body, (token, cache, pos0))

    out = decode_n(params, token, cache, jnp.int32(480))
    _ = np.asarray(jax.device_get(out[0][0]))
    with jax.profiler.trace("/tmp/xprof_r4bf16"):
        out = decode_n(params, token, cache, jnp.int32(480))
        _ = np.asarray(jax.device_get(out[0][0]))
    report("/tmp/xprof_r4bf16", "llama2-7b q4_0 b1 (bf16 scales)")

if __name__ == "__main__":
    main()
