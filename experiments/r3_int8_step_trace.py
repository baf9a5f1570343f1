"""xprof the PRODUCTION PagedEngine decode step, dense vs int8 pools
(TinyLlama q4_0 weights, B=8, bs=16): where do int8 pools lose the
~35% (4480 vs 6935 tok/s, BASELINE r2)? Read side was bisected to only
~16us/layer (r3_int8_paged_bisect) — suspect the 4-pool scatter write."""
import collections
import glob
import gzip
import json
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()


def report(trace_dir, label, steps):
    path = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tot = 0.0
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
        tot += e["dur"]
    print(f"== {label}: device busy {tot/steps:.0f} us/step", flush=True)
    for nm, (us, n) in sorted(per.items(), key=lambda kv: -kv[1][0])[:14]:
        print(f"   {us/steps:8.2f} us/step ({n//steps:4d} ops)  {nm}",
              flush=True)


def run(cache_dtype, steps=48):
    from tpu_llm.config import tinyllama_1_1b
    from tpu_llm.runtime.bench_cli import synth_quant_llama
    from tpu_llm.runtime.paged_engine import PagedEngine
    from tpu_llm.runtime.batching import Request

    cfg = tinyllama_1_1b()
    params = synth_quant_llama(cfg)
    jax.block_until_ready(params["layers"][0]["wqkv"].q)
    dt = {"bf16": jnp.bfloat16, "int8": jnp.int8}[cache_dtype]
    eng = PagedEngine(params, cfg, batch=8, n_blocks=560,
                      max_seq=1024, block_size=16, cache_dtype=dt)
    for i in range(8):
        eng.submit(Request(prompt=[7 + i] * 128, max_new=800))
    for _ in range(40):      # admit + warm the step
        eng.step()
    d = f"/tmp/xprof_step_{cache_dtype}"
    with jax.profiler.trace(d):
        for _ in range(steps):
            eng.step()
        eng._collect()
    report(d, f"paged {cache_dtype} b8 bs16", steps)


if __name__ == "__main__":
    run("bf16")
    run("int8")
