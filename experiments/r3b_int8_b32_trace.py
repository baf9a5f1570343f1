"""xprof the b32 paged-int8 vs dense-int8 engine steps: localize the
remaining 18% e2e gap (11852 vs 14512 tok/s) now that scale handling is
free at bs>=32 (r3_int8_paged_bisect: full==vpu_off==dma_off at bs64)."""
import collections, glob, gzip, json, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

STEPS = 24
B = 32


def report(trace_dir, label):
    path = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    per = collections.defaultdict(lambda: [0.0, 0])
    total = 0.0
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
        total += e["dur"]
    print(f"=== {label}: device busy {total/STEPS:.0f} us/step")
    for nm, (us, n) in sorted(per.items(), key=lambda kv: -kv[1][0])[:14]:
        print(f"  {us/STEPS:9.2f} us/step ({n//STEPS:4d} ops)  {nm[:90]}")


def build():
    from tpu_llm.config import tinyllama_1_1b
    from tpu_llm.runtime.bench_cli import synth_quant_llama

    cfg = tinyllama_1_1b()
    params = synth_quant_llama(cfg)
    jax.block_until_ready(params["layers"][0]["wqkv"].q)
    return params, cfg


def trace_paged(params, cfg):
    from tpu_llm.runtime.paged_engine import PagedEngine, Request

    eng = PagedEngine(params, cfg, batch=B, n_blocks=B * 16 + 8,
                      block_size=32, max_seq=512, cache_dtype="int8",
                      prefix_caching=False)
    for i in range(B):
        eng.submit(Request(prompt=[3 + i, 7, 11], max_new=400))
    for _ in range(8):
        eng.step()
    with jax.profiler.trace("/tmp/xp_paged32"):
        for _ in range(STEPS):
            eng.step()
        eng._collect()
    report("/tmp/xp_paged32", "paged int8 b32 bs32")


def trace_dense(params, cfg):
    from tpu_llm.runtime.batching import BatchEngine, Request
    from tpu_llm.runtime.engine import ModelAdapter

    adapter = ModelAdapter.llama(cfg, cache_dtype="int8", stacked=False)
    eng = BatchEngine(params, adapter, batch=B, max_seq=512)
    for i in range(B):
        eng.submit(Request(prompt=[3 + i, 7, 11], max_new=400))
    for _ in range(8):
        eng.step()
    with jax.profiler.trace("/tmp/xp_dense32"):
        for _ in range(STEPS):
            eng.step()
        eng._collect()
    report("/tmp/xp_dense32", "dense int8 b32")


if __name__ == "__main__":
    params, cfg = build()
    trace_dense(params, cfg)
    trace_paged(params, cfg)
