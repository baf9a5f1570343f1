"""xprof the batch-1 bench-config decode step (q4 fused unstacked, int4
planes, bf16 KV, pos~512): per-op device time AND inter-kernel idle gaps.

Phase isolation (r2_phases.py) sums to 853us but the full step is ~994us;
this finds the missing ~140us — dispatch gaps, fusions not counted by the
phase harness, or serialization between kernels."""
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

from fast_params import synth_q4_llama
from tpu_llm.models import llama as M
from tpu_llm.quant.convert_params import unpack_params_int4

TRACE_DIR = "/tmp/xprof_defer"
STEPS = 32


def main():
    params, cfg = synth_q4_llama(fused=True)
    params = M.unstack_layers(params)
    jax.block_until_ready(params["tok_emb"])

    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, flat_stacked=True)
    token = jnp.ones((1,), jnp.int32)

    @jax.jit
    def decode_n(params, token, cache, pos0):
        params = unpack_params_int4(params)

        def body(i, c):
            token, cache, pos = c
            logits, cache = M.decode_step(params, cfg, token, cache, pos, defer_kv=True)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1)

        return jax.lax.fori_loop(0, STEPS, body, (token, cache, pos0))

    out = decode_n(params, token, cache, jnp.int32(480))
    _ = np.asarray(jax.device_get(out[0][0]))
    with jax.profiler.trace(TRACE_DIR):
        out = decode_n(params, token, cache, jnp.int32(480))
        _ = np.asarray(jax.device_get(out[0][0]))

    path = sorted(glob.glob(
        f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    per = collections.defaultdict(float)
    spans = []
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pids.get(e["pid"], ""):
            continue
        nm = e["name"]
        if nm.startswith("jit_") or nm.startswith("while"):
            continue
        # group by op family: strip the trailing .NNN instance id
        fam = nm.rsplit(".", 1)[0] if nm.rsplit(".", 1)[-1].isdigit() else nm
        per[fam] += e["dur"]
        spans.append((e["ts"], e["ts"] + e["dur"], nm))
    total = sum(per.values())
    print(f"total device busy: {total/STEPS:.0f} us/step over {STEPS} steps")
    for nm, us in sorted(per.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {us/STEPS:9.2f} us/step  x  {nm[:100]}")

    # idle-gap analysis on the merged busy timeline
    spans.sort()
    gaps = collections.defaultdict(float)
    cur_end, prev_nm = None, None
    span_lo = min(s[0] for s in spans)
    span_hi = max(s[1] for s in spans)
    for ts, te, nm in spans:
        if cur_end is None:
            cur_end, prev_nm = te, nm
            continue
        if ts > cur_end:
            gaps[(prev_nm, nm)] += ts - cur_end
        if te > cur_end:
            cur_end, prev_nm = te, nm
    gap_total = sum(gaps.values())
    print(f"\nwall span: {(span_hi-span_lo)/STEPS:.0f} us/step; "
          f"idle gaps: {gap_total/STEPS:.0f} us/step")
    for (a, b), us in sorted(gaps.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {us/STEPS:8.2f} us/step  {a[:45]} -> {b[:45]}")


if __name__ == "__main__":
    main()
