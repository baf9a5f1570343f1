"""xprof the Mamba-130M f32 batch-1 decode step: per-op device time +
idle gaps. 1451 tok/s vs a ~1575-2240 tok/s bandwidth bound — is the gap
per-op dispatch overhead (24 layers x ~12 small mixer ops) or a slow
op?"""
import collections
import glob
import gzip
import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

STEPS = 32


def report(trace_dir, label):
    path = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    per = collections.defaultdict(lambda: [0.0, 0])
    spans = []
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
        spans.append((e["ts"], e["ts"] + e["dur"], nm))
    total = sum(v[0] for v in per.values())
    print(f"\n=== {label}: total device busy {total/STEPS:.0f} us/step")
    for nm, (us, n) in sorted(per.items(), key=lambda kv: -kv[1][0])[:30]:
        print(f"  {us/STEPS:9.2f} us/step ({n//STEPS:4d} ops)  {nm[:100]}")
    spans.sort()
    lo = min(s[0] for s in spans)
    hi = max(s[1] for s in spans)
    busy = 0.0
    cur = None
    for ts, te, _ in spans:
        if cur is None or ts > cur:
            busy += te - ts
            cur = te
        elif te > cur:
            busy += te - cur
            cur = te
    print(f"  wall {(hi-lo)/STEPS:.0f} us/step; busy {busy/STEPS:.0f}; "
          f"idle {(hi-lo-busy)/STEPS:.0f} us/step")


def main():
    from tpu_llm.models import mamba as M
    from tpu_llm.runtime.bench_cli import _build_mamba

    params, cfg = _build_mamba()
    params = M.split_projections(M.unstack_layers(params))
    state = M.init_state(cfg, 1, stacked=False)
    token = jnp.ones((1,), jnp.int32)
    jax.block_until_ready(params["tok_emb"])

    @jax.jit
    def decode_n(params, token, state):
        def body(i, c):
            token, state = c
            hidden, state = M.forward(params, cfg, token[:, None], state)
            logits = M.lm_head(params, cfg, hidden)[:, 0, :]
            return (jnp.argmax(logits, -1).astype(jnp.int32), state)

        return jax.lax.fori_loop(0, STEPS, body, (token, state))

    out = decode_n(params, token, state)
    _ = np.asarray(jax.device_get(out[0][0]))
    with jax.profiler.trace("/tmp/xprof_r3mamba"):
        out = decode_n(params, token, state)
        _ = np.asarray(jax.device_get(out[0][0]))
    report("/tmp/xprof_r3mamba", "mamba-130M f32 b1")


if __name__ == "__main__":
    main()
