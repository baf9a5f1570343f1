"""xprof one paged-decode step (b8, bs64, chunked kernel) vs dense b8:
per-op device time + idle gaps. r3_paged_gap bisect said scatter ~0.37ms
and attention ~0.12ms over dense; this pins the ops."""
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

from fast_params import synth_q4_llama
from tpu_llm.models import llama as M
from tpu_llm.ops.paged_kv import PagedKV
from tpu_llm.quant.convert_params import (fold_rope_interleave,
                                          unpack_params_int4)
from tpu_llm.runtime.paged_engine import _paged_attn_fn, _paged_update_fn

STEPS = 32
B, S, BSZ = 8, 1024, 64


def report(trace_dir, label):
    path = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
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
        fam = nm.rsplit(".", 1)[0] if nm.rsplit(".", 1)[-1].isdigit() else nm
        per[fam] += e["dur"]
        spans.append((e["ts"], e["ts"] + e["dur"], nm))
    total = sum(per.values())
    print(f"\n=== {label}: total device busy {total/STEPS:.0f} us/step")
    for nm, us in sorted(per.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us/STEPS:9.2f} us/step  {nm[:110]}")
    spans.sort()
    gaps = collections.defaultdict(float)
    cur_end, prev_nm = None, None
    for ts, te, nm in spans:
        if cur_end is None:
            cur_end, prev_nm = te, nm
            continue
        if ts > cur_end:
            gaps[(prev_nm, nm)] += ts - cur_end
        if te > cur_end:
            cur_end, prev_nm = te, nm
    span = max(s[1] for s in spans) - min(s[0] for s in spans)
    print(f"  wall {span/STEPS:.0f} us/step; idle {sum(gaps.values())/STEPS:.0f} us/step")
    for (a, b), us in sorted(gaps.items(), key=lambda kv: -kv[1])[:8]:
        print(f"  gap {us/STEPS:8.2f} us/step  {a[:40]} -> {b[:40]}")


def main():
    params, cfg = synth_q4_llama(fused=True)
    params = M.unstack_layers(params)
    params, cfg = fold_rope_interleave(params, cfg)
    jax.block_until_ready(params["tok_emb"])
    L, kvd = cfg.n_layers, cfg.kv_dim

    # ---- paged ----
    bpr = -(-S // BSZ)
    n_blocks = 1 + B * bpr
    table = jnp.asarray(
        1 + np.arange(B * bpr, dtype=np.int32).reshape(B, bpr))
    pstate = {
        "k": [jnp.zeros((n_blocks, BSZ, kvd), jnp.bfloat16) for _ in range(L)],
        "v": [jnp.zeros((n_blocks, BSZ, kvd), jnp.bfloat16) for _ in range(L)],
        "table": table, "lengths": jnp.full((B,), 16, jnp.int32),
    }
    token = jnp.ones((B,), jnp.int32)

    @jax.jit
    def paged_n(params, token, state, pos0):
        params = unpack_params_int4(params)

        def body(i, c):
            token, state, pos = c
            cache = {"k": [PagedKV(state["k"][j], state["v"][j],
                                   state["table"], state["lengths"])
                           for j in range(L)],
                     "v": [None] * L}
            hidden, nc = M.forward(params, cfg, token[:, None], cache,
                                   jnp.full((B,), pos, jnp.int32),
                                   update_fn=_paged_update_fn,
                                   attn_fn=_paged_attn_fn)
            logits = M.lm_head(params, cfg, hidden)[:, 0, :]
            state = {"k": [kv.k_pool for kv in nc["k"]],
                     "v": [kv.v_pool for kv in nc["k"]],
                     "table": state["table"],
                     "lengths": nc["k"][0].lengths}
            return (jnp.argmax(logits, -1).astype(jnp.int32), state, pos + 1)

        return jax.lax.fori_loop(0, STEPS, body, (token, state, pos0))

    out = paged_n(params, token, pstate, jnp.int32(480))
    _ = np.asarray(jax.device_get(out[0][0]))
    with jax.profiler.trace("/tmp/xprof_r3paged"):
        out = paged_n(params, token, pstate, jnp.int32(480))
        _ = np.asarray(jax.device_get(out[0][0]))
    report("/tmp/xprof_r3paged", "paged b8 bs64")

    # ---- dense ----
    cache = M.init_cache(cfg, B, S, dtype=jnp.bfloat16, stacked=False)

    @jax.jit
    def dense_n(params, token, cache, pos0):
        params = unpack_params_int4(params)

        def body(i, c):
            token, cache, pos = c
            logits, cache = M.decode_step(params, cfg, token, cache, pos)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1)

        return jax.lax.fori_loop(0, STEPS, body, (token, cache, pos0))

    out = dense_n(params, token, cache, jnp.int32(480))
    _ = np.asarray(jax.device_get(out[0][0]))
    with jax.profiler.trace("/tmp/xprof_r3dense"):
        out = dense_n(params, token, cache, jnp.int32(480))
        _ = np.asarray(jax.device_get(out[0][0]))
    report("/tmp/xprof_r3dense", "dense b8")


if __name__ == "__main__":
    main()
