"""xprof the batch-32 int8-KV decode step: which ops eat the 1957us of
attention (widening materialization? score scaling? softmax?).

Prints the top TPU ops by total device time over a 16-step scan.
"""

import gzip
import glob
import json
import collections

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402
from tpu_llm.config import tinyllama_1_1b  # noqa: E402
from tpu_llm.models import llama as M  # noqa: E402
from tpu_llm.quant.convert_params import unpack_params_int4  # noqa: E402

TRACE_DIR = "/tmp/xprof_b32"
STEPS = 16
BATCH = 32


def main():
    cfg = tinyllama_1_1b()
    params, _ = B.build_params("q4_0")
    cache = M.init_cache(cfg, BATCH, 1024, dtype="int8", stacked=False)
    token = jnp.ones((BATCH,), jnp.int32)

    @jax.jit
    def decode_n(params, token, cache, pos0):
        params = unpack_params_int4(params)

        def body(carry, _):
            token, cache, pos = carry
            logits, cache = M.decode_step(params, cfg, token, cache, pos)
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (token, cache, pos + 1), token

        (token, cache, _), toks = jax.lax.scan(
            body, (token, cache, pos0), None, length=STEPS)
        return toks

    toks = decode_n(params, token, cache, jnp.int32(16))
    _ = np.asarray(toks[-1])
    with jax.profiler.trace(TRACE_DIR):
        toks = decode_n(params, token, cache, jnp.int32(16))
        _ = np.asarray(toks[-1])

    path = sorted(glob.glob(
        f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    per = collections.defaultdict(float)
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pids.get(e["pid"], ""):
            continue
        nm = e["name"]
        if nm.startswith("jit_"):
            continue
        total += e["dur"]
        per[nm] += e["dur"]
    print(f"total device: {total/STEPS:.0f} us/step over {STEPS} steps")
    for nm, us in sorted(per.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us/STEPS:9.1f} us/step  {nm[:110]}")


if __name__ == "__main__":
    main()
