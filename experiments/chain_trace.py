"""Trace-based kernel A/B: run 64 CHAINED matmuls of one shape per variant
in one program, capture an xprof trace, and report exact device op times
(host timing through the axon tunnel has ~±7% noise; trace timestamps are
hardware truth).

Variants:
  u8_pallas   — production q4_0 kernel
  i4_pallas   — int4-plane kernel (in-program conversion)
  xla_deq     — dequantize with XLA ops + jnp.matmul (fusion baseline)
  dense_bf16  — plain bf16 matmul (DMA-pattern reference, 3.5x bytes)
  q8_pallas   — q8_0 kernel
"""

import gzip
import glob
import json
import re
import sys
import collections

import numpy as np
import jax
import jax.numpy as jnp

from tpu_llm.quant.qtensor import quantize_tensor, to_int4, dequantize
from tpu_llm.quant.pallas_matmul import qmatmul_pallas

CHAIN = 64
K, N = 2048, 11264
TRACE_DIR = "/tmp/xprof_chain"


def chained(fn, prep=None):
    @jax.jit
    def prog(x, *ws):
        ws = prep(*ws) if prep is not None else ws
        c = x
        for i in range(CHAIN):
            out = fn(c, *ws)                     # (1, N) f32
            c = (x + out[:, :K] * 1e-30).astype(x.dtype)
        return c
    return prog


def main():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    qt = quantize_tensor(w, "q4_0")
    qt8 = quantize_tensor(w, "q8_0")
    wd = jnp.asarray(w, jnp.bfloat16)
    xb = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)

    variants = {
        "u8_pallas": (chained(lambda c, q: qmatmul_pallas(c, q)), (qt,)),
        "i4_pallas": (chained(lambda c, q: qmatmul_pallas(c, q),
                              prep=lambda q: (to_int4(q),)), (qt,)),
        "xla_deq": (chained(lambda c, q: jnp.matmul(
            c, dequantize(q, jnp.bfloat16),
            preferred_element_type=jnp.float32)), (qt,)),
        "dense_bf16": (chained(lambda c, wx: jnp.matmul(
            c, wx, preferred_element_type=jnp.float32)), (wd,)),
        "q8_pallas": (chained(lambda c, q: qmatmul_pallas(c, q)), (qt8,)),
    }

    for name, (prog, ws) in variants.items():
        r = prog(xb, *ws)
        _ = np.asarray(r)
        with jax.profiler.trace(f"{TRACE_DIR}/{name}"):
            r = prog(xb, *ws)
            _ = np.asarray(r)

    qbytes = qt.q.size + qt.scales.size * 4
    for name in variants:
        path = sorted(glob.glob(
            f"{TRACE_DIR}/{name}/plugins/profile/*/*.trace.json.gz"))[-1]
        with gzip.open(path) as f:
            data = json.load(f)
        ev = data["traceEvents"]
        pids = {e["pid"]: e["args"].get("name", "") for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        total = 0.0
        per = collections.defaultdict(float)
        for e in ev:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            if "TPU" not in pids.get(e["pid"], ""):
                continue
            nm = e["name"]
            if nm.startswith("jit_"):
                continue
            total += e["dur"]
            per[re.match(r"([a-zA-Z_\-.]+)", nm).group(1)] += e["dur"]
        nb = (K * N * 2 if name == "dense_bf16"
              else qt8.q.size + qt8.scales.size * 4 if name == "q8_pallas"
              else qbytes)
        print(f"{name:11s}: {total/CHAIN:7.1f} us/call "
              f"({nb/(total/CHAIN)/1e3:5.0f} GB/s)  "
              + "  ".join(f"{k}={v/CHAIN:.1f}" for k, v in
                          sorted(per.items(), key=lambda x: -x[1])[:4]),
              flush=True)


if __name__ == "__main__":
    main()
