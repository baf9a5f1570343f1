"""Kernel VPU-cost bisect on device timestamps (chain_trace harness —
valid for pallas: BlockSpec DMAs re-stream HBM every call, no VMEM
caching).

The i4 and q8 kernels both process ~600G values/s (chain_trace.py) —
value-rate-bound, not byte-bound. Variants isolate which VPU pass costs:

  read      — DMA only (touch one sublane row)          [floor]
  widen     — dot(x, v.astype(bf16)), NO scale          [+ convert chain]
  reshape3d — production: reshape (tk/32,32,tn) * s[:,None,:] + reshape
  repeat2d  — w = v.astype(bf16) * repeat(s, 32, axis=0) [no 3D reshape]
  sxfirst   — scale bf16 cast hoisted, mult in one fused expr
  q8ref     — q8_0 production kernel                     [reference]

Shapes: w13 (2048x11264). i4 plane storage created in-program.
"""

import functools
import gzip
import glob
import json
import re
import collections

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llm.quant.qtensor import quantize_tensor, to_int4

CHAIN = 64
K, N = 2048, 11264
TK, TN = 2048, 1024
TRACE_DIR = "/tmp/xprof_vpu"


def kernel(x_ref, q_ref, s_ref, o_ref, *, mode):
    k_step = pl.program_id(2)
    tk, tn = TK, TN
    if mode == "read":
        rows = x_ref.shape[0]
        acc = (q_ref[:rows, :tn].astype(jnp.int32).astype(jnp.float32)
               + x_ref[:, :1].astype(jnp.float32))
    elif mode == "widen":
        w = q_ref[:].astype(jnp.bfloat16)
        acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    elif mode == "reshape3d":
        vals = q_ref[:].astype(jnp.bfloat16)
        s = s_ref[:].astype(jnp.bfloat16)
        w = (vals.reshape(tk // 32, 32, tn) * s[:, None, :]).reshape(tk, tn)
        acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    elif mode == "repeat2d":
        vals = q_ref[:].astype(jnp.bfloat16)
        s = jnp.repeat(s_ref[:].astype(jnp.bfloat16), 32, axis=0)
        acc = jnp.dot(x_ref[:], vals * s, preferred_element_type=jnp.float32)
    elif mode == "sxfirst":
        s = jnp.repeat(s_ref[:], 32, axis=0)  # f32 repeat
        w = (q_ref[:].astype(jnp.float32) * s).astype(jnp.bfloat16)
        acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    elif mode == "pltpu_rep":
        s = pltpu.repeat(s_ref[:], 32, axis=0)
        w = (q_ref[:].astype(jnp.float32) * s).astype(jnp.bfloat16)
        acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    elif mode == "f32dot":
        # no explicit bf16 cast: MXU ingests f32 operands (default
        # precision), saving one full VPU pass over the weight tile
        s = jnp.repeat(s_ref[:], 32, axis=0)
        w = q_ref[:].astype(jnp.float32) * s
        acc = jax.lax.dot_general(
            x_ref[:].astype(jnp.float32), w,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    elif mode == "sxbf16":
        # bf16 repeat + bf16 multiply (scales pre-cast, 2-per-lane ops)
        s = jnp.repeat(s_ref[:].astype(jnp.bfloat16), 32, axis=0)
        w = q_ref[:].astype(jnp.bfloat16) * s
        acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = acc

    @pl.when(k_step > 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def make_call(mode, kind):
    qrow = K if kind != "q4_0" else K // 2

    def call(x, q, s):
        rows = x.shape[0]
        return pl.pallas_call(
            functools.partial(kernel, mode=mode),
            grid=(1, -(-N // TN), K // TK),
            out_shape=jax.ShapeDtypeStruct((rows, N), jnp.float32),
            in_specs=[
                pl.BlockSpec((rows, TK), lambda b, n, k: (b, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TK if kind != "q4_0" else TK // 2, TN),
                             lambda b, n, k: (k, n), memory_space=pltpu.VMEM),
                pl.BlockSpec((TK // 32, TN), lambda b, n, k: (k, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows, TN), lambda b, n, k: (b, n),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, q, s)

    return call


def main():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    qt = quantize_tensor(w, "q4_0")
    qt8 = quantize_tensor(w, "q8_0")
    xb = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)

    from tpu_llm.quant.pallas_matmul import qmatmul_pallas

    variants = {}
    for mode in ("widen", "sxfirst", "pltpu_rep", "f32dot", "sxbf16"):
        call = make_call(mode, "i4")

        def prog_fn(x, q, s, call=call):
            qi = to_int4_planes(q)
            c = x
            for _ in range(CHAIN):
                out = call(c, qi, s)
                c = (x + out[:, :K] * 1e-30).astype(x.dtype)
            return c

        variants[mode] = (jax.jit(prog_fn), (qt.q, qt.scales))

    def q8_prog(x, q, s):
        from tpu_llm.quant.qtensor import QTensor

        qt = QTensor(q=q, scales=s, kind="q8_0")
        c = x
        for _ in range(CHAIN):
            out = qmatmul_pallas(c, qt)
            c = (x + out[:, :K] * 1e-30).astype(x.dtype)
        return c

    variants["q8ref"] = (jax.jit(q8_prog), (qt8.q, qt8.scales))

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
        nb = qt8.q.size + qt8.scales.size * 4 if name == "q8ref" else qbytes
        print(f"{name:10s}: {total/CHAIN:7.1f} us/call "
              f"({nb/(total/CHAIN)/1e3:5.0f} GB/s, "
              f"{K*N/(total/CHAIN)/1e3:5.0f} Gval/s)  "
              + "  ".join(f"{k}={v/CHAIN:.1f}" for k, v in
                          sorted(per.items(), key=lambda x: -x[1])[:3]),
              flush=True)


def to_int4_planes(qu8):
    from tpu_llm.quant.qtensor import unpack_q4

    return unpack_q4(qu8).astype(jnp.int4)


if __name__ == "__main__":
    main()
