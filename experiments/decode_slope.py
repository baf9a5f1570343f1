"""Honest (tunnel-corrected) full-decode-step timing + tile-policy sweep.

All prior decode numbers divided a constant ~30ms tunnel round-trip by
the step count (128 steps -> ~0.23 ms/step of bias). This harness runs
the production decode_n scan at two lengths and reports the slope.

Sweeps _pick_tiles policies by monkeypatching tpu_llm.quant.pallas_matmul
._pick_tiles (forces re-jit per policy):
  prod      — shipped policy (min grid steps under 4MB budget)
  small     — tk<=1024, tn=512 (more grid steps, deeper pipelining)
  tn256     — tn=256
  fullN     — tn = N (single n stripe, contiguous rows)  [skip N=32000]
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/experiments")
from slope_timer import time_scan_body  # noqa: E402


def make_decode(params, cfg, batch, max_seq, prompt_len, i4, steps):
    from tpu_llm.models import llama as M
    from tpu_llm.quant.convert_params import unpack_params_int4

    cache = M.init_cache(cfg, batch, max_seq, dtype=jnp.bfloat16,
                         stacked=not isinstance(params["layers"], (list, tuple)))
    token = jnp.ones((batch,), jnp.int32)

    @jax.jit
    def decode_n(params, token, cache, pos0):
        if i4:
            params = unpack_params_int4(params)

        def body(carry, _):
            token, cache, pos = carry
            logits, cache = M.decode_step(params, cfg, token, cache, pos)
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (token, cache, pos + 1), token

        (token, cache, _), toks = jax.lax.scan(
            body, (token, cache, pos0), None, length=steps)
        return toks

    return decode_n, token, cache


def measure(params, cfg, batch=1, max_seq=1024, prompt_len=16, i4=True,
            r1=64, r2=256, pairs=5):
    outs = {}
    for steps in (r1, r2):
        fn, token, cache = make_decode(params, cfg, batch, max_seq,
                                       prompt_len, i4, steps)
        outs[steps] = (fn, token, cache)

    def run(steps):
        fn, token, cache = outs[steps]
        toks = fn(params, token, cache, jnp.int32(prompt_len))
        _ = np.asarray(toks[-1])

    for s in (r1, r2):
        run(s)
        run(s)
    slopes = []
    for _ in range(pairs):
        t0 = time.perf_counter(); run(r1)
        t1 = time.perf_counter(); run(r2)
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (r2 - r1))
    ms = float(np.median(slopes) * 1e3)
    return ms


POLICIES = {}


def register_policies(orig):
    def small(K, N, acc_itemsize=4, **kw):
        tk = max((t for t in (1024, 512, 256) if K % t == 0), default=None)
        if tk is None:
            return orig(K, N, acc_itemsize, **kw)
        tn = 512 if N >= 512 else orig(K, N, acc_itemsize, **kw)[1]
        return tk, tn

    def tn256(K, N, acc_itemsize=4, **kw):
        tk = max((t for t in (2048, 1024, 512, 256) if K % t == 0), default=None)
        if tk is None or N < 256:
            return orig(K, N, acc_itemsize, **kw)
        return tk, 256

    def fullN(K, N, acc_itemsize=4, **kw):
        if N > 16384:
            return orig(K, N, acc_itemsize, **kw)
        tk = max((t for t in (256, 512, 1024)
                  if K % t == 0 and t * N * 2 <= 8 * 1024 * 1024), default=None)
        if tk is None:
            return orig(K, N, acc_itemsize, **kw)
        return tk, N

    def fullN_cls2048(K, N, acc_itemsize=4, **kw):
        if N > 16384:
            tk = max((t for t in (2048, 1024, 512) if K % t == 0), default=None)
            if tk is None:
                return orig(K, N, acc_itemsize, **kw)
            return tk, 2048
        return fullN(K, N, acc_itemsize, **kw)

    def fullN_clsfull(K, N, acc_itemsize=4, **kw):
        if N > 16384:
            tk = max((t for t in (128, 64) if K % t == 0), default=None)
            if tk is None:
                return orig(K, N, acc_itemsize, **kw)
            return tk, N
        return fullN(K, N, acc_itemsize, **kw)

    def fullN_big(K, N, acc_itemsize=4, **kw):
        # same shape rule but a 2x tile budget (tk*N*4 <= 32MB)
        if N > 16384:
            return fullN_cls2048(K, N, acc_itemsize, **kw)
        tk = max((t for t in (256, 512, 1024, 2048)
                  if K % t == 0 and t * N * 4 <= 32 * 1024 * 1024), default=None)
        if tk is None:
            return orig(K, N, acc_itemsize, **kw)
        return tk, N

    POLICIES.update(prod=orig, small=small, tn256=tn256, fullN=fullN,
                    fullN_cls2048=fullN_cls2048, fullN_clsfull=fullN_clsfull,
                    fullN_big=fullN_big)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="q4_0")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--no-i4", action="store_true")
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--prompt-len", type=int, default=16)
    ap.add_argument("--policies", default="prod,small,tn256,fullN")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import bench as B
    from tpu_llm.config import tinyllama_1_1b
    import tpu_llm.quant.pallas_matmul as PM

    cfg = tinyllama_1_1b()
    params, _ = B.build_params(args.quant)
    register_policies(PM._pick_tiles)

    for name in args.policies.split(","):
        PM._pick_tiles = POLICIES[name]
        try:
            ms = measure(params, cfg, batch=args.batch, i4=not args.no_i4,
                         max_seq=args.max_seq, prompt_len=args.prompt_len)
            print(f"{name:8s}: {ms:7.3f} ms/step -> {args.batch/ms*1e3:7.1f} tok/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s}: FAILED {type(e).__name__}: {e}", flush=True)
    PM._pick_tiles = POLICIES["prod"]


if __name__ == "__main__":
    main()
