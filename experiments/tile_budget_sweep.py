"""In-model sweep of the q4 kernel tile budget: per-grid-step time is
~2.7-4us nearly independent of tile bytes (xprof: w13 43.6us/11 steps,
classifier 130us/32 steps, w2 22us/8 steps), so fewer+bigger steps should
approach the DMA floor. Monkeypatch _pick_tiles' budget/tn candidates and
time the full decode scan.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from tpu_llm.config import tinyllama_1_1b
from tpu_llm.models import llama as M
from tpu_llm.models.llama import unstack_layers
from tpu_llm.quant.convert_params import quantize_llama_params, unpack_params_int4
from tpu_llm.quant import pallas_matmul as PM

STEPS = 128


def make_pick(budget_mb, tns):
    def _pick_tiles(K, N, acc_itemsize=4, **kw):
        itemsize = 2 if acc_itemsize == 2 else 4
        budget = budget_mb * 1024 * 1024
        if tns == "fullN":
            # full-row tiles: tn = N, grid over K only -> every weight-tile
            # DMA is a contiguous byte range (tn < N reads strided chunks).
            # tk >= 256 keeps the scales block (tk/32, N) at >= 8 sublanes.
            if N % 128 == 0:
                for tk in (2048, 1024, 512, 256):
                    if K % tk == 0 and tk * N * itemsize <= budget:
                        return tk, N
            return PM._orig_pick_tiles(K, N, acc_itemsize, **kw)  # fallback
        if N >= 512:
            best = None
            tks = [tk for tk in range(256, min(K, 8192) + 1, 256) if K % tk == 0]
            if not tks and K % 32 == 0:
                tks = [tk for tk in (32, 64, 128) if K % tk == 0]
            for tn in tns:
                for tk in tks:
                    if tk * tn * itemsize > budget:
                        continue
                    steps = -(-N // tn) * (K // tk)
                    key = (steps, -(tk * tn))
                    if best is None or key < best[0]:
                        best = (key, tk, tn)
            if best is not None:
                return best[1], best[2]
            return None, None
        tn = PM._pick_tile(N, (256, 128))
        if tn is None:
            return None, None
        for tk_cand in (2048, 1024, 512, 256, 128, 64, 32):
            if K % tk_cand == 0 and tk_cand * tn * itemsize <= budget:
                return tk_cand, tn
        return None, tn
    return _pick_tiles


def bench(params, cfg, i4=True):
    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
    token = jnp.ones((1,), jnp.int32)

    @jax.jit
    def decode_n(params, token, cache, pos0):
        if i4:
            params = unpack_params_int4(params)

        def body(carry, _):
            token, cache, pos = carry
            logits, cache = M.decode_step(params, cfg, token, cache, pos)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1), ()

        (token, cache, _), _ = jax.lax.scan(
            body, (token, cache, pos0), None, length=STEPS)
        return token, cache

    t, c = decode_n(params, token, cache, jnp.int32(16))
    _ = np.asarray(t)
    t0 = time.perf_counter()
    t, c = decode_n(params, token, cache, jnp.int32(16))
    _ = np.asarray(t)
    dt = (time.perf_counter() - t0) / STEPS
    return dt


def main():
    cfg = tinyllama_1_1b()
    _, (params, _, _, _) = ge.entry()
    params = unstack_layers(quantize_llama_params(params, "q4_0", fuse=True))

    if not hasattr(PM, "_orig_pick_tiles"):
        PM._orig_pick_tiles = PM._pick_tiles
    for label, budget, tns, i4 in [
        ("base u8 r1", 4, (512, 1024), False),
        ("fullN u8 r1", 8, "fullN", False),
        ("base u8 r2", 4, (512, 1024), False),
        ("fullN u8 r2", 8, "fullN", False),
        ("base u8 r3", 4, (512, 1024), False),
        ("fullN u8 r3", 8, "fullN", False),
    ]:
        PM._pick_tiles = make_pick(budget, tns)
        try:
            dt = bench(params, cfg, i4=i4)
            print(f"{label:26s}: {dt*1e6:7.1f} us/tok -> {1/dt:6.1f} tok/s",
                  flush=True)
        except Exception as e:
            print(f"{label:26s}: FAILED {type(e).__name__} {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
