"""r3 follow-ups: (1) q8_0 batch-1 with bf16-packed scale planes (the
round-2 610.3 tok/s row ran f32 scales — 12.5% of its HBM traffic);
(2) int8 paged pools at serving batch through the new manual-DMA
chunk-gather kernel; (3) long-prompt prefill throughput (flash path)."""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

OUT = open("/tmp/r3_q8.jsonl", "a")
T0 = time.time()


def emit(**row):
    row["t"] = round(time.time() - T0, 1)
    print(json.dumps(row), flush=True)
    OUT.write(json.dumps(row) + "\n")
    OUT.flush()


def main():
    from fast_params import synth_q4_llama
    from tpu_llm.models import llama as M
    from tpu_llm.ops.paged_kv import PagedKV, scale_pool_width
    from tpu_llm.quant.convert_params import (fold_rope_interleave,
                                              unpack_params_int4)
    from tpu_llm.runtime.paged_engine import _paged_attn_fn, _paged_update_fn
    from tpu_llm.runtime.timing import slope_time_s

    # ---- q8_0 batch-1 scale packing ----
    p8, cfg = synth_q4_llama(fused=True, kind="q8_0")
    p8 = M.unstack_layers(p8)
    p8, cfg = fold_rope_interleave(p8, cfg)
    jax.block_until_ready(p8["layers"][0]["wqkv"].q)
    emit(stage="q8_params_ready")

    def scan_tok_s(params, *, batch=1, S=1024, pack_scales=False,
                   steps=(128, 640)):
        cache = M.init_cache(cfg, batch, S, dtype=jnp.bfloat16,
                             stacked=False)
        token = jnp.ones((batch,), jnp.int32)

        def make_run(length):
            @jax.jit
            def decode_n(params, token, cache, pos0):
                params = unpack_params_int4(params, pack_scales=pack_scales)

                def body(carry, _):
                    token, cache, pos = carry
                    logits, cache = M.decode_step(params, cfg, token, cache,
                                                  pos)
                    token = jnp.argmax(logits, -1).astype(jnp.int32)
                    return (token, cache, pos + 1), token

                (t_, c_, _), toks = jax.lax.scan(
                    body, (token, cache, pos0), None, length=length)
                return toks, c_

            def run():
                toks, _ = decode_n(params, token, cache, jnp.int32(16))
                _ = np.asarray(toks[-1])

            return run

        return batch / slope_time_s(make_run, *steps)

    import os
    if not os.environ.get("SKIP_Q8"):
        emit(metric="q8_0_b1_f32s", tok_s=round(scan_tok_s(p8), 1))
        # measured 2026-08-19: bf16 scale planes LOSE for q8_0 (511.5 vs
        # 608.7 tok/s) — unlike q4, q8's scale plane is only 1/8 of its
        # traffic and the in-kernel upcast costs more than it saves.
        emit(metric="q8_0_b1_bf16s",
             tok_s=round(scan_tok_s(p8, pack_scales="bf16"), 1))
    del p8

    # ---- int8 paged pools at serving batch (new kernel) ----
    params, cfg2 = synth_q4_llama(fused=True)
    params = M.unstack_layers(params)
    params, cfg2 = fold_rope_interleave(params, cfg2)
    jax.block_until_ready(params["layers"][0]["wqkv"].q)
    L, kvd, hkv = cfg2.n_layers, cfg2.kv_dim, cfg2.n_kv_heads
    emit(stage="q4_params_ready")

    def make_paged(length, B, bs, quant):
        S = 1024
        bpr = -(-S // bs)
        n_blocks = 1 + B * bpr
        table = jnp.asarray(
            1 + np.arange(B * bpr, dtype=np.int32).reshape(B, bpr))
        pdt = jnp.int8 if quant else jnp.bfloat16
        pstate = {
            "k": [jnp.zeros((n_blocks, bs, kvd), pdt) for _ in range(L)],
            "v": [jnp.zeros((n_blocks, bs, kvd), pdt) for _ in range(L)],
            "ks": [jnp.zeros((n_blocks, hkv, scale_pool_width(bs)),
                             jnp.float32)
                   for _ in range(L)] if quant else None,
            "vs": [jnp.zeros((n_blocks, hkv, scale_pool_width(bs)),
                             jnp.float32)
                   for _ in range(L)] if quant else None,
            "table": table, "lengths": jnp.full((B,), 16, jnp.int32),
        }
        token = jnp.ones((B,), jnp.int32)

        @jax.jit
        def decode_n(params, token, state, pos0):
            params = unpack_params_int4(params)

            def body(carry, _):
                token, state, pos = carry
                cache = {"k": [PagedKV(state["k"][i], state["v"][i],
                                       state["table"], state["lengths"],
                                       state["ks"][i] if quant else None,
                                       state["vs"][i] if quant else None)
                               for i in range(L)],
                         "v": [None] * L}
                hidden, nc = M.forward(params, cfg2, token[:, None], cache,
                                       jnp.full((B,), pos, jnp.int32),
                                       update_fn=_paged_update_fn,
                                       attn_fn=_paged_attn_fn)
                logits = M.lm_head(params, cfg2, hidden)[:, 0, :]
                token = jnp.argmax(logits, -1).astype(jnp.int32)
                state = dict(
                    state,
                    k=[kv.k_pool for kv in nc["k"]],
                    v=[kv.v_pool for kv in nc["k"]],
                    ks=[kv.k_scale for kv in nc["k"]] if quant else None,
                    vs=[kv.v_scale for kv in nc["k"]] if quant else None,
                    lengths=nc["k"][0].lengths)
                return (token, state, pos + 1), token

            (t_, s_, _), toks = jax.lax.scan(
                body, (token, pstate, pos0), None, length=length)
            return toks, s_

        def run():
            toks, _ = decode_n(params, token, pstate, jnp.int32(16))
            _ = np.asarray(toks[-1])

        return run

    for B, bs, quant in ((8, 64, True), (32, 64, True), (8, 16, False)):
        mk = functools.partial(make_paged, B=B, bs=bs, quant=quant)
        emit(metric=f"paged_b{B}_bs{bs}_{'int8' if quant else 'bf16'}",
             tok_s=round(B / slope_time_s(mk, 64, 320), 1))

    # ---- long-prompt prefill throughput (flash path, q4 weights) ----
    from tpu_llm.runtime.engine import Engine  # noqa: F401  (import check)

    for T in (512, 2048):
        def mk(length, T=T):
            cache = M.init_cache(cfg2, 1, 2048, dtype=jnp.bfloat16,
                                 stacked=False)
            toks = jnp.ones((1, T), jnp.int32)

            @jax.jit
            def prefill_n(params, toks, cache):
                params = unpack_params_int4(params)

                def body(c, _):
                    hidden, nc = M.forward(params, cfg2, toks, c,
                                           jnp.int32(0))
                    return nc, M.lm_head(params, cfg2, hidden[:, -1:, :])

                c, outs = jax.lax.scan(body, cache, None, length=length)
                return outs

            def run():
                outs = prefill_n(params, toks, cache)
                _ = np.asarray(outs[-1, 0, 0, :2])

            return run

        t = slope_time_s(mk, 2, 10)
        emit(metric=f"prefill_T{T}_b1", tok_s=round(T / t, 1),
             ms=round(t * 1e3, 2))

    emit(stage="DONE")


if __name__ == "__main__":
    main()
