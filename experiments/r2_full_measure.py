"""ONE-process, one-claim measurement session for chip return (round 2).

Runs, in risk order (known-good first), writing JSON lines to
/tmp/r2_measure.jsonl as each result lands so a late hang loses nothing:

 1. q4_0 batch-1 headline (bench.py-equivalent scan, slope-timed)
 2. bf16-scale-plane variant
 3. int8-KV batch-1
 4. q8_0 / bf16 weight formats batch-1
 5. batch 8 / batch 32 (int8 KV) serving scans
 6. paged vs dense decode at batch 8 (block-table kernel)
 7. mamba f32/bf16
 8. fused-append (defer_kv) variants LAST (never scan-run on chip;
    a Mosaic hang here must not cost the rest)

Total device time ~a few minutes + compiles. NEVER kill this mid-run
(memory/axon-wedge-recovery).
"""
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

OUT = open("/tmp/r2_measure.jsonl", "a")
T0 = time.time()


def emit(**row):
    row["t"] = round(time.time() - T0, 1)
    print(json.dumps(row), flush=True)
    OUT.write(json.dumps(row) + "\n")
    OUT.flush()


def main():
    from fast_params import synth_q4_llama
    from tpu_llm.models import llama as M
    from tpu_llm.quant.convert_params import (fold_rope_interleave,
                                              unpack_params_int4)
    from tpu_llm.runtime.timing import slope_time_s

    params, cfg = synth_q4_llama(fused=True)
    params = M.unstack_layers(params)
    params, cfg = fold_rope_interleave(params, cfg)
    jax.block_until_ready(params["layers"][0]["wqkv"].q)
    emit(stage="params_ready")

    def scan_tok_s(params, cfg, *, batch=1, S=1024, defer=False,
                   pack_scales=False, cache_dtype=jnp.bfloat16,
                   steps=(128, 640), i4=True):
        cache = M.init_cache(cfg, batch, S, dtype=cache_dtype, stacked=False)
        token = jnp.ones((batch,), jnp.int32)

        def make_run(length):
            @jax.jit
            def decode_n(params, token, cache, pos0):
                if i4:
                    params = unpack_params_int4(params,
                                                pack_scales=pack_scales)

                def body(carry, _):
                    token, cache, pos = carry
                    logits, cache = M.decode_step(params, cfg, token, cache,
                                                  pos, defer_kv=defer)
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

    # 1-3: batch-1 q4_0 ladder
    emit(metric="q4_0_b1", tok_s=round(scan_tok_s(params, cfg), 1))
    emit(metric="q4_0_b1_bf16s",
         tok_s=round(scan_tok_s(params, cfg, pack_scales="bf16"), 1))
    emit(metric="q4_0_b1_int8kv",
         tok_s=round(scan_tok_s(params, cfg, cache_dtype="int8"), 1))

    # 4: other weight formats (fresh synth to keep HBM bounded)
    from fast_params import synth_q4_llama as synth
    p8, _ = synth(fused=True, kind="q8_0")
    p8 = M.unstack_layers(p8)
    p8, _ = fold_rope_interleave(p8, cfg)
    emit(metric="q8_0_b1",
         tok_s=round(scan_tok_s(p8, cfg, i4=False), 1))
    del p8

    # 5: serving batches
    emit(metric="q4_0_b8",
         tok_s=round(scan_tok_s(params, cfg, batch=8, steps=(64, 320)), 1))
    emit(metric="q4_0_b32_int8kv",
         tok_s=round(scan_tok_s(params, cfg, batch=32, cache_dtype="int8",
                                steps=(64, 320)), 1))

    # 6: paged vs dense at batch 8 (block-table kernel vs flat planes)
    from tpu_llm.ops.paged_kv import PagedKV
    from tpu_llm.runtime.paged_engine import _paged_attn_fn, _paged_update_fn

    B, bs = 8, 64
    span = 16 + 5 * 64 + 1
    bpr = -(-1024 // bs)
    L = cfg.n_layers
    kvd = cfg.kv_dim
    n_blocks = 1 + B * bpr
    table = jnp.asarray(
        1 + np.arange(B * bpr, dtype=np.int32).reshape(B, bpr))
    pstate = {
        "k": [jnp.zeros((n_blocks, bs, kvd), jnp.bfloat16) for _ in range(L)],
        "v": [jnp.zeros((n_blocks, bs, kvd), jnp.bfloat16) for _ in range(L)],
        "table": table, "lengths": jnp.full((B,), 16, jnp.int32),
    }
    token = jnp.ones((B,), jnp.int32)

    def make_paged(length):
        @jax.jit
        def decode_n(params, token, state, pos0):
            params = unpack_params_int4(params)

            def body(carry, _):
                token, state, pos = carry
                cache = {"k": [PagedKV(state["k"][i], state["v"][i],
                                       state["table"], state["lengths"])
                               for i in range(L)],
                         "v": [None] * L}
                hidden, nc = M.forward(params, cfg, token[:, None], cache,
                                       jnp.full((B,), pos, jnp.int32),
                                       update_fn=_paged_update_fn,
                                       attn_fn=_paged_attn_fn)
                logits = M.lm_head(params, cfg, hidden)[:, 0, :]
                token = jnp.argmax(logits, -1).astype(jnp.int32)
                state = {"k": [kv.k_pool for kv in nc["k"]],
                         "v": [kv.v_pool for kv in nc["k"]],
                         "table": state["table"],
                         "lengths": nc["k"][0].lengths}
                return (token, state, pos + 1), token

            (t_, s_, _), toks = jax.lax.scan(
                body, (token, pstate, pos0), None, length=length)
            return toks, s_

        def run():
            toks, _ = decode_n(params, token, pstate, jnp.int32(16))
            _ = np.asarray(toks[-1])

        return run

    emit(metric="q4_0_b8_paged_bs64",
         tok_s=round(B / slope_time_s(make_paged, 64, 320), 1))

    # 7: mamba
    try:
        from tpu_llm.runtime.bench_cli import (_build_mamba,
                                               _decode_tok_s_mamba)
        from tpu_llm.models.mamba import cast_weights

        mp, mcfg = _build_mamba()
        emit(metric="mamba_f32_b1",
             tok_s=round(_decode_tok_s_mamba(mp, mcfg, 128, 1), 1))
        emit(metric="mamba_bf16_b1",
             tok_s=round(_decode_tok_s_mamba(cast_weights(mp), mcfg, 128, 1), 1))
        del mp
    except Exception as e:  # keep the risky tail runnable
        emit(stage="mamba_failed", err=str(e)[:200])

    # 8: fused-append variants LAST
    emit(metric="q4_0_b1_defer",
         tok_s=round(scan_tok_s(params, cfg, defer=True), 1))
    emit(metric="q4_0_b1_defer_bf16s",
         tok_s=round(scan_tok_s(params, cfg, defer=True,
                                pack_scales="bf16"), 1))
    emit(stage="DONE")


if __name__ == "__main__":
    main()
