"""Measure the multi-block-chunked paged decode kernel (r3) on chip.

r3_paged_gap.py found per-grid-step overhead linear in MB (bs32 = 52% of
dense, bs64 = 70%, bs256 = 97%) plus a ~0.37ms/step scatter cost at b8.
This runs the SAME paged_full variants as r3_paged_gap after the kernel
rewrite (cb sub-blocks per grid step), plus a flat-1D-index scatter
variant of paged_update_tokens.
"""
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

OUT = open("/tmp/r3_paged_chunked.jsonl", "a")
T0 = time.time()


def emit(**row):
    row["t"] = round(time.time() - T0, 1)
    print(json.dumps(row), flush=True)
    OUT.write(json.dumps(row) + "\n")
    OUT.flush()


def _flat_update(kc, vc, k, v, offset):
    """paged_update_tokens with ONE flat-row-index scatter per pool."""
    from tpu_llm.ops.paged_kv import PagedKV

    kv = kc
    B, T = k.shape[0], k.shape[1]
    bs = kv.block_size
    N = kv.k_pool.shape[0]
    kvd = kv.k_pool.shape[-1]
    pos0 = jnp.asarray(offset, jnp.int32)
    if pos0.ndim == 0:
        pos0 = jnp.full((B,), pos0, jnp.int32)
    positions = pos0[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    MB = kv.block_table.shape[1]
    block_idx = positions // bs
    block_ids = jnp.take_along_axis(
        kv.block_table, jnp.clip(block_idx, 0, MB - 1), axis=1)
    block_ids = jnp.where(block_idx < MB, block_ids, 0)
    rows = (block_ids * bs + positions % bs).reshape(B * T)
    lengths = jnp.maximum(kv.lengths, positions[:, -1] + 1)
    kp = kv.k_pool.reshape(N * bs, kvd).at[rows].set(
        k.reshape(B * T, kvd).astype(kv.k_pool.dtype)).reshape(N, bs, kvd)
    vp = kv.v_pool.reshape(N * bs, kvd).at[rows].set(
        v.reshape(B * T, kvd).astype(kv.v_pool.dtype)).reshape(N, bs, kvd)
    return PagedKV(kp, vp, kv.block_table, lengths), None


def main():
    from fast_params import synth_q4_llama
    from tpu_llm.models import llama as M
    from tpu_llm.ops.paged_kv import PagedKV
    from tpu_llm.quant.convert_params import (fold_rope_interleave,
                                              unpack_params_int4)
    from tpu_llm.runtime.paged_engine import _paged_attn_fn, _paged_update_fn
    from tpu_llm.runtime.timing import slope_time_s

    params, cfg = synth_q4_llama(fused=True)
    params = M.unstack_layers(params)
    params, cfg = fold_rope_interleave(params, cfg)
    jax.block_until_ready(params["layers"][0]["wqkv"].q)
    emit(stage="params_ready")

    B, S, L, kvd = 8, 1024, cfg.n_layers, cfg.kv_dim
    token = jnp.ones((B,), jnp.int32)

    def make_paged(length, bs, update_fn, attn_fn):
        bpr = -(-S // bs)
        n_blocks = 1 + B * bpr
        table = jnp.asarray(
            1 + np.arange(B * bpr, dtype=np.int32).reshape(B, bpr))
        pstate = {
            "k": [jnp.zeros((n_blocks, bs, kvd), jnp.bfloat16)
                  for _ in range(L)],
            "v": [jnp.zeros((n_blocks, bs, kvd), jnp.bfloat16)
                  for _ in range(L)],
            "table": table, "lengths": jnp.full((B,), 16, jnp.int32),
        }

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
                                       update_fn=update_fn, attn_fn=attn_fn)
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

    for bs in (64, 32, 16, 128):
        mk = functools.partial(make_paged, bs=bs,
                               update_fn=_paged_update_fn,
                               attn_fn=_paged_attn_fn)
        emit(metric=f"chunked_full_bs{bs}",
             tok_s=round(B / slope_time_s(mk, 64, 320), 1))

    # flat-scatter write variant at bs64
    mk = functools.partial(make_paged, bs=64, update_fn=_flat_update,
                           attn_fn=_paged_attn_fn)
    emit(metric="chunked_flatscatter_bs64",
         tok_s=round(B / slope_time_s(mk, 64, 320), 1))

    emit(stage="DONE")


if __name__ == "__main__":
    main()
