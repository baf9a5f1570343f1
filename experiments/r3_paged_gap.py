"""Round-3 bisect: where does paged decode lose vs dense at batch 8?

BASELINE round-2 rows: dense q4_0 b8 = 6689.8 tok/s, paged bs64 = 4963.1
(74%). Candidates:
  (a) the paged attention kernel itself — grid (B, MB) walks 64-row pool
      blocks where the dense kernel walks 256-row chunks (4x grid steps,
      4x smaller DMAs);
  (b) the paged cache WRITE — at[block_ids, offs].set is an XLA scatter
      into an 8MB pool per layer, vs the dense path's in-place
      dynamic_update_slice on a donated plane;
  (c) pool-list pytree plumbing (22 layers x 2 pools as separate arrays
      vs one stacked plane).

Variants (all: B=8, S=1024 logical, q4_0 weights, slope-timed scan):
  dense          — production decode_step (flash decode kernel)
  paged_full     — production paged attn + paged scatter write
  paged_noupdate — paged attn kernel, cache write skipped
  dense_pagedwrite — dense flash attn over flat planes + ALSO the paged
                    scatter (isolates scatter cost additively)
  bs sweep       — paged_full at block_size 32/64/128/256

Each emits tok/s; deltas between variants localize the loss.
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

OUT = open("/tmp/r3_paged_gap.jsonl", "a")
T0 = time.time()


def emit(**row):
    row["t"] = round(time.time() - T0, 1)
    print(json.dumps(row), flush=True)
    OUT.write(json.dumps(row) + "\n")
    OUT.flush()


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

    # -- dense baseline ---------------------------------------------------
    def make_dense(length):
        cache = M.init_cache(cfg, B, S, dtype=jnp.bfloat16, stacked=False)

        @jax.jit
        def decode_n(params, token, cache, pos0):
            params = unpack_params_int4(params)

            def body(carry, _):
                token, cache, pos = carry
                logits, cache = M.decode_step(params, cfg, token, cache, pos)
                token = jnp.argmax(logits, -1).astype(jnp.int32)
                return (token, cache, pos + 1), token

            (t_, c_, _), toks = jax.lax.scan(
                body, (token, cache, pos0), None, length=length)
            return toks, c_

        def run():
            toks, _ = decode_n(params, token, cache, jnp.int32(16))
            _ = np.asarray(toks[-1])

        return run

    emit(metric="dense_b8",
         tok_s=round(B / slope_time_s(make_dense, 64, 320), 1))

    # -- paged variants ---------------------------------------------------
    def _noop_update(kc, vc, k, v, offset):
        # keep lengths honest so attention masking matches; skip the write
        return kc, vc

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

    import functools

    for bs in (64, 32, 128, 256):
        mk = functools.partial(make_paged, bs=bs,
                               update_fn=_paged_update_fn,
                               attn_fn=_paged_attn_fn)
        emit(metric=f"paged_full_bs{bs}",
             tok_s=round(B / slope_time_s(mk, 64, 320), 1))

    mk = functools.partial(make_paged, bs=64, update_fn=_noop_update,
                           attn_fn=_paged_attn_fn)
    emit(metric="paged_noupdate_bs64",
         tok_s=round(B / slope_time_s(mk, 64, 320), 1))

    # dense attention + paged write: additive scatter cost on the dense
    # baseline (attention numerics garbage — timing only)
    from tpu_llm.ops.flash_attention import flash_decode_attention

    def _dense_attn_over_pool(q, ka, va, positions, offset):
        # ka is a PagedKV; run the DENSE kernel over the first B pool
        # blocks reshaped as a fake flat plane of length S (content is
        # irrelevant for timing; shapes/DMA volume match dense)
        kfake = jax.lax.slice_in_dim(ka.k_pool, 1, 1 + B, axis=0)
        kfake = kfake.reshape(B, -1, kvd)
        pad = S - kfake.shape[1]
        kfake = jnp.pad(kfake, ((0, 0), (0, pad), (0, 0)))
        B_, _, H, D = q.shape
        return flash_decode_attention(
            q, kfake.reshape(B, S, -1, D), kfake.reshape(B, S, -1, D),
            positions.reshape(-1))

    mk = functools.partial(make_paged, bs=64, update_fn=_paged_update_fn,
                           attn_fn=_dense_attn_over_pool)
    emit(metric="densefakeattn_pagedwrite_bs64",
         tok_s=round(B / slope_time_s(mk, 64, 320), 1))

    emit(stage="DONE")


if __name__ == "__main__":
    main()
