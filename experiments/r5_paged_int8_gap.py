"""Paged-int8 batch-32 gap attribution (VERDICT r4 #6): the r4 row said
"kernel-grid/DMA granularity at deep positions plus harness difference"
— two conflated causes. Here all four configs run through the IDENTICAL
slope-timed scan harness (same batch, same prompt depth, same measured
window): paged-int8, dense-int8, paged-bf16, dense-bf16.

If dense-int8-in-this-harness lands near the paged-int8 number, the old
gap was harness; if it stays near the old 14.5k comparator, the gap is
the paged kernel's granularity at depth.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

if not os.environ.get("TPU_LLM_NO_COMPILE_CACHE"):
    from tpu_llm.runtime.compile_cache import enable_compile_cache
    enable_compile_cache()

from tpu_llm.config import tinyllama_1_1b
from tpu_llm.models import llama as M
from tpu_llm.ops.paged_kv import PagedKV
from tpu_llm.quant.convert_params import unpack_params_int4
from tpu_llm.runtime.bench_cli import _build, _decode_tok_s, _round_up
from tpu_llm.runtime.paged_engine import (_paged_attn_fn, _paged_update_fn,
                                          scale_pool_width,
                                          scale_rows_per_block)
from tpu_llm.runtime.timing import slope_time_s

B = int(os.environ.get("GAP_B", "32"))
PROMPT = int(os.environ.get("GAP_PROMPT", "512"))
STEPS = int(os.environ.get("GAP_STEPS", "48"))


def emit(**row):
    print(json.dumps(row), flush=True)


def paged_tok_s(params, cfg, quantized: bool, bs: int):
    span = PROMPT + 5 * STEPS + 1
    bpr = -(-span // bs)
    n_layers = len(params["layers"])
    kvd = cfg.kv_dim
    n_blocks = 1 + B * bpr
    table = np.zeros((B, bpr), np.int32)
    table[:] = 1 + np.arange(B * bpr).reshape(B, bpr)
    pool_dtype = jnp.int8 if quantized else jnp.bfloat16
    srows = n_blocks * scale_rows_per_block(cfg.n_kv_heads)
    swidth = scale_pool_width(bs)
    state = {
        "k": [jnp.zeros((n_blocks, bs, kvd), pool_dtype)
              for _ in range(n_layers)],
        "v": [jnp.zeros((n_blocks, bs, kvd), pool_dtype)
              for _ in range(n_layers)],
        "ks": [jnp.ones((srows, swidth), jnp.float32)
               for _ in range(n_layers)] if quantized else None,
        "vs": [jnp.ones((srows, swidth), jnp.float32)
               for _ in range(n_layers)] if quantized else None,
        "table": jnp.asarray(table),
        "lengths": jnp.full((B,), PROMPT, jnp.int32),
    }
    token = jnp.ones((B,), jnp.int32)

    def make_run(length):
        @jax.jit
        def decode_n(params, token, state, pos0):
            params = unpack_params_int4(params)

            def body(carry, _):
                token, state, pos = carry
                q = state.get("ks") is not None
                cache = {
                    "k": [PagedKV(state["k"][i], state["v"][i],
                                  state["table"], state["lengths"],
                                  state["ks"][i] if q else None,
                                  state["vs"][i] if q else None)
                          for i in range(n_layers)],
                    "v": [None] * n_layers,
                }
                offsets = jnp.full((B,), pos, jnp.int32)
                hidden, nc = M.forward(params, cfg, token[:, None], cache,
                                       offsets, update_fn=_paged_update_fn,
                                       attn_fn=_paged_attn_fn)
                logits = M.lm_head(params, cfg, hidden)[:, 0, :]
                token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                state = dict(
                    state,
                    k=[kv.k_pool for kv in nc["k"]],
                    v=[kv.v_pool for kv in nc["k"]],
                    ks=[kv.k_scale for kv in nc["k"]] if q else None,
                    vs=[kv.v_scale for kv in nc["k"]] if q else None,
                    lengths=nc["k"][0].lengths,
                )
                return (token, state, pos + 1), token

            (token_, state_, _), toks = jax.lax.scan(
                body, (token, state, pos0), None, length=length)
            return toks, state_

        def run():
            toks, _ = decode_n(params, token, state, jnp.int32(PROMPT))
            _ = np.asarray(toks[-1])

        return run

    return B / slope_time_s(make_run, STEPS, STEPS * 5)


def main():
    cfg = tinyllama_1_1b()
    params = _build("q4_0")
    span = PROMPT + 5 * STEPS + 1
    dense_seq = max(_round_up(span, 128), 256)

    rows = {}
    rows["paged_bf16_bs16"] = paged_tok_s(params, cfg, False, 16)
    rows["paged_int8_bs32"] = paged_tok_s(params, cfg, True, 32)
    rows["dense_bf16"] = _decode_tok_s(params, cfg, STEPS, B, dense_seq,
                                       PROMPT, cache_dtype=jnp.bfloat16)
    rows["dense_int8"] = _decode_tok_s(params, cfg, STEPS, B, dense_seq,
                                       PROMPT, cache_dtype="int8")
    for k, v in rows.items():
        emit(config=k, batch=B, prompt=PROMPT, tok_s=round(v, 1))
    emit(int8_gap_pct=round(
        100 * (1 - rows["paged_int8_bs32"] / rows["dense_int8"]), 1),
        bf16_gap_pct=round(
        100 * (1 - rows["paged_bf16_bs16"] / rows["dense_bf16"]), 1))


if __name__ == "__main__":
    main()
