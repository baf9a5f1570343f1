"""Bisect the TinyLlama q4 decode step on the real chip: time jitted scan
loops of stripped-down step variants to find where the ~4.5ms goes.

Variants:
  full        — decode_step as shipped
  no_cls      — trunk only (no classifier matvec)
  no_attn     — projections+rope+norms, attention einsum replaced with q
  proj_only   — just the 7 quantized projections per layer, chained
  cls_only    — classifier matvec alone
  attn_only   — attention einsum + cache update alone
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from tpu_llm.config import tinyllama_1_1b
from tpu_llm.models import llama as M
from tpu_llm.quant.convert_params import quantize_llama_params
from tpu_llm.quant.linear import matmul

STEPS = 128


def bench(label, step_fn, carry_init, params):
    # params must be a jit ARGUMENT: closure capture bakes them into the
    # HLO as constants (600MB program -> remote-compile 413)
    @jax.jit
    def loop(params, carry):
        def body(c, _):
            return step_fn(params, c), None
        c, _ = jax.lax.scan(body, carry, None, length=STEPS)
        return c

    c = loop(params, carry_init)
    _ = np.asarray(jax.tree_util.tree_leaves(c)[0]).ravel()[:1]
    t0 = time.perf_counter()
    c = loop(params, carry_init)
    _ = np.asarray(jax.tree_util.tree_leaves(c)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{label:12s}: {dt*1e6:8.1f} us/step -> {1/dt:7.1f} tok/s", flush=True)


def main():
    cfg = tinyllama_1_1b()
    _, (params, _, _, _) = ge.entry()
    params = quantize_llama_params(params, "q4_0")
    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16)
    token = jnp.ones((1,), jnp.int32)
    pos0 = jnp.int32(16)

    # full
    def full(p, c):
        tok, cache, pos = c
        logits, cache = M.decode_step(p, cfg, tok, cache, pos)
        return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1)
    bench("full", full, (token, cache, pos0), params)

    # no classifier
    def no_cls(p, c):
        tok, cache, pos = c
        hidden, cache = M.forward(p, cfg, tok[:, None], cache, pos)
        tok = (jnp.sum(hidden) * 0).astype(jnp.int32) + tok
        return (tok, cache, pos + 1)
    bench("no_cls", no_cls, (token, cache, pos0), params)

    # classifier alone
    x = jnp.zeros((1, 1, cfg.dim), jnp.bfloat16) + 0.1
    def cls_only(p, c):
        y = M.lm_head(p, cfg, c)
        return c + (jnp.sum(y) * 0).astype(c.dtype)
    bench("cls_only", cls_only, x, params)

    # projections only (7 matmuls per layer through the scan)
    def proj_only(lp_all, c):
        def body(x, lp):
            E = cfg.dim
            q = matmul(x, lp["wq"])
            k = matmul(x, lp["wk"])
            v = matmul(x, lp["wv"])
            o = matmul(q, lp["wo"])
            g = matmul(x, lp["w1"])
            u = matmul(x, lp["w3"])
            d = matmul(g * u, lp["w2"])
            return x + o + d + (jnp.sum(k) + jnp.sum(v)) * 0, None
        y, _ = jax.lax.scan(body, c, lp_all)
        return y
    bench("proj_only", proj_only, jnp.zeros((1, cfg.dim), jnp.bfloat16) + 0.1,
          params["layers"])

    # attention + cache update alone (per layer, through the scan)
    from tpu_llm.ops.attention import gqa_attention, update_kv_cache
    kq = jnp.zeros((1, 1, cfg.n_heads, cfg.head_dim), jnp.bfloat16) + 0.1
    kkv = jnp.zeros((1, 1, cfg.n_kv_heads, cfg.head_dim), jnp.bfloat16) + 0.1
    def attn_only(p, c):
        cache, pos = c
        positions = pos + jnp.arange(1, dtype=jnp.int32)
        def body(carry, kv):
            kc, vc = kv
            kc, vc = update_kv_cache(kc, vc, kkv, kkv, pos)
            out = gqa_attention(kq, kc, vc, positions)
            return carry + jnp.sum(out) * 0, (kc, vc)
        s, (knew, vnew) = jax.lax.scan(
            body, jnp.bfloat16(0), (cache["k"], cache["v"])
        )
        return ({"k": knew, "v": vnew}, pos + 1)
    bench("attn_only", attn_only, (cache, pos0), params)


if __name__ == "__main__":
    main()
