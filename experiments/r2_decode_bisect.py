"""Round-2 decode bisect: where do the missing ~15% go?

BENCH config (bench.py): TinyLlama-1.1B, fused wqkv/w13, unstacked
per-layer buffers, q4_0 -> int4 planes hoisted inside the jit, bf16 KV
cache, batch 1. r1 measured ~1010 tok/s vs ~1190 HBM speed-of-light
(690 MB/token @ 819 GB/s). Slope-timed variants (experiments/slope_timer
rationale: cancels the ~30 ms tunnel round trip):

  full       decode_step as benched
  no_cls     trunk only (classifier matvec removed)
  no_attn    classifier + projections + rope, attention replaced with q
  proj_only  the per-layer quantized projection chain alone
  attn_only  cache update + decode attention einsum alone
  cls_only   classifier matvec alone
  embed_rope embedding gather + rope + norms only (the "everything else")
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from tpu_llm.config import tinyllama_1_1b
from tpu_llm.models import llama as M
from tpu_llm.models.llama import _norm
from tpu_llm.ops.attention import gqa_attention, update_kv_cache
from tpu_llm.ops.rope import apply_rope
from tpu_llm.quant.convert_params import (
    fuse_llama_layers, quantize_llama_params, unpack_params_int4,
)
from tpu_llm.quant.linear import matmul

R1, R2 = 32, 160


def slope(label, step_fn, carry_init, params):
    def make_loop(length):
        @jax.jit
        def loop(params, carry):
            params = unpack_params_int4(params)

            def body(c, _):
                return step_fn(params, c), None

            c, _ = jax.lax.scan(body, carry, None, length=length)
            return c
        return loop

    loop1, loop2 = make_loop(R1), make_loop(R2)

    def sync(c):
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(c)[0]).ravel()[:1])

    for f in (loop1, loop2):
        sync(f(params, carry_init))
        sync(f(params, carry_init))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(loop1(params, carry_init))
        t1 = time.perf_counter()
        sync(loop2(params, carry_init))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (R2 - R1))
    dt = float(np.median(slopes))
    print(f"{label:12s}: {dt*1e6:8.1f} us/step -> {1/dt:7.1f} tok/s", flush=True)
    return dt


def main():
    cfg = tinyllama_1_1b()
    _, (params, _, _, _) = ge.entry()
    params = quantize_llama_params(params, "q4_0", fuse=True)
    params = M.unstack_layers(params)
    layers = params["layers"]
    cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
    token = jnp.ones((1,), jnp.int32)
    pos0 = jnp.int32(16)

    def full(p, c):
        tok, cache, pos = c
        logits, cache = M.decode_step(p, cfg, tok, cache, pos)
        return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1)

    def no_cls(p, c):
        tok, cache, pos = c
        x, cache = M.forward(p, cfg, tok[:, None], cache, pos)
        tok = jnp.argmax(x[:, 0, :32], -1).astype(jnp.int32)
        return (tok, cache, pos + 1)

    def no_attn(p, c):
        tok, pos = c
        x = jnp.take(p["tok_emb"], tok[:, None], axis=0)
        B, T, E = x.shape
        positions = pos + jnp.arange(1, dtype=jnp.int32)
        for lp in p["layers"]:
            h = _norm(cfg, x, lp, "attn")
            qkv = matmul(h, lp["wqkv"])
            q = qkv[..., :E].reshape(B, T, cfg.n_heads, cfg.head_dim)
            q = apply_rope(q, positions, cfg.rope_theta)
            attn = q.reshape(B, T, E)
            x = x + matmul(attn, lp["wo"])
            m = _norm(cfg, x, lp, "ffn")
            h13 = matmul(m, lp["w13"])
            F = cfg.hidden_dim
            from tpu_llm.ops.activations import silu
            mid = silu(h13[..., :F]) * h13[..., F:]
            x = x + matmul(mid, lp["w2"])
        x = M.apply_final_norm(p, cfg, x)
        logits = M.lm_head(p, cfg, x)[:, 0, :]
        return (jnp.argmax(logits, -1).astype(jnp.int32), pos + 1)

    def proj_only(p, c):
        x, flip = c
        for lp in p["layers"]:
            qkv = matmul(x, lp["wqkv"])
            x2 = qkv[..., :cfg.dim]
            x2 = x2 + matmul(x2, lp["wo"])
            h13 = matmul(x2, lp["w13"])
            F = cfg.hidden_dim
            x = x2 + matmul(h13[..., :F] * h13[..., F:], lp["w2"]) * 1e-3
        return (x, flip + 1)

    def attn_only(p, c):
        q, cache, pos = c
        B = 1
        q4 = q.reshape(B, 1, cfg.n_heads, cfg.head_dim)
        k4 = q4[:, :, : cfg.n_kv_heads]
        positions = pos + jnp.arange(1, dtype=jnp.int32)
        out_acc = q
        for i in range(cfg.n_layers):
            kc, vc = update_kv_cache(cache["k"][i], cache["v"][i], k4, k4, pos)
            out = gqa_attention(q4, kc, vc, positions)
            cache["k"][i] = kc
            cache["v"][i] = vc
            out_acc = out_acc + out.reshape(B, 1, cfg.dim) * 1e-3
        return (out_acc, cache, pos + 1)

    def cls_only(p, c):
        x, flip = c
        logits = M.lm_head(p, cfg, x)
        return (x + 1e-6 * jnp.tanh(logits[..., : cfg.dim]).astype(x.dtype),
                flip + 1)

    def embed_rope(p, c):
        tok, pos = c
        x = jnp.take(p["tok_emb"], tok[:, None], axis=0)
        B, T, E = x.shape
        positions = pos + jnp.arange(1, dtype=jnp.int32)
        for lp in p["layers"]:
            h = _norm(cfg, x, lp, "attn")
            q = h.reshape(B, T, cfg.n_heads, cfg.head_dim)
            q = apply_rope(q, positions, cfg.rope_theta)
            x = x + 1e-3 * q.reshape(B, T, E)
            h2 = _norm(cfg, x, lp, "ffn")
            x = x + 1e-3 * h2
        x = M.apply_final_norm(p, cfg, x)
        return (jnp.argmax(x[:, 0, :32], -1).astype(jnp.int32), pos + 1)

    x1 = jnp.ones((1, 1, cfg.dim), jnp.bfloat16) * 0.02
    slope("full", full, (token, cache, pos0), params)
    slope("no_cls", no_cls, (token, cache, pos0), params)
    slope("no_attn", no_attn, (token, pos0), params)
    slope("proj_only", proj_only, (x1, jnp.int32(0)), params)
    slope("attn_only", attn_only,
          (x1, M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False),
           pos0), params)
    slope("cls_only", cls_only, (x1, jnp.int32(0)), params)
    slope("embed_rope", embed_rope, (token, pos0), params)


if __name__ == "__main__":
    main()
