"""Honest (slope-timed) bisect of the PRODUCTION decode step.

Production config = fused wqkv/w13, unstacked layers, int4-plane q4
kernels, bf16 cache — exactly what bench.py ships. All variants run
inside one jitted lax.scan with carry-chained inputs; timing is the
two-length slope (experiments/slope_timer.py), which cancels the ~30 ms
tunnel round-trip that inflated every previous per-step number.

Variants:
  full        — M.decode_step
  no_cls      — trunk only
  cls_only    — lm_head alone
  proj_all    — per layer: wqkv, wo, w13, w2 chained (x22)
  proj_{m}    — per layer: just that matmul (x22)
  attn_only   — rope + cache update + attention einsum (x22), no matmuls
  embed_norms — embedding + norms + residuals only (x22)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/experiments")
sys.path.insert(0, "/root/repo")
from slope_timer import time_scan_body  # noqa: E402

import bench as B  # noqa: E402
from tpu_llm.config import tinyllama_1_1b  # noqa: E402
from tpu_llm.models import llama as M  # noqa: E402
from tpu_llm.quant.linear import matmul  # noqa: E402
from tpu_llm.quant.convert_params import unpack_params_int4  # noqa: E402
from tpu_llm.ops.attention import gqa_attention, update_kv_cache  # noqa: E402
from tpu_llm.ops.rope import apply_rope  # noqa: E402
from tpu_llm.ops.norms import rmsnorm  # noqa: E402

cfg = tinyllama_1_1b()
I4 = True
import os
BATCH = int(os.environ.get("BISECT_BATCH", "1"))
CACHE_DTYPE = os.environ.get("BISECT_CACHE", "bf16")


def report(label, us):
    print(f"{label:12s}: {us:8.1f} us/step -> {BATCH*1e6/us:7.1f} tok/s-equiv",
          flush=True)


def main():
    params, _ = B.build_params("q4_0")
    cdt = {"bf16": jnp.bfloat16, "f32": jnp.float32, "int8": "int8"}[CACHE_DTYPE]
    cache = M.init_cache(cfg, BATCH, 1024, dtype=cdt, stacked=False)
    token = jnp.ones((BATCH,), jnp.int32)
    pos0 = jnp.int32(16)
    prep = (lambda *a: (unpack_params_int4(a[0]),) + a[1:]) if I4 else None

    def full(c, params):
        tok, cache, pos = c
        logits, cache = M.decode_step(params, cfg, tok, cache, pos)
        return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1)

    report("full", time_scan_body(full, (token, cache, pos0), (params,),
                                  prep=prep))

    def no_cls(c, params):
        tok, cache, pos = c
        hidden, cache = M.forward(params, cfg, tok[:, None], cache, pos)
        tok = (jnp.sum(hidden) * 0).astype(jnp.int32) + tok
        return (tok, cache, pos + 1)

    report("no_cls", time_scan_body(no_cls, (token, cache, pos0), (params,),
                                    prep=prep))

    x0 = jnp.full((BATCH, 1, cfg.dim), 0.1, jnp.bfloat16)

    def cls_only(c, params):
        y = M.lm_head(params, cfg, c)
        return c * 0.9 + (jnp.mean(y) * 1e-9).astype(c.dtype)

    report("cls_only", time_scan_body(cls_only, x0, (params,), prep=prep))

    def proj_subset(keys):
        def body(c, params):
            x = c
            for lp in params["layers"]:
                for k in keys:
                    if k == "wqkv":
                        o = matmul(x, lp["wqkv"])
                        x = x * 0.9 + o[..., : cfg.dim] * 1e-9
                    elif k == "wo":
                        x = x * 0.9 + matmul(x, lp["wo"]) * 1e-9
                    elif k == "w13":
                        o = matmul(x, lp["w13"])
                        g = o[..., : cfg.hidden_dim]
                        x = x * 0.9 + (jnp.mean(o) * 1e-9).astype(x.dtype)
                        del g
                    elif k == "w2":
                        h = jnp.broadcast_to(
                            x[..., :1], x.shape[:-1] + (cfg.hidden_dim,)
                        ) * 0.01
                        x = x * 0.9 + matmul(h, lp["w2"]) * 1e-9
            return x

        return body

    x1 = jnp.full((BATCH, 1, cfg.dim), 0.1, jnp.bfloat16)
    for label, keys in (
        ("proj_all", ("wqkv", "wo", "w13", "w2")),
        ("proj_wqkv", ("wqkv",)),
        ("proj_wo", ("wo",)),
        ("proj_w13", ("w13",)),
        ("proj_w2", ("w2",)),
    ):
        report(label, time_scan_body(proj_subset(keys), x1, (params,),
                                     prep=prep))

    def attn_only(c, params):
        cache, pos = c
        positions = pos + jnp.arange(1, dtype=jnp.int32)
        q = jnp.full((BATCH, 1, cfg.n_heads, cfg.head_dim), 0.1, jnp.bfloat16)
        kv = jnp.full((BATCH, 1, cfg.n_kv_heads, cfg.head_dim), 0.1, jnp.bfloat16)
        acc = jnp.bfloat16(0)
        knew, vnew = [], []
        for i in range(cfg.n_layers):
            kc, vc = update_kv_cache(cache["k"][i], cache["v"][i],
                                     kv + acc * 0, kv, pos)
            out = gqa_attention(q, kc, vc, positions)
            acc = acc + jnp.sum(out) * 0
            knew.append(kc)
            vnew.append(vc)
        return ({"k": knew, "v": vnew}, pos + 1)

    report("attn_only", time_scan_body(attn_only, (cache, pos0), (params,),
                                       prep=prep))

    def embed_norms(c, params):
        tok, pos = c
        x = jnp.take(params["tok_emb"], tok[:, None], axis=0)
        for lp in params["layers"]:
            h = rmsnorm(x, lp["attn_norm"], cfg.norm_eps)
            x = x + h * 1e-9
            h = rmsnorm(x, lp["ffn_norm"], cfg.norm_eps)
            x = x + h * 1e-9
        x = M.apply_final_norm(params, cfg, x)
        tok = (jnp.sum(x) * 0).astype(jnp.int32) + tok
        return (tok, pos + 1)

    report("embed_norms", time_scan_body(embed_norms, (token, pos0), (params,),
                                         prep=prep))


if __name__ == "__main__":
    main()
