"""On-chip parity: defer_kv decode (fused append kernel, aliased planes)
vs the standard write-then-attend path, multi-step, same tokens."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()
from tpu_llm.config import LlamaConfig
from tpu_llm.models import llama as M

cfg = LlamaConfig(dim=256, hidden_dim=512, n_layers=3, n_heads=4,
                  n_kv_heads=2, vocab_size=512, seq_len=512)
rng = np.random.default_rng(0)
def s(*sh):
    return jnp.asarray((rng.standard_normal(sh) * 0.05).astype(np.float32))
layers = [
    {"attn_norm": 1.0 + 0.1 * s(cfg.dim), "ffn_norm": 1.0 + 0.1 * s(cfg.dim),
     "wq": s(cfg.dim, cfg.dim), "wk": s(cfg.dim, cfg.kv_dim),
     "wv": s(cfg.dim, cfg.kv_dim), "wo": s(cfg.dim, cfg.dim),
     "w1": s(cfg.dim, cfg.hidden_dim), "w2": s(cfg.hidden_dim, cfg.dim),
     "w3": s(cfg.dim, cfg.hidden_dim)}
    for _ in range(cfg.n_layers)
]
params = {"tok_emb": s(cfg.vocab_size, cfg.dim), "final_norm": 1.0 + 0.1 * s(cfg.dim),
          "wcls": s(cfg.dim, cfg.vocab_size), "layers": layers}

def run_impl(params, defer):
    cache = M.init_cache(cfg, 1, 512, dtype=jnp.float32, stacked=False)
    tokens = jnp.asarray([[1, 5, 9]], jnp.int32)
    _, cache = M.forward(params, cfg, tokens, cache, jnp.int32(0))
    tok = jnp.asarray([3], jnp.int32)
    outs = []
    pos = 3
    for i in range(5):
        lg, cache = M.decode_step(params, cfg, tok, cache, jnp.int32(pos + i),
                                  defer_kv=defer)
        tok = jnp.argmax(lg, -1).astype(jnp.int32)
        outs.append(lg)
    return jnp.stack(outs), cache

import functools
run = jax.jit(run_impl, static_argnums=(1,))
lg_std, c_std = run(params, False)
lg_def, c_def = run(params, True)
d = np.abs(np.asarray(lg_std) - np.asarray(lg_def)).max()
print("max |logit delta|:", d)
for i in range(cfg.n_layers):
    dk = np.abs(np.asarray(c_std["k"][i]) - np.asarray(c_def["k"][i])).max()
    dv = np.abs(np.asarray(c_std["v"][i]) - np.asarray(c_def["v"][i])).max()
    print(f"layer {i}: cache delta k={dk} v={dv}")
assert d < 2e-2, d
print("PARITY OK" if d < 2e-2 else "FAIL")
