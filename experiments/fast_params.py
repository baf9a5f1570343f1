"""Device-side synthetic quantized params: random q4_0 planes built with
on-device RNG — no host quantization pass, no GB-scale tunnel transfers.
Throughput benching is weight-content independent, so these measure the
same kernels as GGUF-loaded weights. Cuts experiment setup from ~30-60min
(ge.entry + host quantize + re-upload) to seconds."""
import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tpu_llm.config import tinyllama_1_1b
from tpu_llm.quant.qtensor import QTensor


def synth_qtensor(key, K, N, kind="q4_0"):
    kq, ks = jax.random.split(key)
    if kind == "q4_0":
        q = jax.random.randint(kq, (K // 2, N), 0, 256, jnp.int32).astype(jnp.uint8)
    else:
        q = jax.random.randint(kq, (K, N), -127, 128, jnp.int32).astype(jnp.int8)
    scales = jax.random.uniform(ks, (K // 32, N), jnp.float32, 0.001, 0.01)
    return QTensor(q=q, scales=scales, kind=kind)


def synth_q4_llama(cfg=None, fused=True, kind="q4_0", seed=0):
    cfg = cfg or tinyllama_1_1b()
    key = jax.random.PRNGKey(seed)
    ks = iter(jax.random.split(key, 16))
    L, E, F, V, KV = cfg.n_layers, cfg.dim, cfg.hidden_dim, cfg.vocab_size, cfg.kv_dim

    def stack_qt(key, K, N):
        keys = jax.random.split(key, L)
        qs = [synth_qtensor(k, K, N, kind) for k in keys]
        return QTensor(q=jnp.stack([x.q for x in qs]),
                       scales=jnp.stack([x.scales for x in qs]), kind=kind)

    layers = {
        "attn_norm": jnp.ones((L, E), jnp.float32),
        "ffn_norm": jnp.ones((L, E), jnp.float32),
    }
    if fused:
        layers["wqkv"] = stack_qt(next(ks), E, E + 2 * KV)
        layers["w13"] = stack_qt(next(ks), E, 2 * F)
    else:
        layers["wq"] = stack_qt(next(ks), E, E)
        layers["wk"] = stack_qt(next(ks), E, KV)
        layers["wv"] = stack_qt(next(ks), E, KV)
        layers["w1"] = stack_qt(next(ks), E, F)
        layers["w3"] = stack_qt(next(ks), E, F)
    layers["wo"] = stack_qt(next(ks), E, E)
    layers["w2"] = stack_qt(next(ks), F, E)
    params = {
        "tok_emb": (jax.random.normal(next(ks), (V, E), jnp.bfloat16) * 0.02),
        "final_norm": jnp.ones((E,), jnp.float32),
        "wcls": synth_qtensor(next(ks), E, V, kind),
        "layers": layers,
    }
    return params, cfg
