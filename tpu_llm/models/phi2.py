"""Phi-2 2.7B loader (the reference's dev/phi2 capability, SURVEY.md §7
step 8).

Phi-2 runs through the SAME llama forward (tpu_llm/models/llama.py) with
the architecture switches: parallel attention+MLP block sharing one
LayerNorm, biases everywhere, tanh-GELU non-gated MLP, partial NeoX RoPE
(rope.dimension_count < head_dim).

GGUF "phi2" tensor names: blk.N.attn_qkv.weight/.bias (fused — split here
into wq/wk/wv for TP sharding), blk.N.attn_output, blk.N.ffn_up/ffn_down,
attn_norm(+bias), output_norm(+bias), output(+bias).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from tpu_llm.config import LlamaConfig


def config_from_gguf(gguf) -> LlamaConfig:
    g = lambda k, d=None: gguf.hparam(f"phi2.{k}", default=d)
    n_heads = g("attention.head_count")
    head_dim = g("embedding_length") // n_heads
    return LlamaConfig(
        dim=g("embedding_length"),
        hidden_dim=g("feed_forward_length"),
        n_layers=g("block_count"),
        n_heads=n_heads,
        n_kv_heads=g("attention.head_count_kv", n_heads),
        vocab_size=len(gguf.metadata.get("tokenizer.ggml.tokens", []))
        or g("vocab_size", 51200),
        seq_len=g("context_length", 2048),
        rope_theta=float(g("rope.freq_base", 10000.0)),
        norm_eps=float(g("attention.layer_norm_epsilon", 1e-5)),
        rope_variant="neox",
        rope_dims=int(g("rope.dimension_count", head_dim)),
        parallel_block=True,
        use_layernorm=True,
        use_bias=True,
        act="gelu",
        gated_mlp=False,
    )


def load_gguf(path_or_gguf, dtype_policy: str = "f32") -> Tuple[Dict, LlamaConfig]:
    from tpu_llm.io.gguf import GGUFFile
    from tpu_llm.models.llama import _load_weight, _stack

    gguf = path_or_gguf if not isinstance(path_or_gguf, str) else GGUFFile(path_or_gguf)
    cfg = config_from_gguf(gguf)
    E, KV = cfg.dim, cfg.kv_dim

    vec = lambda name: jnp.asarray(gguf.dequantized(name, np.float32))
    params: Dict = {
        "tok_emb": vec("token_embd.weight").astype(
            jnp.bfloat16 if dtype_policy in ("bf16", "native") else jnp.float32
        ),
        "final_norm": vec("output_norm.weight"),
        "final_norm_b": vec("output_norm.bias"),
        "wcls": _load_weight(gguf, "output.weight", dtype_policy),
        "bcls": vec("output.bias"),
    }

    wdt = jnp.bfloat16 if dtype_policy == "bf16" else None
    layers: Dict[str, list] = {
        k: [] for k in ("attn_norm", "attn_norm_b", "wq", "wk", "wv", "wo",
                        "bq", "bk", "bv", "bo", "w3", "b3", "w2", "b2")
    }
    for i in range(cfg.n_layers):
        layers["attn_norm"].append(vec(f"blk.{i}.attn_norm.weight"))
        layers["attn_norm_b"].append(vec(f"blk.{i}.attn_norm.bias"))
        # fused qkv: rows [q (E); k (KV); v (KV)] in the (out, in) tensor
        qkv = gguf.dequantized(f"blk.{i}.attn_qkv.weight", np.float32)
        qkv_b = gguf.dequantized(f"blk.{i}.attn_qkv.bias", np.float32)
        wq, wk, wv = qkv[:E], qkv[E : E + KV], qkv[E + KV :]
        to_w = lambda a: jnp.asarray(np.ascontiguousarray(a.T)).astype(
            wdt or jnp.float32
        )
        layers["wq"].append(to_w(wq))
        layers["wk"].append(to_w(wk))
        layers["wv"].append(to_w(wv))
        layers["bq"].append(jnp.asarray(qkv_b[:E]))
        layers["bk"].append(jnp.asarray(qkv_b[E : E + KV]))
        layers["bv"].append(jnp.asarray(qkv_b[E + KV :]))
        layers["wo"].append(_load_weight(gguf, f"blk.{i}.attn_output.weight", dtype_policy))
        layers["bo"].append(vec(f"blk.{i}.attn_output.bias"))
        layers["w3"].append(_load_weight(gguf, f"blk.{i}.ffn_up.weight", dtype_policy))
        layers["b3"].append(vec(f"blk.{i}.ffn_up.bias"))
        layers["w2"].append(_load_weight(gguf, f"blk.{i}.ffn_down.weight", dtype_policy))
        layers["b2"].append(vec(f"blk.{i}.ffn_down.bias"))

    params["layers"] = {k: _stack(v) for k, v in layers.items()}
    return params, cfg
