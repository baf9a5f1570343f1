"""Legacy "ak" (llama2.c-style) packed checkpoint format.

Byte layout per the reference reader (``llama2.f90:159-294``) and writer
(``load.f90:313-421``):

  header: 7 x i32 — dim, hidden_dim, n_layers, n_heads, n_kv_heads,
          vocab_size (NEGATED: llama2.c convention for an unshared
          classifier, load.f90:258,320), seq_len
  then f32 tensors, each group containing all layers consecutively:
    token_embedding (vocab, dim)
    rms_att  (L, dim)
    wq (L, dim, dim)  wk (L, kv_dim, dim)  wv (L, kv_dim, dim)
    wo (L, dim, dim)
    rms_ffn  (L, dim)
    w1 (L, hidden, dim)   w2 (L, dim, hidden)   w3 (L, hidden, dim)
    rms_final (dim,)
    wcls (vocab, dim)

(Matrix shapes given as numpy row-major (out, in) — the transpose of the
Fortran column-major declarations, same bytes.)

Note the reference's `llm --ak` ignores the header and uses compile-time
TinyLlama dims (llama2.f90:100-108); we honor the header.
"""

from __future__ import annotations

import struct
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from tpu_llm.config import LlamaConfig


def load_ak(path: str, dtype_policy: str = "f32") -> Tuple[Dict, LlamaConfig]:
    with open(path, "rb") as f:
        hdr = struct.unpack("<7i", f.read(28))
        dim, hidden, n_layers, n_heads, n_kv_heads, vocab, seq_len = hdr
        shared = vocab > 0
        vocab = abs(vocab)
        cfg = LlamaConfig(
            dim=dim, hidden_dim=hidden, n_layers=n_layers, n_heads=n_heads,
            n_kv_heads=n_kv_heads, vocab_size=vocab, seq_len=seq_len,
            tie_embeddings=shared,
        )
        kv_dim = cfg.kv_dim

        def rd(*shape):
            n = int(np.prod(shape))
            a = np.fromfile(f, dtype=np.float32, count=n)
            if a.size != n:
                raise EOFError(f"{path}: truncated at {shape}")
            return a.reshape(shape)

        wdt = jnp.bfloat16 if dtype_policy == "bf16" else jnp.float32

        def proj(a):  # (L, out, in) -> (L, in, out) for x @ W
            return jnp.asarray(np.ascontiguousarray(a.transpose(0, 2, 1))).astype(wdt)

        tok_emb = rd(vocab, dim)
        rms_att = rd(n_layers, dim)
        wq = rd(n_layers, dim, dim)
        wk = rd(n_layers, kv_dim, dim)
        wv = rd(n_layers, kv_dim, dim)
        wo = rd(n_layers, dim, dim)
        rms_ffn = rd(n_layers, dim)
        w1 = rd(n_layers, hidden, dim)
        w2 = rd(n_layers, dim, hidden)
        w3 = rd(n_layers, hidden, dim)
        rms_final = rd(dim)
        if shared:
            wcls = None
        else:
            wcls = jnp.asarray(rd(vocab, dim).T.copy()).astype(wdt)

    params = {
        "tok_emb": jnp.asarray(tok_emb).astype(wdt),
        "final_norm": jnp.asarray(rms_final),
        "wcls": wcls,
        "layers": {
            "attn_norm": jnp.asarray(rms_att),
            "ffn_norm": jnp.asarray(rms_ffn),
            "wq": proj(wq), "wk": proj(wk), "wv": proj(wv), "wo": proj(wo),
            "w1": proj(w1), "w2": proj(w2), "w3": proj(w3),
        },
    }
    return params, cfg


def write_ak(path: str, gguf, verbose: bool = False):
    """GGUF -> ak converter core (the reference's `load` program,
    load.f90:313-421). Tensors are written dequantized to f32 — unlike the
    reference's dtype-preserving write, which produces files its own f32
    reader cannot read back (and whose build is broken in the snapshot,
    SURVEY.md §2 #19)."""
    from tpu_llm.models.llama import config_from_gguf

    cfg = config_from_gguf(gguf)
    with open(path, "wb") as f:
        f.write(struct.pack(
            "<7i", cfg.dim, cfg.hidden_dim, cfg.n_layers, cfg.n_heads,
            cfg.n_kv_heads, -cfg.vocab_size, cfg.seq_len,
        ))

        def wr(name):
            a = gguf.dequantized(name, np.float32)
            f.write(np.ascontiguousarray(a).tobytes())
            if verbose:
                print(f"wrote {name}: {a.size}")

        wr("token_embd.weight")
        for i in range(cfg.n_layers):
            wr(f"blk.{i}.attn_norm.weight")
        for group in ("attn_q", "attn_k", "attn_v", "attn_output"):
            for i in range(cfg.n_layers):
                wr(f"blk.{i}.{group}.weight")
        for i in range(cfg.n_layers):
            wr(f"blk.{i}.ffn_norm.weight")
        for group in ("ffn_gate", "ffn_down", "ffn_up"):
            for i in range(cfg.n_layers):
                wr(f"blk.{i}.{group}.weight")
        wr("output_norm.weight")
        wr("output.weight")
