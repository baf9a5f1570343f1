"""Write a tiny synthetic llama GGUF (random weights, toy vocab) for
end-to-end CLI verification. Usage: python tests/make_tiny_gguf.py out.gguf
[--q4]."""

import sys

import numpy as np

from tpu_llm.io import gguf as gg


def build(path: str, quant: bool = False, seed: int = 0):
    rng = np.random.default_rng(seed)
    dim, hidden, L, H, KVH, V = 64, 96, 2, 4, 2, 32
    kv = dim // H * KVH
    s = lambda *sh: (rng.standard_normal(sh) * 0.08).astype(np.float32)

    tokens = ["<unk>", "<s>", "</s>", "▁", "a", "b", "c", "▁ab", "ab", "bc",
              "▁abc"] + [f"tok{i}" for i in range(V - 11)]
    scores = np.asarray(
        [0, 0, 0, 0, 0, 0, 0, 5.0, 4.0, 3.0, 6.0] + [0.0] * (V - 11), np.float32
    )
    meta = {
        "general.architecture": "llama",
        "llama.block_count": L,
        "llama.embedding_length": dim,
        "llama.feed_forward_length": hidden,
        "llama.attention.head_count": H,
        "llama.attention.head_count_kv": KVH,
        "llama.context_length": 128,
        "llama.rope.freq_base": 10000.0,
        "llama.attention.layer_norm_rms_epsilon": 1e-5,
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }
    wt = (lambda a: (a, gg.GGML_Q4_0)) if quant else (lambda a: a)
    tensors = {
        "token_embd.weight": s(V, dim),
        "output_norm.weight": 1.0 + 0.1 * s(dim),
        "output.weight": wt(s(V, dim)),
    }
    for i in range(L):
        tensors[f"blk.{i}.attn_norm.weight"] = 1.0 + 0.1 * s(dim)
        tensors[f"blk.{i}.ffn_norm.weight"] = 1.0 + 0.1 * s(dim)
        tensors[f"blk.{i}.attn_q.weight"] = wt(s(dim, dim))
        tensors[f"blk.{i}.attn_k.weight"] = wt(s(kv, dim))
        tensors[f"blk.{i}.attn_v.weight"] = wt(s(kv, dim))
        tensors[f"blk.{i}.attn_output.weight"] = wt(s(dim, dim))
        tensors[f"blk.{i}.ffn_gate.weight"] = wt(s(hidden, dim))
        tensors[f"blk.{i}.ffn_up.weight"] = wt(s(hidden, dim))
        tensors[f"blk.{i}.ffn_down.weight"] = wt(s(dim, hidden))
    gg.write_gguf(path, meta, tensors)
    print(f"wrote {path}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny.gguf"
    build(out, quant="--q4" in sys.argv)
