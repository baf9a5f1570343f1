"""Write synthetic llama GGUFs for end-to-end verification.

``build``: tiny (2-layer) model + toy vocab for CLI smoke tests.
``build_mid``: mid-sized (6-layer, ~15M param) model with a peaked output
distribution — the independent-validation stand-in for a real checkpoint
(VERDICT r1 item 2: no llama-family GGUF is reachable in this
environment, so cross-dtype ppl deltas and golden generations are pinned
against this model instead; the weights are deterministic in the seed).

Usage: python tests/make_tiny_gguf.py out.gguf [--q4|--mid].
"""

import sys

import numpy as np

from tpu_llm.io import gguf as gg


def build(path: str, quant: bool = False, seed: int = 0, extra_meta=None):
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
    if extra_meta:
        meta.update(extra_meta)
    gg.write_gguf(path, meta, tensors)
    print(f"wrote {path}")


def build_mid(path: str, seed: int = 7):
    """Mid-sized llama: dim 384, 6 layers, 6 heads (GQA 3 kv), ffn 1024,
    vocab 1024 (~15M params). The classifier is correlated with the
    embedding (tied-ish) and scaled so the output distribution is PEAKED —
    quantization error then shifts ppl measurably instead of vanishing
    into a near-uniform softmax."""
    rng = np.random.default_rng(seed)
    dim, hidden, L, H, KVH, V = 384, 1024, 6, 6, 3, 1024
    kv = dim // H * KVH
    s = lambda *sh: (rng.standard_normal(sh) * 0.03).astype(np.float32)

    tokens = ["<unk>", "<s>", "</s>"] + [f"▁w{i}" for i in range(V - 3)]
    scores = np.zeros((V,), np.float32)
    meta = {
        "general.architecture": "llama",
        "llama.block_count": L,
        "llama.embedding_length": dim,
        "llama.feed_forward_length": hidden,
        "llama.attention.head_count": H,
        "llama.attention.head_count_kv": KVH,
        "llama.context_length": 512,
        "llama.rope.freq_base": 10000.0,
        "llama.attention.layer_norm_rms_epsilon": 1e-5,
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }
    emb = s(V, dim)
    tensors = {
        "token_embd.weight": emb,
        "output_norm.weight": 1.0 + 0.1 * s(dim),
        # correlated with the embedding and upscaled: peaked logits
        "output.weight": (8.0 * emb + s(V, dim)).astype(np.float32),
    }
    for i in range(L):
        tensors[f"blk.{i}.attn_norm.weight"] = 1.0 + 0.1 * s(dim)
        tensors[f"blk.{i}.ffn_norm.weight"] = 1.0 + 0.1 * s(dim)
        tensors[f"blk.{i}.attn_q.weight"] = s(dim, dim)
        tensors[f"blk.{i}.attn_k.weight"] = s(kv, dim)
        tensors[f"blk.{i}.attn_v.weight"] = s(kv, dim)
        tensors[f"blk.{i}.attn_output.weight"] = s(dim, dim)
        tensors[f"blk.{i}.ffn_gate.weight"] = s(hidden, dim)
        tensors[f"blk.{i}.ffn_up.weight"] = s(hidden, dim)
        tensors[f"blk.{i}.ffn_down.weight"] = s(dim, hidden)
    gg.write_gguf(path, meta, tensors)
    print(f"wrote {path}")


def build_kq(path: str, seed: int = 9):
    """K-quant-eligible llama (every matmul K dim % 256 == 0), written
    with the llama.cpp Q4_K_M-style mix: q4_K everywhere, q6_K for
    ffn_down and the classifier. Exercises the K-quant loader + fused
    affine kernel end-to-end."""
    rng = np.random.default_rng(seed)
    dim, hidden, L, H, KVH, V = 256, 512, 4, 4, 2, 512
    kv = dim // H * KVH
    s = lambda *sh: (rng.standard_normal(sh) * 0.05).astype(np.float32)

    tokens = ["<unk>", "<s>", "</s>"] + [f"▁w{i}" for i in range(V - 3)]
    meta = {
        "general.architecture": "llama",
        "llama.block_count": L,
        "llama.embedding_length": dim,
        "llama.feed_forward_length": hidden,
        "llama.attention.head_count": H,
        "llama.attention.head_count_kv": KVH,
        "llama.context_length": 512,
        "llama.rope.freq_base": 10000.0,
        "llama.attention.layer_norm_rms_epsilon": 1e-5,
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": np.zeros((V,), np.float32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }
    emb = s(V, dim)
    q4k = lambda a: (a, gg.GGML_Q4_K)
    q6k = lambda a: (a, gg.GGML_Q6_K)
    tensors = {
        "token_embd.weight": emb,
        "output_norm.weight": 1.0 + 0.1 * s(dim),
        "output.weight": q6k((8.0 * emb + s(V, dim)).astype(np.float32)),
    }
    for i in range(L):
        tensors[f"blk.{i}.attn_norm.weight"] = 1.0 + 0.1 * s(dim)
        tensors[f"blk.{i}.ffn_norm.weight"] = 1.0 + 0.1 * s(dim)
        tensors[f"blk.{i}.attn_q.weight"] = q4k(s(dim, dim))
        tensors[f"blk.{i}.attn_k.weight"] = q4k(s(kv, dim))
        tensors[f"blk.{i}.attn_v.weight"] = q4k(s(kv, dim))
        tensors[f"blk.{i}.attn_output.weight"] = q4k(s(dim, dim))
        tensors[f"blk.{i}.ffn_gate.weight"] = q4k(s(hidden, dim))
        tensors[f"blk.{i}.ffn_up.weight"] = q4k(s(hidden, dim))
        tensors[f"blk.{i}.ffn_down.weight"] = q6k(s(dim, hidden))
    gg.write_gguf(path, meta, tensors)
    print(f"wrote {path}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny.gguf"
    if "--mid" in sys.argv:
        build_mid(out)
    elif "--kq" in sys.argv:
        build_kq(out)
    else:
        build(out, quant="--q4" in sys.argv)


def build_moe(path: str, seed: int = 3, quant: bool = False,
              split_names: bool = False):
    """Tiny Mixtral-style MoE llama: 2 layers, 4 experts top-2.
    ``split_names`` writes the legacy per-expert tensors
    (blk.N.ffn_gate.{e}.weight) instead of the stacked *_exps form."""
    rng = np.random.default_rng(seed)
    dim, hidden, L, H, KVH, V, EX = 64, 96, 2, 4, 2, 32, 4
    kv = dim // H * KVH
    s = lambda *sh: (rng.standard_normal(sh) * 0.08).astype(np.float32)

    tokens = ["<unk>", "<s>", "</s>", "▁", "a", "b", "c", "▁ab", "ab", "bc",
              "▁abc"] + [f"tok{i}" for i in range(V - 11)]
    meta = {
        "general.architecture": "llama",
        "llama.block_count": L,
        "llama.embedding_length": dim,
        "llama.feed_forward_length": hidden,
        "llama.attention.head_count": H,
        "llama.attention.head_count_kv": KVH,
        "llama.context_length": 128,
        "llama.expert_count": EX,
        "llama.expert_used_count": 2,
        "llama.rope.freq_base": 10000.0,
        "llama.attention.layer_norm_rms_epsilon": 1e-5,
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": np.zeros(V, np.float32),
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
        tensors[f"blk.{i}.ffn_gate_inp.weight"] = s(EX, dim)
        if split_names:
            for e in range(EX):
                tensors[f"blk.{i}.ffn_gate.{e}.weight"] = wt(s(hidden, dim))
                tensors[f"blk.{i}.ffn_up.{e}.weight"] = wt(s(hidden, dim))
                tensors[f"blk.{i}.ffn_down.{e}.weight"] = wt(s(dim, hidden))
        else:
            tensors[f"blk.{i}.ffn_gate_exps.weight"] = wt(s(EX, hidden, dim))
            tensors[f"blk.{i}.ffn_up_exps.weight"] = wt(s(EX, hidden, dim))
            tensors[f"blk.{i}.ffn_down_exps.weight"] = wt(s(EX, dim, hidden))
    gg.write_gguf(path, meta, tensors)
    print(f"wrote {path}")
