import numpy as np

import jax.numpy as jnp

from tests import reference_impl as ref
from tpu_llm.io import gguf as gg
from tpu_llm.models import llama as M
from tpu_llm.models import phi2

CFG = dict(dim=48, hidden=64, L=2, H=4, V=80, rot=8, seq=16)


def build_phi2_gguf(path, seed=0):
    rng = np.random.default_rng(seed)
    d, h, L, H, V = CFG["dim"], CFG["hidden"], CFG["L"], CFG["H"], CFG["V"]
    s = lambda *sh: (rng.standard_normal(sh) * 0.08).astype(np.float32)
    meta = {
        "general.architecture": "phi2",
        "phi2.block_count": L,
        "phi2.embedding_length": d,
        "phi2.feed_forward_length": h,
        "phi2.attention.head_count": H,
        "phi2.attention.head_count_kv": H,
        "phi2.context_length": CFG["seq"],
        "phi2.attention.layer_norm_epsilon": 1e-5,
        "phi2.rope.dimension_count": CFG["rot"],
    }
    tensors = {
        "token_embd.weight": s(V, d),
        "output_norm.weight": 1.0 + 0.1 * s(d),
        "output_norm.bias": 0.1 * s(d),
        "output.weight": s(V, d),
        "output.bias": 0.1 * s(V),
    }
    for i in range(L):
        tensors[f"blk.{i}.attn_norm.weight"] = 1.0 + 0.1 * s(d)
        tensors[f"blk.{i}.attn_norm.bias"] = 0.1 * s(d)
        tensors[f"blk.{i}.attn_qkv.weight"] = s(3 * d, d)
        tensors[f"blk.{i}.attn_qkv.bias"] = 0.1 * s(3 * d)
        tensors[f"blk.{i}.attn_output.weight"] = s(d, d)
        tensors[f"blk.{i}.attn_output.bias"] = 0.1 * s(d)
        tensors[f"blk.{i}.ffn_up.weight"] = s(h, d)
        tensors[f"blk.{i}.ffn_up.bias"] = 0.1 * s(h)
        tensors[f"blk.{i}.ffn_down.weight"] = s(d, h)
        tensors[f"blk.{i}.ffn_down.bias"] = 0.1 * s(d)
    gg.write_gguf(path, meta, tensors)
    return tensors


def test_phi2_decode_matches_oracle(tmp_path):
    path = str(tmp_path / "phi2.gguf")
    tensors = build_phi2_gguf(path)
    params, cfg = phi2.load_gguf(path)

    assert cfg.parallel_block and cfg.use_layernorm and cfg.use_bias
    assert cfg.rope_dims == CFG["rot"] and cfg.act == "gelu" and not cfg.gated_mlp

    d, L = CFG["dim"], CFG["L"]
    ow = {
        "tok_emb": tensors["token_embd.weight"],
        "final_norm": tensors["output_norm.weight"],
        "final_norm_b": tensors["output_norm.bias"],
        "wcls": tensors["output.weight"],
        "bcls": tensors["output.bias"],
        "attn_norm": [tensors[f"blk.{i}.attn_norm.weight"] for i in range(L)],
        "attn_norm_b": [tensors[f"blk.{i}.attn_norm.bias"] for i in range(L)],
        "wq": [tensors[f"blk.{i}.attn_qkv.weight"][:d] for i in range(L)],
        "wk": [tensors[f"blk.{i}.attn_qkv.weight"][d : 2 * d] for i in range(L)],
        "wv": [tensors[f"blk.{i}.attn_qkv.weight"][2 * d :] for i in range(L)],
        "bq": [tensors[f"blk.{i}.attn_qkv.bias"][:d] for i in range(L)],
        "bk": [tensors[f"blk.{i}.attn_qkv.bias"][d : 2 * d] for i in range(L)],
        "bv": [tensors[f"blk.{i}.attn_qkv.bias"][2 * d :] for i in range(L)],
        "wo": [tensors[f"blk.{i}.attn_output.weight"] for i in range(L)],
        "bo": [tensors[f"blk.{i}.attn_output.bias"] for i in range(L)],
        "w3": [tensors[f"blk.{i}.ffn_up.weight"] for i in range(L)],
        "b3": [tensors[f"blk.{i}.ffn_up.bias"] for i in range(L)],
        "w2": [tensors[f"blk.{i}.ffn_down.weight"] for i in range(L)],
        "b2": [tensors[f"blk.{i}.ffn_down.bias"] for i in range(L)],
    }
    ocfg = dict(dim=d, n_layers=L, n_heads=CFG["H"], seq_len=CFG["seq"],
                rope_dims=CFG["rot"])
    oracle = ref.RefPhi2(ow, ocfg)

    cache = M.init_cache(cfg, 1, CFG["seq"])
    for pos, tok in enumerate([1, 5, 42, 7]):
        logits, cache = M.decode_step(
            params, cfg, jnp.asarray([tok], jnp.int32), cache, jnp.int32(pos)
        )
        expected = oracle.step(tok, pos)
        np.testing.assert_allclose(
            np.asarray(logits[0]), expected, rtol=3e-4, atol=3e-4,
            err_msg=f"pos {pos}",
        )
