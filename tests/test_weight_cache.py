"""Fast-reload weight cache (tpu_llm.io.weight_cache): round-trip of the
full parameter pytree incl. QTensors/bf16/fused/unstacked forms, and the
CLI integration (convert --cache-out -> llm -m cache.npz)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_llm.config import LlamaConfig
from tpu_llm.io.weight_cache import save_weight_cache, load_weight_cache
from tpu_llm.quant.qtensor import QTensor, quantize_tensor, dequantize


def _tree_equal(a, b):
    if isinstance(a, dict):
        assert set(a) == set(b)
        for k in a:
            _tree_equal(a[k], b[k])
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            _tree_equal(x, y)
    elif a is None:
        assert b is None
    elif isinstance(a, QTensor):
        assert isinstance(b, QTensor) and a.kind == b.kind
        np.testing.assert_array_equal(np.asarray(a.q), np.asarray(b.q))
        np.testing.assert_array_equal(np.asarray(a.scales), np.asarray(b.scales))
    else:
        assert a.dtype == b.dtype, (a.dtype, b.dtype)
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_weight_cache_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    cfg = LlamaConfig(dim=32, hidden_dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=2, vocab_size=64, seq_len=32)
    w = rng.standard_normal((32, 64)).astype(np.float32)
    params = {
        "tok_emb": jnp.asarray(rng.standard_normal((64, 32)), jnp.bfloat16),
        "final_norm": jnp.ones((32,), jnp.float32),
        "wcls": quantize_tensor(w.T.copy(), "q4_0"),
        "layers": {
            "attn_norm": jnp.ones((2, 32), jnp.float32),
            "wqkv": quantize_tensor(w, "q8_0"),
        },
    }
    path = str(tmp_path / "c.npz")
    save_weight_cache(path, params, cfg)
    params2, cfg2 = load_weight_cache(path)
    assert cfg2 == cfg
    _tree_equal(params, params2)


def test_weight_cache_unstacked_list_and_none(tmp_path):
    cfg = LlamaConfig(dim=16, hidden_dim=32, n_layers=2, n_heads=2,
                      n_kv_heads=2, vocab_size=32, seq_len=16)
    params = {
        "wcls": None,  # tied embeddings
        "tok_emb": jnp.ones((32, 16), jnp.float32),
        "layers": [
            {"wq": jnp.ones((16, 16), jnp.bfloat16)},
            {"wq": jnp.zeros((16, 16), jnp.bfloat16)},
        ],
    }
    path = str(tmp_path / "c.npz")
    save_weight_cache(path, params, cfg)
    params2, cfg2 = load_weight_cache(path)
    assert params2["wcls"] is None
    assert isinstance(params2["layers"], list) and len(params2["layers"]) == 2
    _tree_equal(params, params2)


def test_cli_roundtrip_via_cache(tmp_path, capfd):
    from tests.make_tiny_gguf import build
    from tpu_llm.runtime import convert_cli, cli

    gguf_path = str(tmp_path / "tiny.gguf")
    build(gguf_path)
    npz = str(tmp_path / "tiny.npz")
    tok = str(tmp_path / "tok.bin")
    assert convert_cli.main(
        ["-i", gguf_path, "--cache-out", npz, "-t", tok]) == 0
    capfd.readouterr()

    def run(model, extra=()):
        assert cli.main(["-m", model, "-p", "abc", "-n", "8", *extra]) == 0
        return capfd.readouterr().out.splitlines()[0]

    a = run(gguf_path)
    b = run(npz, ("-s", tok))
    assert a == b


def test_weight_cache_preserves_mins():
    """Affine QTensors (q4_1 / loaded q4_K) round-trip the mins plane
    through the npz cache."""
    import numpy as np

    from tpu_llm.config import LlamaConfig
    from tpu_llm.io.weight_cache import load_weight_cache, save_weight_cache
    from tpu_llm.quant.qtensor import dequantize, quantize_tensor

    rng = np.random.default_rng(8)
    cfg = LlamaConfig(dim=64, hidden_dim=96, n_layers=1, n_heads=4,
                      n_kv_heads=2, vocab_size=256, seq_len=128)
    qt = quantize_tensor(rng.normal(size=(512, 64)).astype(np.float32),
                         "q4_k")
    params = {"tok_emb": jnp.zeros((256, 64)), "final_norm": jnp.ones((64,)),
              "wcls": qt, "layers": []}
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "c.npz")
        save_weight_cache(p, params, cfg)
        loaded, _ = load_weight_cache(p)
    assert loaded["wcls"].mins is not None
    np.testing.assert_array_equal(np.asarray(dequantize(loaded["wcls"])),
                                  np.asarray(dequantize(qt)))
