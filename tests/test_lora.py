"""LoRA adapter merging (llama.cpp GGUF adapter format) — ecosystem
parity with `llama.cpp --lora`. The merged delta is (B @ A) * alpha/r
per base tensor, applied to dense weights exactly and to packed QTensors
through a dequantize-merge-requantize pass."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.make_tiny_gguf import build
from tpu_llm.io import gguf as gg
from tpu_llm.io.lora import apply_lora, read_lora
from tpu_llm.models import llama as M


def _write_adapter(path, deltas_spec, alpha=16.0, r=4, seed=0):
    """deltas_spec: {base_name: (out_dim, in_dim)} -> writes random A/B
    pairs; returns the exact (out, in) deltas ((B@A) * alpha/r)."""
    rng = np.random.default_rng(seed)
    meta = {"general.architecture": "llama", "general.type": "adapter",
            "adapter.type": "lora", "adapter.lora.alpha": float(alpha)}
    tensors = {}
    deltas = {}
    for base, (out_d, in_d) in deltas_spec.items():
        a = (rng.standard_normal((r, in_d)) * 0.2).astype(np.float32)
        b = (rng.standard_normal((out_d, r)) * 0.2).astype(np.float32)
        tensors[base + ".lora_a"] = a
        tensors[base + ".lora_b"] = b
        deltas[base] = (b @ a) * (alpha / r)
    gg.write_gguf(path, meta, tensors)
    return deltas


def test_read_lora_deltas(tmp_path):
    path = str(tmp_path / "ad.gguf")
    expect = _write_adapter(path, {"blk.0.attn_q.weight": (8, 16)})
    deltas, alpha = read_lora(path)
    assert alpha == 16.0
    np.testing.assert_allclose(deltas["blk.0.attn_q.weight"],
                               expect["blk.0.attn_q.weight"], rtol=1e-6)


def test_apply_lora_dense_matches_manual_merge(tmp_path):
    base = str(tmp_path / "base.gguf")
    build(base)
    params, cfg = M.load_gguf(base, dtype_policy="f32")
    ad = str(tmp_path / "ad.gguf")
    expect = _write_adapter(ad, {
        "blk.0.attn_q.weight": (cfg.dim, cfg.dim),
        "blk.1.ffn_down.weight": (cfg.dim, cfg.hidden_dim),
        "output.weight": (cfg.vocab_size, cfg.dim),
    })
    merged = apply_lora(params, ad)
    np.testing.assert_allclose(
        np.asarray(merged["layers"]["wq"][0]),
        np.asarray(params["layers"]["wq"][0])
        + expect["blk.0.attn_q.weight"].T, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(merged["layers"]["w2"][1]),
        np.asarray(params["layers"]["w2"][1])
        + expect["blk.1.ffn_down.weight"].T, rtol=1e-5, atol=1e-6)
    # untouched layer stays identical
    np.testing.assert_array_equal(np.asarray(merged["layers"]["wq"][1]),
                                  np.asarray(params["layers"]["wq"][1]))
    np.testing.assert_allclose(
        np.asarray(merged["wcls"]),
        np.asarray(params["wcls"]) + expect["output.weight"].T,
        rtol=1e-5, atol=1e-6)


def test_apply_lora_quantized_requantizes(tmp_path):
    """QTensor targets merge through dequantize + requantize: the result
    approximates dense-merge within the kind's quantization error."""
    base = str(tmp_path / "base.gguf")
    build(base, quant=True)
    pq, cfg = M.load_gguf(base, dtype_policy="native")
    p32, _ = M.load_gguf(base, dtype_policy="f32")
    ad = str(tmp_path / "ad.gguf")
    expect = _write_adapter(ad, {"blk.0.attn_q.weight": (cfg.dim, cfg.dim)})
    from tpu_llm.quant.qtensor import QTensor, dequantize, qmap

    merged_q = apply_lora(pq, ad)
    assert isinstance(merged_q["layers"]["wq"], QTensor)
    got = np.asarray(dequantize(
        qmap(lambda p: p[0], merged_q["layers"]["wq"]), jnp.float32))
    want = (np.asarray(dequantize(
        qmap(lambda p: p[0], pq["layers"]["wq"]), jnp.float32))
        + expect["blk.0.attn_q.weight"].T)
    err = np.abs(got - want).max()
    scale = np.abs(want).max()
    assert err < 0.1 * scale            # q4_0 blockwise quantization delta


def test_cli_lora_changes_generation(tmp_path, capsys):
    from tpu_llm.runtime.cli import main

    base = str(tmp_path / "base.gguf")
    build(base)
    ad = str(tmp_path / "ad.gguf")
    # a large classifier delta reliably changes the greedy stream
    _write_adapter(ad, {"output.weight": (32, 64)}, alpha=64.0, seed=3)
    capsys.readouterr()
    assert main(["-m", base, "-p", "abc", "-n", "8"]) == 0
    plain = capsys.readouterr().out.splitlines()[0]
    assert main(["-m", base, "-p", "abc", "-n", "8", "--lora", ad]) == 0
    with_lora = capsys.readouterr().out.splitlines()[0]
    assert plain != with_lora


def test_lora_rejects_bad_targets(tmp_path):
    base = str(tmp_path / "base.gguf")
    build(base)
    params, _ = M.load_gguf(base, dtype_policy="f32")
    ad = str(tmp_path / "ad.gguf")
    _write_adapter(ad, {"blk.0.nope.weight": (8, 8)})
    with pytest.raises(ValueError, match="unsupported LoRA target"):
        apply_lora(params, ad)
    notad = str(tmp_path / "plain.gguf")
    build(notad)
    with pytest.raises(ValueError, match="no .lora_a"):
        read_lora(notad)


def test_serve_cli_lora(tmp_path, capsys):
    import json

    from tpu_llm.runtime.serve_cli import main

    base = str(tmp_path / "base.gguf")
    build(base)
    ad = str(tmp_path / "ad.gguf")
    _write_adapter(ad, {"output.weight": (32, 64)}, alpha=64.0, seed=3)
    capsys.readouterr()
    assert main(["-m", base, "-p", "abc", "-n", "5", "--batch", "1"]) == 0
    plain = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert main(["-m", base, "-p", "abc", "-n", "5", "--batch", "1",
                 "--lora", ad]) == 0
    lora = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")]
    assert plain[0]["completion"] != lora[0]["completion"]
