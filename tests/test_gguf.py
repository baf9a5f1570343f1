import numpy as np
import pytest

from tpu_llm.io import gguf as gg
from tpu_llm.quant import blocks


def test_roundtrip_metadata_and_tensors(tmp_path):
    path = str(tmp_path / "t.gguf")
    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 32)).astype(np.float32)
    b = rng.standard_normal((8, 64)).astype(np.float32)
    meta = {
        "general.architecture": "llama",
        "llama.block_count": 2,
        "llama.embedding_length": 32,
        "llama.rope.freq_base": 10000.0,
        "flag": True,
        "neg": -3,
        "tokenizer.ggml.tokens": ["<unk>", "<s>", "hello", "▁world"],
        "tokenizer.ggml.scores": np.asarray([0.0, 0.0, -1.0, -2.0], np.float32),
    }
    gg.write_gguf(path, meta, {
        "a.weight": a,
        "b.weight": (b, gg.GGML_F16),
    })

    f = gg.GGUFFile(path)
    assert f.version == 3
    assert f.metadata["general.architecture"] == "llama"
    assert f.metadata["llama.block_count"] == 2
    assert f.metadata["flag"] is True
    assert f.metadata["neg"] == -3
    assert f.metadata["tokenizer.ggml.tokens"][3] == "▁world"
    np.testing.assert_allclose(
        f.metadata["tokenizer.ggml.scores"], [0.0, 0.0, -1.0, -2.0]
    )
    assert f.tensors["a.weight"].dims == (32, 4)  # ggml order reversed
    np.testing.assert_allclose(f.array("a.weight"), a)
    np.testing.assert_allclose(f.dequantized("b.weight"), b, atol=1e-2)


def test_alignment_honored(tmp_path):
    path = str(tmp_path / "t.gguf")
    a = np.ones((3, 7), np.float32)
    gg.write_gguf(path, {"k": 1}, {"a": a, "b": a * 2}, alignment=64)
    f = gg.GGUFFile(path)
    assert f.alignment == 64
    assert f.data_offset % 64 == 0
    assert f.tensors["b"].offset % 64 == 0
    np.testing.assert_allclose(f.array("b"), a * 2)


def test_q4_0_tensor_roundtrip(tmp_path):
    path = str(tmp_path / "q.gguf")
    rng = np.random.default_rng(1)
    w = rng.standard_normal((8, 64)).astype(np.float32)  # rows of 64 = 2 blocks
    gg.write_gguf(path, {}, {"w": (w, gg.GGML_Q4_0)})
    f = gg.GGUFFile(path)
    t = f.tensors["w"]
    assert t.ggml_type == gg.GGML_Q4_0
    assert t.nbytes == 8 * 2 * blocks.Q4_0_BLOCK_BYTES
    deq = f.dequantized("w")
    assert deq.shape == (8, 64)
    # quant error bounded per block
    err = np.abs(deq - w).max()
    assert err <= np.abs(w).max() / 7.0


def test_q8_0_and_bf16(tmp_path):
    path = str(tmp_path / "q8.gguf")
    rng = np.random.default_rng(2)
    w = rng.standard_normal((4, 32)).astype(np.float32)
    gg.write_gguf(path, {}, {"w8": (w, gg.GGML_Q8_0), "wb": (w, gg.GGML_BF16)})
    f = gg.GGUFFile(path)
    np.testing.assert_allclose(f.dequantized("w8"), w, atol=np.abs(w).max() / 100)
    np.testing.assert_allclose(f.dequantized("wb"), w, atol=0.02)


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\x00" * 100)
    with pytest.raises(ValueError, match="magic"):
        gg.GGUFFile(str(p))


def test_nested_string_array(tmp_path):
    path = str(tmp_path / "s.gguf")
    gg.write_gguf(path, {"strs": ["a", "bb", "ccc"]}, {"t": np.zeros((2, 2), np.float32)})
    f = gg.GGUFFile(path)
    assert f.metadata["strs"] == ["a", "bb", "ccc"]


def test_q5_tensor_roundtrip(tmp_path):
    path = str(tmp_path / "q5.gguf")
    rng = np.random.default_rng(7)
    w = rng.standard_normal((4, 64)).astype(np.float32)
    gg.write_gguf(path, {}, {"w50": (w, gg.GGML_Q5_0), "w51": (w, gg.GGML_Q5_1)})
    f = gg.GGUFFile(path)
    assert f.tensors["w50"].nbytes == 4 * 2 * blocks.Q5_0_BLOCK_BYTES
    assert f.tensors["w51"].nbytes == 4 * 2 * blocks.Q5_1_BLOCK_BYTES
    for name in ("w50", "w51"):
        deq = f.dequantized(name)
        assert np.abs(deq - w).max() <= np.abs(w).max() / 14.0


def test_q4_1_tensor_roundtrip(tmp_path):
    path = str(tmp_path / "q41.gguf")
    rng = np.random.default_rng(3)
    w = rng.standard_normal((8, 64)).astype(np.float32) + 2.0  # offset: q4_1's case
    gg.write_gguf(path, {}, {"w": (w, gg.GGML_Q4_1)})
    f = gg.GGUFFile(path)
    t = f.tensors["w"]
    assert t.ggml_type == gg.GGML_Q4_1
    assert t.nbytes == 8 * 2 * blocks.Q4_1_BLOCK_BYTES
    deq = f.dequantized("w")
    # affine error bound: half the per-block step
    step = (w.reshape(-1, 32).max(1) - w.reshape(-1, 32).min(1)) / 15.0
    err = np.abs((deq - w).reshape(-1, 32))
    assert (err <= step[:, None] * 0.51 + 1e-3).all()


def test_truncated_file_fails_loudly(tmp_path):
    path = str(tmp_path / "t.gguf")
    w = np.ones((4, 64), np.float32)
    gg.write_gguf(path, {"k": 1}, {"w": w})
    data = open(path, "rb").read()
    cut = str(tmp_path / "cut.gguf")
    open(cut, "wb").write(data[: len(data) - 64])   # drop tensor tail
    f = gg.GGUFFile(cut)
    with pytest.raises(Exception):
        f.array("w")


def test_unsupported_version_fails(tmp_path):
    path = str(tmp_path / "v99.gguf")
    gg.write_gguf(path, {}, {"w": np.ones((2, 32), np.float32)})
    data = bytearray(open(path, "rb").read())
    data[4:8] = (99).to_bytes(4, "little")          # version field
    open(path, "wb").write(bytes(data))
    with pytest.raises(Exception):
        gg.GGUFFile(path)


def test_split_gguf_load(tmp_path):
    """llama.cpp gguf-split multi-part checkpoints: opening shard 00001
    merges every shard's tensors transparently (split.count metadata +
    -NNNNN-of-NNNNN.gguf names); decode matches the single-file model."""
    import jax.numpy as jnp

    from tests.make_tiny_gguf import build
    from tpu_llm.io import gguf as gg
    from tpu_llm.models import llama as M

    whole = str(tmp_path / "one.gguf")
    build(whole)
    g = gg.GGUFFile(whole)
    names = sorted(g.tensors)
    half = len(names) // 2
    parts = [names[:half], names[half:]]
    shard_paths = [str(tmp_path / f"m-{i+1:05d}-of-00002.gguf")
                   for i in range(2)]
    for i, (sp, group) in enumerate(zip(shard_paths, parts)):
        meta = ({k: v for k, v in g.metadata.items()} if i == 0
                else {"general.architecture": "llama"})
        meta.update({"split.no": i + 1, "split.count": 2,
                     "split.tensors.count": len(g.tensors)})
        tensors = {n: (g.dequantized(n, np.float32)
                       if g.tensors[n].ggml_type != gg.GGML_F32
                       else g.array(n))
                   for n in group}
        gg.write_gguf(sp, meta, tensors)

    merged = gg.GGUFFile(shard_paths[0])
    assert set(merged.tensors) == set(names)
    p1, cfg1 = M.load_gguf(g)
    p2, cfg2 = M.load_gguf(merged)
    assert cfg1 == cfg2
    tok = jnp.asarray([4], jnp.int32)
    outs = []
    for p in (p1, p2):
        cache = M.init_cache(cfg1, 1, 16)
        lg, _ = M.decode_step(p, cfg1, tok, cache, jnp.asarray(0, jnp.int32))
        outs.append(np.asarray(lg))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-6)

    # opening a non-first shard is a clear error
    import pytest

    with pytest.raises(ValueError, match="00001"):
        gg.GGUFFile(shard_paths[1])
