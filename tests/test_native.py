"""Native C++ host library vs the pure-Python/numpy fallbacks."""

import os
import subprocess

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native_lib():
    lib_path = os.path.join(ROOT, "native", "libtpu_llm_native.so")
    src = os.path.join(ROOT, "native", "src", "tpu_llm_native.cpp")
    if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
        r = subprocess.run(["make", "native"], cwd=ROOT, capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr[-500:]}")
    from tpu_llm import native

    native._TRIED = False
    native._LIB = None
    if not native.available():
        pytest.skip("native lib not loadable")
    return native


def test_f16_to_f32(native_lib):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000).astype(np.float16)
    # include specials
    x[0:6] = [0.0, -0.0, np.inf, -np.inf, 6e-5, 6e-8]
    got = native_lib.f16_to_f32(x.view(np.uint16))
    np.testing.assert_array_equal(got, x.astype(np.float32))


@pytest.mark.parametrize("kind", ["q4_0", "q8_0"])
def test_repack_matches_numpy(native_lib, kind):
    from tpu_llm.quant import blocks
    from tpu_llm.quant import qtensor as qt

    rng = np.random.default_rng(1)
    rows, row_len = 48, 128
    w = rng.standard_normal((rows, row_len)).astype(np.float32)
    quant = blocks.quantize_q4_0 if kind == "q4_0" else blocks.quantize_q8_0
    raw = np.frombuffer(quant(w.reshape(-1)), np.uint8)

    os.environ["TPU_LLM_DISABLE_NATIVE"] = "1"
    native_lib._TRIED = False
    native_lib._LIB = None
    try:
        if kind == "q4_0":
            q_py, s_py = qt._split_ggml_q4_0(raw, rows, row_len)
        else:
            q_py, s_py = qt._split_ggml_q8_0(raw, rows, row_len)
    finally:
        del os.environ["TPU_LLM_DISABLE_NATIVE"]
        native_lib._TRIED = False
        native_lib._LIB = None

    fn = native_lib.repack_q4_0 if kind == "q4_0" else native_lib.repack_q8_0
    q_c, s_c = fn(raw, rows, row_len)
    np.testing.assert_array_equal(np.asarray(q_c), np.asarray(q_py))
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_py))


def test_bpe_matches_python(native_lib):
    from tests.test_tokenizer import toy_tokenizer

    tok = toy_tokenizer()
    for text in ["hello", "hello world", "hello ", "hexllo", "", "w", "woworld"]:
        got = native_lib.bpe_encode(text.encode(), tok.tokens, tok.scores)
        os.environ["TPU_LLM_DISABLE_NATIVE"] = "1"
        native_lib._TRIED = False
        native_lib._LIB = None
        try:
            expected = tok.encode(text)
        finally:
            del os.environ["TPU_LLM_DISABLE_NATIVE"]
            native_lib._TRIED = False
            native_lib._LIB = None
        assert got == expected, text


def test_bpe_random_fuzz(native_lib):
    """Fuzz: heap-based C++ merge must equal the rescan-everything Python
    merge on random vocabs/texts (tie-breaking included)."""
    from tpu_llm.tokenizers.bpe import BPETokenizer

    rng = np.random.default_rng(2)
    alphabet = [bytes([c]) for c in b"abcd"]
    merges = [b"ab", b"cd", b"abcd", b"bc", b"abc", b"bcd", b"aa", b"dd"]
    tokens = alphabet + merges
    for trial in range(20):
        scores = np.round(rng.uniform(0, 5, len(tokens)) * 2) / 2  # force ties
        scores[: len(alphabet)] = 0
        tok = BPETokenizer(tokens, scores.astype(np.float32))
        text = bytes(rng.choice(list(b"abcd"), rng.integers(1, 40)).tolist())
        got = native_lib.bpe_encode(text, tok.tokens, tok.scores)
        os.environ["TPU_LLM_DISABLE_NATIVE"] = "1"
        native_lib._TRIED = False
        native_lib._LIB = None
        try:
            expected = tok.encode(text)
        finally:
            del os.environ["TPU_LLM_DISABLE_NATIVE"]
            native_lib._TRIED = False
            native_lib._LIB = None
        assert got == expected, (trial, text, scores.tolist())
