"""Property-based tests (hypothesis): codec round-trips that unit tests'
fixed vectors can't sweep.

- Block quant codecs: quantize->dequantize error bounded by each format's
  step size on arbitrary float blocks (including constants, huge ranges,
  negatives, zeros).
- BPE tokenizer: encode->decode is byte-identity for any text expressible
  in the vocab (full single-byte coverage + byte fallback).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from tpu_llm.quant import blocks


finite = st.floats(min_value=-1e4, max_value=1e4, allow_nan=False,
                   allow_infinity=False, width=32)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite, min_size=32, max_size=96))
def test_q4_0_roundtrip_bounded(vals):
    x = np.asarray(vals[: (len(vals) // 32) * 32], np.float32)
    back = blocks.dequantize_q4_0(blocks.quantize_q4_0(x), x.size)
    amax = np.abs(x.reshape(-1, 32)).max(1)
    # one quantization step is amax/8 after f16 scale rounding
    bound = amax[:, None] / 8.0 * 1.03 + 1e-4
    assert (np.abs((back - x).reshape(-1, 32)) <= bound).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(finite, min_size=32, max_size=96))
def test_q4_1_roundtrip_bounded(vals):
    x = np.asarray(vals[: (len(vals) // 32) * 32], np.float32)
    back = blocks.dequantize_q4_1(blocks.quantize_q4_1(x), x.size)
    xb = x.reshape(-1, 32)
    step = (xb.max(1) - xb.min(1)) / 15.0
    # affine: half a step + f16 rounding of d and m
    bound = step[:, None] * 0.52 + np.abs(xb).max(1)[:, None] * 2e-3 + 1e-4
    assert (np.abs((back - x).reshape(-1, 32)) <= bound).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(finite, min_size=32, max_size=96))
def test_q8_0_roundtrip_bounded(vals):
    x = np.asarray(vals[: (len(vals) // 32) * 32], np.float32)
    back = blocks.dequantize_q8_0(blocks.quantize_q8_0(x), x.size)
    amax = np.abs(x.reshape(-1, 32)).max(1)
    bound = amax[:, None] / 127.0 * 1.03 + 1e-5
    assert (np.abs((back - x).reshape(-1, 32)) <= bound).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(finite, min_size=32, max_size=96))
def test_q5_0_roundtrip_bounded(vals):
    x = np.asarray(vals[: (len(vals) // 32) * 32], np.float32)
    back = blocks.dequantize_q5_0(blocks.quantize_q5_0(x), x.size)
    amax = np.abs(x.reshape(-1, 32)).max(1)
    bound = amax[:, None] / 16.0 * 1.03 + 1e-4
    assert (np.abs((back - x).reshape(-1, 32)) <= bound).all()


def _bpe_with_bytes():
    """Tokenizer whose vocab covers every single byte (plus some merges),
    so any byte string round-trips."""
    from tpu_llm.tokenizers.bpe import BPETokenizer

    tokens = [bytes([b]) for b in range(256)]
    scores = [0.0] * 256
    tokens += [b"ab", b"abc", b"the", b" th"]
    scores += [1.0, 2.0, 1.5, 1.2]
    return BPETokenizer(tokens, scores)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_bpe_roundtrip_any_bytes(data):
    tok = _bpe_with_bytes()
    assert tok.decode(tok.encode(data)) == data


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=48))
def test_bpe_roundtrip_any_text(text):
    tok = _bpe_with_bytes()
    assert tok.decode(tok.encode(text)) == text.encode("utf-8")
