"""Recorded-reality fixtures (VERDICT standing item #10): the reference
snapshot ships the REAL GPT-NeoX vocabulary twice — the HF
``tokenizer.json`` and the converted ``tokenizer.bin`` the Fortran reader
consumes (``/root/reference/ssm``). These are the only real-model
artifacts reachable in this environment, and the HF ``tokenizers`` rust
implementation (bundled with transformers, fully offline) is a true
EXTERNAL implementation to pin against.

What this buys: our gpt2-family tokenizer (score-merge + unmergeable
vocab-only entries + added-token matching + ByteLevel pre-tokenization)
produces BYTE-EXACT ids vs the rust tokenizer on the real 50277-token
vocabulary — the first component of the stack validated against reality
rather than our own writer.
"""

import os

import numpy as np
import pytest

REF = "/root/reference/ssm"
_HAVE_REF = os.path.exists(os.path.join(REF, "tokenizer.bin"))

pytestmark = pytest.mark.skipif(
    not _HAVE_REF, reason="reference snapshot not mounted")


def _hf():
    try:
        from transformers import PreTrainedTokenizerFast
    except Exception:
        pytest.skip("transformers unavailable")
    return PreTrainedTokenizerFast(
        tokenizer_file=os.path.join(REF, "tokenizer.json"))


def _ours():
    from tpu_llm.tokenizers.bpe import BPETokenizer

    return BPETokenizer.from_hf_tokenizer_json(
        os.path.join(REF, "tokenizer.json"))


CASES = [
    "The quick brown fox jumps over the lazy dog.",
    "  déjà vu — naïve café\n\ttabs",
    "Mamba is a selective state space model.",
    "print('hello, world')  # code tokens_123",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "1234567890 3.14159 -42",
    "    indented\n        more indented",
    "Multi  spaces   and    runs     of      them",
    "emoji \U0001F600 mixed 中文 text",
    "I'm won't they've she'd we'll it's",
    "line1\nline2\r\nline3\ttab",
]


def test_tokenizer_bin_reads_real_neox_vocab():
    """The real converted artifact: 50277 records, max_len 512 (the
    constants the Fortran reader sees, ssm/mamba.f90:366)."""
    from tpu_llm.tokenizers.tokenizer_bin import read_tokenizer_bin

    tokens, scores, max_len = read_tokenizer_bin(
        os.path.join(REF, "tokenizer.bin"))
    assert max_len == 512 and len(tokens) == 50277
    assert tokens[0] == b"<|endoftext|>" and tokens[1] == b"<|padding|>"
    assert tokens[2] == b"!"


def test_converter_agrees_with_reference_artifact():
    """Our tokenizer.json converter vs the reference's converted
    tokenizer.bin: byte-identical for every token the reference's
    Ġ/Ċ-only byte mapping can represent (the rest are its documented
    garbling of non-ASCII/control bytes — SURVEY §2 #26)."""
    from tpu_llm.tokenizers.tokenizer_bin import read_tokenizer_bin

    ref_tokens, _, _ = read_tokenizer_bin(os.path.join(REF, "tokenizer.bin"))
    ours = _ours()
    assert len(ours.tokens) == len(ref_tokens)
    same = sum(1 for a, b in zip(ref_tokens, ours.tokens) if a == b)
    # 47580 of 50277 are pure Ġ/Ċ/ASCII and must match exactly
    assert same >= 47000, same


def test_encode_matches_hf_rust_tokenizer():
    """BYTE-EXACT id parity with the HF rust tokenizer on the real
    vocabulary: whitespace runs (added tokens), the ByteLevel
    pre-tokenizer split, contractions, non-ASCII, emoji."""
    hf = _hf()
    ours = _ours()
    for s in CASES:
        assert ours.encode(s) == hf.encode(s), s


def test_encode_matches_hf_fuzz():
    """Printable-ASCII + whitespace fuzz: no divergence from the rust
    implementation over random strings."""
    import random
    import string

    hf = _hf()
    ours = _ours()
    rng = random.Random(7)
    alphabet = string.printable[:95] + " \n\t"
    for _ in range(40):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(1, 80)))
        assert ours.encode(s) == hf.encode(s), repr(s)


def test_native_encoder_agrees_on_real_vocab():
    """The C++ heap encoder and the python merge loop agree on the real
    50277-token vocabulary (both run per pre-tokenized piece)."""
    from tpu_llm import native

    if not native.available():
        pytest.skip("native library not built")
    ours = _ours()
    for s in CASES:
        py = ours.encode(s)
        # the native path is what encode() already used; cross-check by
        # disabling it for the reference run
        import tpu_llm.native as nat

        lib, nat._LIB = nat._LIB, None
        try:
            import unittest.mock as mock

            with mock.patch.object(nat, "available", lambda: False):
                ref = ours.encode(s)
        finally:
            nat._LIB = lib
        assert py == ref, s


def test_decode_round_trip_real_vocab():
    ours = _ours()
    for s in CASES:
        assert ours.decode(ours.encode(s)) == s.encode("utf-8"), s


def test_gguf_gpt2_lane_matches_hf_on_real_vocab(tmp_path):
    """The GGUF tokenizer lane (tokenizer.ggml.* metadata, model=gpt2)
    built from the REAL NeoX vocabulary encodes identically to the HF
    rust tokenizer — including whitespace-run added tokens, which carry
    token_type USER_DEFINED in GGUFs and must match before BPE."""
    import json

    from tpu_llm.io import gguf as gg
    from tpu_llm.tokenizers.bpe import (TOKEN_TYPE_CONTROL,
                                        TOKEN_TYPE_NORMAL,
                                        TOKEN_TYPE_USER_DEFINED,
                                        BPETokenizer)

    hf = _hf()
    with open(os.path.join(REF, "tokenizer.json")) as f:
        tk = json.load(f)
    vocab = tk["model"]["vocab"]
    n = max(vocab.values()) + 1
    for extra in tk.get("added_tokens", []):
        n = max(n, extra["id"] + 1)
    tokens = [""] * n
    types = [TOKEN_TYPE_NORMAL] * n
    for t, tid in vocab.items():
        tokens[tid] = t
    for extra in tk.get("added_tokens", []):
        tokens[extra["id"]] = extra["content"]
        types[extra["id"]] = (TOKEN_TYPE_CONTROL if extra.get("special")
                              else TOKEN_TYPE_USER_DEFINED)
    path = str(tmp_path / "neox.gguf")
    gg.write_gguf(path, {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.merges": [m if isinstance(m, str) else " ".join(m)
                                  for m in tk["model"]["merges"]],
        "tokenizer.ggml.token_type": np.asarray(types, np.int32),
        "tokenizer.ggml.bos_token_id": 0,
        "tokenizer.ggml.eos_token_id": 0,
    }, {"dummy": np.zeros((4,), np.float32)})
    tok = BPETokenizer.from_gguf(gg.GGUFFile(path))
    assert tok.add_bos is False            # gpt2-family default
    assert tok.always_match                # whitespace-run added tokens
    for s in CASES:
        assert tok.encode(s) == hf.encode(s), s


def test_tokenizer_bin_lane_round_trips_real_text():
    """The reference-parity lane (tokenizer.bin + score-merge, no
    pre-tokenizer — deliberately faithful to ssm/mamba.f90's encoder,
    which DIVERGES from HF where the reference itself does): real
    artifact, real text, byte-exact round trips."""
    from tpu_llm.tokenizers.bpe import BPETokenizer

    tok = BPETokenizer.from_tokenizer_bin(
        os.path.join(REF, "tokenizer.bin"), bos_id=0, eos_id=0)
    for s in ("Mamba is a selective state space model.",
              "The quick brown fox jumps over the lazy dog."):
        ids = tok.encode(s)
        assert ids and tok.decode(ids) == s.encode("utf-8")
