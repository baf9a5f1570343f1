import numpy as np

from tpu_llm.tokenizers.bpe import BPETokenizer
from tpu_llm.tokenizers.tokenizer_bin import read_tokenizer_bin, write_tokenizer_bin


def toy_tokenizer():
    # scores drive merge order: higher score merges first
    tokens = [b"<unk>", b"<s>", b"</s>", b"h", b"e", b"l", b"o", b" ",
              b"he", b"ll", b"hell", b"hello", b" hello", b"w", b"r", b"d",
              b"wo", b"world", b" world"]
    scores = np.asarray(
        [0, 0, 0, 0, 0, 0, 0, 0, 5.0, 4.0, 6.0, 7.0, 8.0, 0, 0, 0, 3.0, 9.0, 10.0],
        np.float32,
    )
    return BPETokenizer(tokens, scores, bos_id=1, eos_id=2)


def test_encode_greedy_score_merge():
    tok = toy_tokenizer()
    ids = tok.encode("hello")
    assert [tok.token_bytes(i) for i in ids] == [b"hello"]


def test_encode_multiword_and_decode_roundtrip():
    tok = toy_tokenizer()
    text = "hello world"
    ids = tok.encode(text)
    assert tok.decode(ids) == text.encode()


def test_trailing_whitespace_preserved():
    tok = toy_tokenizer()
    ids = tok.encode("hello ")
    assert tok.decode(ids) == b"hello "


def test_unknown_char_skipped_nonstrict():
    tok = toy_tokenizer()
    ids = tok.encode("hexllo")  # 'x' not in vocab
    assert tok.decode(ids) == b"hello"


def test_byte_fallback():
    tokens = [b"a", b"<0x78>"]  # 'x' = 0x78
    tok = BPETokenizer(tokens, np.zeros(2, np.float32))
    ids = tok.encode("ax")
    assert ids == [0, 1]


def test_tokenizer_bin_roundtrip(tmp_path):
    path = str(tmp_path / "tok.bin")
    tokens = [b"<s>", b" hi", b"bye ", "▁x".encode()]
    scores = [0.0, -1.5, 2.25, 3.0]
    write_tokenizer_bin(path, tokens, scores)
    toks, sc, max_len = read_tokenizer_bin(path)
    assert toks == tokens
    np.testing.assert_allclose(sc, scores)
    assert max_len == max(len(t) for t in tokens)


def test_from_gguf_leading_space_rewrite(tmp_path):
    from tpu_llm.io import gguf as gg

    path = str(tmp_path / "t.gguf")
    gg.write_gguf(
        path,
        {
            "tokenizer.ggml.tokens": ["<unk>", "<s>", "▁he", "l▁lo"],
            "tokenizer.ggml.scores": np.asarray([0, 0, 1.0, 2.0], np.float32),
            "tokenizer.ggml.bos_token_id": 1,
        },
        {"t": np.zeros((2, 2), np.float32)},
    )
    tok = BPETokenizer.from_gguf(gg.GGUFFile(path))
    # leading ▁ rewritten to space (read_ggml.f90:483-503); interior kept
    assert tok.token_bytes(2) == b" he"
    assert tok.token_bytes(3) == "l▁lo".encode()
    assert tok.bos_id == 1


def test_from_hf_tokenizer_json(tmp_path):
    """NeoX converter parity with ssm/convert_tokens.py: merge-rank scores
    (score = n_merges - rank), G-dot/C-dot rewrites, added_tokens appended;
    llm-ssm --convert-tokenizer writes it as tokenizer.bin."""
    import json

    tk = {
        "model": {
            "vocab": {"h": 0, "i": 1, "Ġ": 2, "Ċ": 3, "hi": 4, "Ġhi": 5},
            "merges": ["h i", "Ġ hi"],
        },
        "added_tokens": [{"id": 6, "content": "<|end|>"}],
    }
    path = tmp_path / "tokenizer.json"
    path.write_text(json.dumps(tk))

    from tpu_llm.tokenizers.bpe import BPETokenizer

    tok = BPETokenizer.from_hf_tokenizer_json(str(path))
    assert tok.token_bytes(2) == b" "
    assert tok.token_bytes(3) == b"\n"
    assert tok.token_bytes(5) == b" hi"
    assert tok.token_bytes(6) == b"<|end|>"
    assert tok.scores[4] == 2.0  # rank 0 of 2 merges
    assert tok.scores[5] == 1.0
    assert tok.encode("hi hi") == [4, 5]

    # CLI converter path writes the reference's tokenizer.bin format
    from tpu_llm.runtime.mamba_cli import main as ssm_main

    out_bin = tmp_path / "tok.bin"
    assert ssm_main(["--convert-tokenizer", str(path), "-s", str(out_bin)]) == 0
    tok2 = BPETokenizer.from_tokenizer_bin(str(out_bin))
    assert tok2.tokens == tok.tokens
    assert tok2.encode("hi hi") == [4, 5]


def test_gpt2_style_gguf_tokenizer(tmp_path):
    """GGUF with tokenizer.ggml.model == "gpt2" (qwen2/NeoX): merge ranks
    become scores (ssm/convert_tokens.py convention) and byte-level
    markers rewrite, so greedy score-merge reproduces the BPE merges."""
    import numpy as np

    from tpu_llm.io import gguf as gg
    from tpu_llm.tokenizers.bpe import BPETokenizer

    path = str(tmp_path / "g2.gguf")
    tokens = ["<unk>", "a", "b", "c", "Ġ", "ab", "abc", "Ġab"]
    merges = ["a b", "ab c", "Ġ ab"]
    gg.write_gguf(path, {
        "general.architecture": "qwen2",
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.bos_token_id": 0,
        "tokenizer.ggml.eos_token_id": 0,
    }, {"dummy": np.zeros((4,), np.float32)})
    tok = BPETokenizer.from_gguf(gg.GGUFFile(path))
    assert tok.token_bytes(4) == b" " and tok.token_bytes(7) == b" ab"
    # earlier merges score higher -> "abc" forms via a+b then ab+c
    assert tok.encode("abc") == [6]
    assert tok.encode(" ab") == [7]
    assert tok.decode([7, 6]) == b" ababc"


def test_gpt2_byte_level_non_ascii(tmp_path):
    """The full GPT-2 byte-unicode inverse: non-ASCII ('é' stored as
    'Ã©'), tabs ('ĉ'), and special added tokens round-trip correctly."""
    import numpy as np

    from tpu_llm.io import gguf as gg
    from tpu_llm.tokenizers.bpe import BPETokenizer, _gpt2_str_to_bytes

    assert _gpt2_str_to_bytes("Ã©") == "é".encode("utf-8")
    assert _gpt2_str_to_bytes("ĉ") == b"\t"
    assert _gpt2_str_to_bytes("Ġa") == b" a"
    assert _gpt2_str_to_bytes("<|im_start|>") == b"<|im_start|>"

    path = str(tmp_path / "bl.gguf")
    toks = ["<unk>", "Ã", "©", "Ã©", "ĉ", "a", "<|im_start|>"]
    gg.write_gguf(path, {
        "general.architecture": "qwen2",
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": toks,
        "tokenizer.ggml.merges": ["Ã ©"],
        "tokenizer.ggml.bos_token_id": 0,
        "tokenizer.ggml.eos_token_id": 0,
    }, {"dummy": np.zeros((4,), np.float32)})
    tok = BPETokenizer.from_gguf(gg.GGUFFile(path))
    assert tok.token_bytes(3) == "é".encode("utf-8")
    assert tok.token_bytes(4) == b"\t"
    assert tok.encode("é") == [3]        # merge Ã+© applies
    assert tok.decode([3, 5]) == "éa".encode("utf-8")
    assert tok.encode("\t") == [4]


# ---- SentencePiece byte-fallback fidelity ------------------------------
# Modeled on the real TinyLlama/Llama-2 SPM vocab: <unk>/<s>/</s> at 0-2,
# byte tokens <0x00>..<0xFF> at 3-258 (token_type 6 = BYTE), then
# ▁-prefixed and plain pieces with negative SPM scores. The reference's
# byte-exactness concern is read_ggml.f90:483-503.

def spm_vocab():
    tokens = [b"<unk>", b"<s>", b"</s>"]
    types = [2, 3, 3]
    for b in range(256):
        tokens.append(b"<0x%02X>" % b)
        types.append(6)
    pieces = [(" ", -1.0), ("a", -2.0), ("b", -3.0), ("ab", -4.0),
              ("é", -5.0), ("café", -6.0), (" caf", -7.0), (" é", -8.0)]
    for p, s in pieces:
        tokens.append(p.encode("utf-8"))
        types.append(1)
    scores = np.zeros(len(tokens), np.float32)
    for i, (_, s) in enumerate(pieces):
        scores[259 + i] = s
    return tokens, scores, types


def spm_tok(**kw):
    tokens, scores, types = spm_vocab()
    return BPETokenizer(tokens, scores, bos_id=1, eos_id=2,
                        token_types=types, **kw)


def test_byte_fallback_merges_to_piece():
    """'é' is absent as raw initial char (utf-8 0xC3 0xA9 -> two byte
    tokens) but present as a piece: the merge across byte tokens must fire
    in BOTH the python fallback and the native encoder."""
    import tpu_llm.native as native

    tok = spm_tok()
    e_id = tok.tokens.index("é".encode("utf-8"))
    assert tok.encode("é") == [e_id]
    if native.available():
        ids = native.bpe_encode("é".encode(), tok.tokens, tok.scores,
                                is_byte=tok.is_byte)
        assert ids == [e_id]
    ids = tok.encode(" café")
    assert tok.decode(ids) == " café".encode("utf-8")


def test_byte_fallback_decode_emits_raw_bytes():
    """decode() of byte tokens must emit the byte, not '<0xNN>' text."""
    tok = spm_tok()
    # € = 0xE2 0x82 0xAC: not in vocab, no merge target -> three byte toks
    ids = tok.encode("€")
    assert ids == [3 + 0xE2, 3 + 0x82, 3 + 0xAC]
    assert tok.decode(ids) == "€".encode("utf-8")
    # emoji round-trip (4 bytes)
    ids = tok.encode("🙂")
    assert tok.decode(ids) == "🙂".encode("utf-8")
    # control byte round-trip
    ids = tok.encode("a\x07b")
    assert tok.decode(ids) == b"a\x07b"


def test_python_native_encoder_parity_non_ascii():
    import tpu_llm.native as native

    if not native.available():
        import pytest
        pytest.skip("native library not built")
    tok = spm_tok()
    cases = ["café", " café au lait", "é€🙂", "a\tb\x00c", "ab ab",
             "naïve — ‘quotes’", "日本語テスト", ""]
    for text in cases:
        native_ids = native.bpe_encode(text.encode(), tok.tokens, tok.scores,
                                       is_byte=tok.is_byte)
        py = _python_encode(tok, text)
        assert native_ids == py, f"diverged on {text!r}"
        assert tok.decode(py) == text.encode("utf-8")


def _python_encode(tok, text):
    """The python fallback merge loop, bypassing the native path."""
    data = text.encode("utf-8")
    ids = []
    for b in data:
        tid = tok.index.get(bytes([b]))
        if tid is None:
            tid = tok.byte_fallback.get(b)
        if tid is None:
            continue
        ids.append(tid)
    while len(ids) > 1:
        best_score, best_pos, best_id = -1e10, -1, -1
        for i in range(len(ids) - 1):
            merged = tok.tokens[ids[i]] + tok.tokens[ids[i + 1]]
            tid = tok.index.get(merged)
            if tid is not None and tok.scores[tid] > best_score:
                best_score, best_pos, best_id = float(tok.scores[tid]), i, tid
        if best_pos < 0:
            break
        ids[best_pos:best_pos + 2] = [best_id]
    return ids


def test_regular_piece_preferred_over_byte_token():
    """SentencePiece picks the ordinary piece 'a', not <0x61>, even though
    the byte token has the lower id (first-occurrence order)."""
    tok = spm_tok()
    a_id = tok.tokens.index(b"a", 259)  # the piece, not the byte token
    assert tok.encode("a") == [a_id]


def test_token_type_honored_over_surface_form():
    """A literal token spelled '<0x41>' with token_type NORMAL stays
    literal text; with type BYTE it becomes byte 0x41."""
    tokens = [b"<0x41>", b"B"]
    tok = BPETokenizer(tokens, np.zeros(2, np.float32), token_types=[1, 1])
    assert tok.token_bytes(0) == b"<0x41>"
    assert not tok.byte_fallback
    tok2 = BPETokenizer(tokens, np.zeros(2, np.float32), token_types=[6, 1])
    assert tok2.token_bytes(0) == b"A"
    assert tok2.byte_fallback == {0x41: 0}


def test_from_gguf_token_type_array(tmp_path):
    """GGUF token_type flows through; byte tokens decode as raw bytes."""
    from tpu_llm.io import gguf as gg

    tokens, scores, types = spm_vocab()
    path = str(tmp_path / "spm.gguf")
    gg.write_gguf(path, {
        "tokenizer.ggml.tokens": [t.decode("utf-8", "replace") for t in tokens],
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.token_type": np.asarray(types, np.int32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }, {"dummy": np.zeros((4,), np.float32)})
    tok = BPETokenizer.from_gguf(gg.GGUFFile(path))
    assert tok.token_bytes(3 + 0xC3) == b"\xc3"
    ids = tok.encode("é€")
    assert tok.decode(ids) == "é€".encode("utf-8")


def test_add_bos_token_metadata(tmp_path):
    """tokenizer.ggml.add_bos_token=false (qwen2 GGUFs) must suppress the
    BOS prepend throughout the serving stack."""
    import json

    from tests.make_tiny_gguf import build
    from tpu_llm.io import gguf as gg
    from tpu_llm.runtime.serve_cli import main as serve_main

    p1 = str(tmp_path / "bos.gguf")
    build(p1)
    tok1 = BPETokenizer.from_gguf(gg.GGUFFile(p1))
    assert tok1.add_bos is True                    # default

    p2 = str(tmp_path / "nobos.gguf")
    build(p2, extra_meta={"tokenizer.ggml.add_bos_token": False})
    tok2 = BPETokenizer.from_gguf(gg.GGUFFile(p2))
    assert tok2.add_bos is False

    # the serving engine sees bos_id == -1 and prompts decode one token
    # longer context-identical streams (no silent BOS)
    from tpu_llm.runtime.serve_cli import _load, build_parser, make_engine

    args = build_parser().parse_args(["-m", p2, "-p", "abc", "-n", "2"])
    params, cfg, tok = _load(args)
    eng = make_engine(args, params, cfg, tok, 64)
    assert eng.bos_id == -1


def test_add_bos_default_by_vocab_family(tmp_path):
    """When tokenizer.ggml.add_bos_token is ABSENT, default like
    llama.cpp: SPM/"llama" vocabs prepend BOS, "gpt2" byte-level vocabs
    (qwen2/NeoX) do not."""
    import numpy as np

    from tpu_llm.io import gguf as gg
    from tpu_llm.tokenizers.bpe import BPETokenizer

    path = str(tmp_path / "g2nobos.gguf")
    gg.write_gguf(path, {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": ["<unk>", "a", "b"],
        "tokenizer.ggml.merges": ["a b"],
        "tokenizer.ggml.bos_token_id": 0,
        "tokenizer.ggml.eos_token_id": 0,
    }, {"dummy": np.zeros((4,), np.float32)})
    assert BPETokenizer.from_gguf(gg.GGUFFile(path)).add_bos is False
    # an explicit key still wins over the family default
    path2 = str(tmp_path / "g2bos.gguf")
    gg.write_gguf(path2, {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": ["<unk>", "a", "b"],
        "tokenizer.ggml.merges": ["a b"],
        "tokenizer.ggml.bos_token_id": 0,
        "tokenizer.ggml.eos_token_id": 0,
        "tokenizer.ggml.add_bos_token": True,
    }, {"dummy": np.zeros((4,), np.float32)})
    assert BPETokenizer.from_gguf(gg.GGUFFile(path2)).add_bos is True
