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
