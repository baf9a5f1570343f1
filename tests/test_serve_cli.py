"""llm-serve: offline batched serving front end."""

import json

from tests.make_tiny_gguf import build


def _run(argv, capsys):
    from tpu_llm.runtime.serve_cli import main

    capsys.readouterr()                      # drain builder/loader chatter
    assert main(argv) == 0
    out = capsys.readouterr().out.strip().splitlines()
    return [json.loads(ln) for ln in out if ln.startswith("{")]


def test_serve_dense_and_paged_agree(tmp_path, capsys):
    path = str(tmp_path / "tiny.gguf")
    build(path)
    base = ["-m", path, "-p", "abc", "-p", "ab", "-n", "6", "--batch", "2"]
    dense = _run(base, capsys)
    paged = _run(base + ["--paged", "--block-size", "4"], capsys)
    spec = _run(base + ["--spec", "3"], capsys)
    assert [r["completion"] for r in dense] \
        == [r["completion"] for r in paged] \
        == [r["completion"] for r in spec]
    assert all(r["n_tokens"] == 6 for r in dense)


def test_serve_prompts_file(tmp_path, capsys):
    path = str(tmp_path / "tiny.gguf")
    build(path)
    pf = tmp_path / "prompts.txt"
    pf.write_text("abc\nab\n\n")
    rows = _run(["-m", path, "-f", str(pf), "-n", "4", "--batch", "2"],
                capsys)
    assert len(rows) == 2 and rows[0]["prompt"] == "abc"


def test_serve_mamba_packed(tmp_path, capsys):
    """Mamba packed checkpoints serve through the dense engine (recurrent
    state — paged/spec don't apply)."""
    import os

    from tests.test_mamba import CFG as MCFG, make_torch_arrays
    from tpu_llm.io.mamba_ckpt import write_packed
    from tpu_llm.tokenizers.tokenizer_bin import write_tokenizer_bin

    mpath = str(tmp_path / "m.bin")
    write_packed(mpath, make_torch_arrays(5), MCFG)
    tok = str(tmp_path / "tok.bin")
    V = MCFG.vocab_size
    vocab = [bytes([97 + i]) for i in range(26)] +         [f"tok{i}".encode() for i in range(26, V)]
    write_tokenizer_bin(tok, vocab, [0.0] * V)
    rows = _run(["-m", mpath, "-s", tok, "-p", "abc", "-n", "4",
                 "--batch", "2"], capsys)
    assert rows and rows[0]["n_tokens"] == 4


def test_serve_with_draft_model(tmp_path, capsys):
    """llm-serve --draft: two-model speculation through the offline
    serving front end produces the plain greedy completions."""
    path = str(tmp_path / "m.gguf")
    build(path)
    args = ["-m", path, "-p", "abc", "-p", "ab", "-n", "10",
            "--batch", "2", "--max-seq", "64"]
    plain = _run(args, capsys)
    drafted = _run(args + ["--spec", "3", "--draft", path], capsys)
    assert [r["completion"] for r in plain] \
        == [r["completion"] for r in drafted]
