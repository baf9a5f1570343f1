"""llm-server: online HTTP front end over the continuous-batching engines.

Real-socket tests: the server runs on an ephemeral localhost port with the
tiny synthetic GGUF, requests go through urllib — end-to-end through HTTP
parsing, the loop thread, engine scheduling, and (for stream=true) SSE
chunked framing.
"""

import json
import threading
import urllib.error
import urllib.request

import pytest

from tests.make_tiny_gguf import build


def _post(port, path, body, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from tpu_llm.models.llama import load_gguf
    from tpu_llm.runtime.server import serve
    from tpu_llm.tokenizers.bpe import BPETokenizer
    from tpu_llm.io.gguf import GGUFFile

    path = str(tmp_path_factory.mktemp("srv") / "tiny.gguf")
    build(path)
    gguf = GGUFFile(path)
    params, cfg = load_gguf(gguf)
    tokenizer = BPETokenizer.from_gguf(gguf)
    from argparse import Namespace

    from tpu_llm.runtime.serve_cli import make_engine

    args = Namespace(paged=False, cache_dtype="f32", batch=2, spec=0,
                     block_size=None, n_blocks=None)
    engine = make_engine(args, params, cfg, tokenizer, max_seq=64)
    httpd, loop = serve(engine, tokenizer, "127.0.0.1", 0, max_new_cap=32)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port, engine, tokenizer
    httpd.shutdown()
    loop.shutdown()


def test_completion_roundtrip(server):
    port, engine, tokenizer = server
    status, out = _post(port, "/v1/completions",
                        {"prompt": "abc", "max_tokens": 6})
    assert status == 200
    assert out["n_tokens"] == 6 and len(out["tokens"]) == 6
    assert out["completion"] == _decode(tokenizer, out["tokens"])
    assert out["ttft_s"] >= 0


def _decode(tokenizer, toks):
    out = tokenizer.decode(toks)
    return out.decode("utf-8", errors="replace") if isinstance(out, bytes) \
        else out


def test_matches_offline_engine(server, tmp_path):
    """The HTTP path must produce the same greedy tokens as driving the
    engine directly (same model, same seed)."""
    port, engine, tokenizer = server
    _, out = _post(port, "/v1/completions",
                   {"prompt": "ab", "max_tokens": 5})

    from tpu_llm.models.llama import load_gguf
    from tpu_llm.io.gguf import GGUFFile
    from tpu_llm.runtime.batching import BatchEngine, Request
    from tpu_llm.runtime.engine import ModelAdapter

    path = str(tmp_path / "tiny2.gguf")
    build(path)
    gguf = GGUFFile(path)
    params, cfg = load_gguf(gguf)
    eng = BatchEngine(params, ModelAdapter.llama(cfg), batch=2, max_seq=64)
    req = eng.submit(Request(prompt=tokenizer.encode("ab"), max_new=5))
    eng.run()
    assert out["tokens"] == req.tokens


def test_concurrent_requests_batch(server):
    """Concurrent posts share engine slots: all complete, all correct
    length, and identical prompts give identical greedy completions."""
    port, _, _ = server
    results = [None] * 4

    def go(i):
        results[i] = _post(port, "/v1/completions",
                           {"prompt": "abc", "max_tokens": 6})

    threads = [threading.Thread(target=go, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert all(r is not None for r in results)
    outs = [r[1] for r in results]
    assert all(o["tokens"] == outs[0]["tokens"] for o in outs)


def test_streaming_sse(server):
    port, _, tokenizer = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps({"prompt": "abc", "max_tokens": 4,
                         "stream": True}).encode(),
        method="POST",
    )
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        for line in r:
            line = line.strip()
            if line.startswith(b"data: ") and line != b"data: [DONE]":
                events.append(json.loads(line[6:]))
    assert events[-1]["done"] is True and events[-1]["n_tokens"] == 4
    toks = [e["token"] for e in events[:-1]]
    assert len(toks) == 4
    # concatenated stream deltas reconstruct the full decode
    text = "".join(e["text"] for e in events[:-1])
    assert text == _decode(tokenizer, toks)
    # streamed tokens match the blocking path
    _, blocking = _post(port, "/v1/completions",
                        {"prompt": "abc", "max_tokens": 4})
    assert blocking["tokens"] == toks


def test_health_and_stats(server):
    port, _, _ = server
    status, health = _get(port, "/health")
    assert status == 200 and health["ok"] is True
    _, stats = _get(port, "/stats")
    assert stats["completed"] >= 1 and stats["generated_tokens"] >= 1
    assert stats["engine"] == "BatchEngine"


def test_bad_requests(server):
    port, _, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/v1/completions", {"max_tokens": 4})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/nope", {"prompt": "x"})
    assert e.value.code == 404
    # over-long prompt: engine submit rejects, surfaced as 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/v1/completions",
              {"prompt": "abcabc" * 40, "max_tokens": 30})
    assert e.value.code == 400


def test_max_tokens_capped(server):
    """max_tokens beyond the server cap (32 here) is clamped, not an
    error — the request still completes."""
    port, _, _ = server
    status, out = _post(port, "/v1/completions",
                        {"prompt": "ab", "max_tokens": 9999})
    assert status == 200 and out["n_tokens"] <= 32


def test_openai_completion_shape(server):
    """OpenAI clients parse the /v1/completions response unchanged:
    id/object/model/choices/usage superset alongside the native fields."""
    port, _, tokenizer = server
    status, out = _post(port, "/v1/completions",
                        {"prompt": "ab", "max_tokens": 4})
    assert status == 200
    assert out["object"] == "text_completion" and out["id"].startswith("cmpl-")
    (choice,) = out["choices"]
    assert choice["text"] == out["completion"]
    assert choice["finish_reason"] in ("stop", "length")
    u = out["usage"]
    assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]
    assert u["completion_tokens"] == out["n_tokens"]


def test_openai_models_route(server):
    port, _, _ = server
    status, out = _get(port, "/v1/models")
    assert status == 200 and out["object"] == "list"
    assert out["data"][0]["object"] == "model"


def test_chat_completions(server):
    """messages render through the chat template; the reply is
    chat-shaped and matches an engine run on the segment-encoded prompt
    (scaffolding parse_special=True, bodies False — encode_chat)."""
    from tpu_llm.runtime.server import encode_chat, render_chat

    port, engine, tokenizer = server
    messages = [{"role": "user", "content": "ab"}]
    status, out = _post(port, "/v1/chat/completions",
                        {"messages": messages, "max_tokens": 4,
                         "chat_template": "plain", "stop_at_eos": False})
    assert status == 200 and out["object"] == "chat.completion"
    (choice,) = out["choices"]
    assert choice["message"]["role"] == "assistant"
    assert choice["message"]["content"] == out["completion"]

    # the prompt the engine saw is the segment encoding (this toy vocab
    # lacks most template characters, so only structure is checkable)
    prompt = render_chat(messages, "plain")
    assert prompt == "user: ab\nassistant:"
    assert encode_chat(tokenizer, messages, "plain")
    # deterministic: a second identical chat call returns the same tokens
    _, out2 = _post(port, "/v1/chat/completions",
                    {"messages": messages, "max_tokens": 4,
                     "chat_template": "plain", "stop_at_eos": False})
    assert out2["tokens"] == out["tokens"] and len(out["tokens"]) == 4


def test_chat_stream_delta_shape(server):
    port, _, _ = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        data=json.dumps({"messages": [{"role": "user", "content": "ab"}],
                         "max_tokens": 3, "stream": True,
                         "chat_template": "plain",
                         "stop_at_eos": False}).encode(),
        method="POST",
    )
    lines, events = [], []
    with urllib.request.urlopen(req, timeout=120) as r:
        for line in r:
            line = line.strip()
            if line.startswith(b"data: "):
                lines.append(line)
                if line != b"data: [DONE]":
                    events.append(json.loads(line[6:]))
    assert lines[-1] == b"data: [DONE]"
    assert events[-1]["done"] is True
    assert events[-1]["choices"][0]["finish_reason"] in ("stop", "length")
    for ev in events[:-1]:
        assert ev["object"] == "chat.completion.chunk"
        assert ev["choices"][0]["delta"]["content"] == ev["text"]


def test_stop_token_not_in_content(server):
    """When generation ends on the stop token, the EOS id must not leak
    into content/tokens/usage (OpenAI semantics — ADVICE r2 medium)."""
    port, engine, tokenizer = server
    # find what the model actually generates so we can make one of those
    # tokens "the EOS" for this test
    _, free = _post(port, "/v1/completions",
                    {"prompt": "abc", "max_tokens": 6})
    assert free["n_tokens"] == 6
    # pick a fake EOS that does not occur earlier in the greedy sequence
    # (tiny models repeat tokens; an earlier hit would shift the cut)
    cut = next(i for i in range(1, 6)
               if free["tokens"][i] not in free["tokens"][:i])
    fake_eos = free["tokens"][cut]
    old_eos = engine.eos_id
    engine.eos_id = fake_eos
    try:
        _, out = _post(port, "/v1/completions",
                       {"prompt": "abc", "max_tokens": 6,
                        "stop_at_eos": True})
        assert out["choices"][0]["finish_reason"] == "stop"
        # the engine generated tokens[:cut+1] then retired on fake_eos;
        # the visible completion excludes it — no EOS in content/counts
        assert out["tokens"] == free["tokens"][:cut]
        assert out["n_tokens"] == cut
        assert out["usage"]["completion_tokens"] == cut
        assert out["completion"] == _decode(tokenizer, free["tokens"][:cut])

        # stream path: the EOS delta is suppressed too
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": "abc", "max_tokens": 6,
                             "stop_at_eos": True, "stream": True}).encode(),
            method="POST",
        )
        events = []
        with urllib.request.urlopen(req, timeout=120) as r:
            for line in r:
                line = line.strip()
                if line.startswith(b"data: ") and line != b"data: [DONE]":
                    events.append(json.loads(line[6:]))
        assert events[-1]["done"] is True and events[-1]["n_tokens"] == cut
        assert [e["token"] for e in events[:-1]] == free["tokens"][:cut]
    finally:
        engine.eos_id = old_eos


def test_usage_counts_bos(server):
    """usage.prompt_tokens includes the BOS the engine prepends at
    admission (ADVICE r2)."""
    port, engine, tokenizer = server
    _, out = _post(port, "/v1/completions",
                   {"prompt": "ab", "max_tokens": 2})
    n_bos = 1 if getattr(engine, "bos_id", -1) >= 0 else 0
    assert out["usage"]["prompt_tokens"] == len(tokenizer.encode("ab")) + n_bos


def test_chat_stream_openai_shape(server):
    """Chat stream chunks carry the chatcmpl- id prefix and the first
    delta announces role=assistant (ADVICE r2)."""
    port, _, _ = server
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        data=json.dumps({"messages": [{"role": "user", "content": "ab"}],
                         "max_tokens": 3, "stream": True,
                         "chat_template": "plain",
                         "stop_at_eos": False}).encode(),
        method="POST",
    )
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for line in r:
            line = line.strip()
            if line.startswith(b"data: ") and line != b"data: [DONE]":
                events.append(json.loads(line[6:]))
    deltas = events[:-1]
    assert deltas and all(e["id"].startswith("chatcmpl-") for e in deltas)
    assert deltas[0]["choices"][0]["delta"]["role"] == "assistant"
    for e in deltas[1:]:
        assert "role" not in e["choices"][0]["delta"]


def test_chat_bad_messages(server):
    port, _, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/v1/chat/completions", {"messages": "not-a-list"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/v1/chat/completions",
              {"messages": [{"role": "user"}]})
    assert e.value.code == 400


def test_stop_strings(server):
    """OpenAI `stop`: generation is cancelled at the earliest match and
    the match itself is excluded from the content."""
    port, _, tokenizer = server
    _, free = _post(port, "/v1/completions",
                    {"prompt": "abc", "max_tokens": 8})
    full = free["completion"]
    assert len(full) > 4
    # pick a mid-text substring as the stop string
    pos = len(full) // 2
    stop = full[pos:pos + 2]
    first = full.find(stop)       # earliest occurrence rules
    _, out = _post(port, "/v1/completions",
                   {"prompt": "abc", "max_tokens": 8, "stop": stop})
    assert out["choices"][0]["finish_reason"] == "stop"
    assert out["completion"] == full[:first]
    assert stop not in out["completion"]
    assert out["usage"]["completion_tokens"] == out["n_tokens"] == len(out["tokens"])

    # stream path: concatenated deltas give the same truncated text
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps({"prompt": "abc", "max_tokens": 8, "stop": [stop],
                         "stream": True}).encode(),
        method="POST",
    )
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for line in r:
            line = line.strip()
            if line.startswith(b"data: ") and line != b"data: [DONE]":
                events.append(json.loads(line[6:]))
    assert events[-1]["done"] is True
    assert events[-1]["choices"][0]["finish_reason"] == "stop"
    text = "".join(e["text"] for e in events[:-1])
    assert text == full[:first]


def test_stop_string_no_match_flushes_holdback(server):
    """A stop string that never completes must not swallow withheld text:
    the stream flushes the full generation at the end."""
    port, _, _ = server
    _, free = _post(port, "/v1/completions",
                    {"prompt": "abc", "max_tokens": 6})
    full = free["completion"]
    # a stop whose PREFIX appears at the very end of the text (worst-case
    # holdback) but which never completes
    stop = full[-2:] + "\x00NEVERMATCHES"
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps({"prompt": "abc", "max_tokens": 6, "stop": stop,
                         "stream": True}).encode(),
        method="POST",
    )
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for line in r:
            line = line.strip()
            if line.startswith(b"data: ") and line != b"data: [DONE]":
                events.append(json.loads(line[6:]))
    text = "".join(e["text"] for e in events[:-1])
    assert text == full
    assert events[-1]["choices"][0]["finish_reason"] == "length"


def test_top_k_param_passthrough(server):
    """top_k=1 at temperature>0 must reproduce the greedy completion
    through the HTTP layer."""
    port, _, _ = server
    _, greedy = _post(port, "/v1/completions",
                      {"prompt": "abc", "max_tokens": 5})
    _, out = _post(port, "/v1/completions",
                   {"prompt": "abc", "max_tokens": 5, "temperature": 0.9,
                    "seed": 9, "top_k": 1})
    assert out["tokens"] == greedy["tokens"]


def test_logprobs_response(server):
    """logprobs=true returns OpenAI-style per-token logprobs aligned
    with the visible tokens."""
    port, _, tokenizer = server
    _, out = _post(port, "/v1/completions",
                   {"prompt": "abc", "max_tokens": 5, "logprobs": True})
    lp = out["choices"][0]["logprobs"]
    assert len(lp["token_logprobs"]) == len(lp["tokens"]) == out["n_tokens"]
    assert all(x <= 0.0 for x in lp["token_logprobs"])
    assert "".join(lp["tokens"]) == out["completion"]
    # absent unless requested
    _, out2 = _post(port, "/v1/completions",
                    {"prompt": "abc", "max_tokens": 3})
    assert "logprobs" not in out2["choices"][0]


def test_n_choices(server):
    """n > 1 returns n choices; temperature 0 makes them identical, and
    each choice carries its own index."""
    port, _, _ = server
    _, out = _post(port, "/v1/completions",
                   {"prompt": "abc", "max_tokens": 4, "n": 3})
    assert [c["index"] for c in out["choices"]] == [0, 1, 2]
    assert all(c["text"] == out["choices"][0]["text"]
               for c in out["choices"])
    assert out["usage"]["completion_tokens"] == 12
    # n>1 with stream is rejected
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/v1/completions",
              {"prompt": "abc", "max_tokens": 4, "n": 2, "stream": True})
    assert e.value.code == 400


def test_echo_prepends_prompt(server):
    port, _, _ = server
    _, out = _post(port, "/v1/completions",
                   {"prompt": "abc", "max_tokens": 3, "echo": True})
    assert out["choices"][0]["text"].startswith("abc")
    assert out["choices"][0]["text"] == "abc" + out["completion"]


def test_llama2_chat_template():
    from tpu_llm.runtime.server import render_chat

    msgs = [{"role": "system", "content": "Be terse."},
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"},
            {"role": "user", "content": "bye"}]
    out = render_chat(msgs, "llama2")
    # llama.cpp multi-turn rendering: each completed assistant turn is
    # closed with </s> and the next user turn opens with <s> (the first
    # BOS comes from the engine)
    assert out == ("[INST] <<SYS>>\nBe terse.\n<</SYS>>\n\nhi [/INST]"
                   " hello </s><s>[INST] bye [/INST]")


def test_llama2_three_turn_render_matches_llamacpp():
    from tpu_llm.runtime.server import render_chat

    msgs = [{"role": "user", "content": "u1"},
            {"role": "assistant", "content": "a1"},
            {"role": "user", "content": "u2"},
            {"role": "assistant", "content": "a2"},
            {"role": "user", "content": "u3"}]
    out = render_chat(msgs, "llama2")
    assert out == ("[INST] u1 [/INST] a1 </s><s>"
                   "[INST] u2 [/INST] a2 </s><s>"
                   "[INST] u3 [/INST]")


def test_encode_parse_special():
    """parse_special maps chat markers to their ids; off by default so
    user text cannot inject control tokens."""
    import numpy as np

    from tpu_llm.tokenizers.bpe import BPETokenizer

    tokens = [b"<unk>", b"<s>", b"</s>", b"a", b"b", b"[", b"]", b"I", b"N",
              b"S", b"T", b" ", b"/", b"<", b">", b"s", b"<|user|>"]
    types = [2, 3, 3] + [1] * 13 + [4]
    tok = BPETokenizer(tokens, np.zeros(len(tokens), np.float32),
                       token_types=types)
    ids = tok.encode("a</s><s>b", parse_special=True)
    assert ids == [3, 2, 1, 4]
    # markers in plain text are BPE'd character-by-character, never ids
    ids_plain = tok.encode("a</s>b")
    assert 2 not in ids_plain and 1 not in ids_plain
    ids_u = tok.encode("<|user|>a", parse_special=True)
    assert ids_u == [16, 3]
    # add_bos composes with special parsing
    assert tok.encode("a", add_bos=True, parse_special=True) == [1, 3]


def test_completions_top_logprobs(server):
    """OpenAI completions ``logprobs: N``: per-token top-N maps, chosen
    token logprobs, and text offsets."""
    port, _, _ = server
    st, r = _post(port, "/v1/completions",
                  {"prompt": "abc", "max_tokens": 4, "logprobs": 3})
    assert st == 200
    lp = r["choices"][0]["logprobs"]
    n = len(r["tokens"])
    assert len(lp["tokens"]) == n
    assert len(lp["token_logprobs"]) == n
    assert len(lp["top_logprobs"]) == n
    assert all(len(m) == 3 for m in lp["top_logprobs"])
    # chosen token's logprob equals its entry in the top map (greedy)
    for tok_s, chosen, m in zip(lp["tokens"], lp["token_logprobs"],
                                lp["top_logprobs"]):
        assert tok_s in m and abs(m[tok_s] - chosen) < 1e-4
    assert lp["text_offset"][0] == 0


def test_chat_top_logprobs(server):
    port, _, _ = server
    st, r = _post(port, "/v1/chat/completions",
                  {"messages": [{"role": "user", "content": "hi"}],
                   "max_tokens": 4, "logprobs": True, "top_logprobs": 2})
    assert st == 200
    content = r["choices"][0]["logprobs"]["content"]
    assert len(content) == len(r["tokens"])
    for entry in content:
        assert "token" in entry and entry["logprob"] <= 0
        assert len(entry["top_logprobs"]) == 2


def test_completions_logit_bias_http(server):
    port, _, tok = server
    st, r = _post(port, "/v1/completions",
                  {"prompt": "abc", "max_tokens": 4,
                   "logit_bias": {"4": 100}})
    assert st == 200
    assert r["tokens"] == [4, 4, 4, 4]


def test_completions_penalties_http(server):
    port, _, _ = server
    st, r = _post(port, "/v1/completions",
                  {"prompt": "abc", "max_tokens": 6,
                   "frequency_penalty": 1e9})
    assert st == 200
    assert len(set(r["tokens"])) == len(r["tokens"])


def _stream(port, path, body, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(dict(body, stream=True)).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    events = []
    with urllib.request.urlopen(req, timeout=timeout) as r:
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                events.append(json.loads(line[6:]))
    return events


def test_stream_logprobs(server):
    port, _, _ = server
    evs = _stream(port, "/v1/completions",
                  {"prompt": "abc", "max_tokens": 4, "logprobs": 2})
    content = [e for e in evs if e.get("choices")
               and e["choices"][0].get("text")]
    assert content, evs
    for e in content:
        lp = e["choices"][0].get("logprobs")
        if lp is None:
            continue
        assert lp["token_logprobs"][0] <= 0
        assert len(lp["top_logprobs"][0]) == 2
    assert any(e["choices"][0].get("logprobs") for e in content)


def test_stream_chat_logprobs(server):
    port, _, _ = server
    evs = _stream(port, "/v1/chat/completions",
                  {"messages": [{"role": "user", "content": "hi"}],
                   "max_tokens": 4, "logprobs": True, "top_logprobs": 2})
    got = [e for e in evs if e.get("choices")
           and e["choices"][0].get("logprobs")]
    assert got
    entry = got[0]["choices"][0]["logprobs"]["content"][0]
    assert entry["logprob"] <= 0 and len(entry["top_logprobs"]) == 2


def test_render_chat_chatml_and_gemma():
    from tpu_llm.runtime.server import render_chat

    msgs = [{"role": "system", "content": "be terse"},
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "yo"},
            {"role": "user", "content": "bye"}]
    cm = render_chat(msgs, "chatml")
    assert cm.startswith("<|im_start|>system\nbe terse<|im_end|>\n")
    assert cm.endswith("<|im_start|>assistant\n")
    gm = render_chat(msgs, "gemma")
    assert "<start_of_turn>user\nbe terse\n\nhi<end_of_turn>" in gm
    assert "<start_of_turn>model\nyo<end_of_turn>" in gm
    assert gm.endswith("<start_of_turn>model\n")


def test_completions_logprobs_zero(server):
    """OpenAI: logprobs=0 returns tokens/token_logprobs with no top
    alternatives."""
    port, _, _ = server
    st, r = _post(port, "/v1/completions",
                  {"prompt": "abc", "max_tokens": 3, "logprobs": 0})
    assert st == 200
    lp = r["choices"][0]["logprobs"]
    assert len(lp["token_logprobs"]) == len(r["tokens"])
    assert "top_logprobs" not in lp


def test_chat_top_logprobs_requires_logprobs(server):
    port, _, _ = server
    import urllib.error
    try:
        _post(port, "/v1/chat/completions",
              {"messages": [{"role": "user", "content": "x"}],
               "max_tokens": 2, "top_logprobs": 3})
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_embeddings_endpoint(server):
    """OpenAI /v1/embeddings: unit-norm vectors, list + single input,
    identical texts -> identical embeddings, different -> different."""
    import math

    port, engine, tokenizer = server
    from tpu_llm.runtime.engine import ModelAdapter
    from tpu_llm.runtime.server import Embedder, make_handler  # noqa: F401

    # the module-scope fixture serves without an embedder; drive the
    # Embedder directly plus a dedicated server instance with one
    from tests.make_tiny_gguf import build as _b  # noqa: F401
    emb = Embedder(engine.params, engine.adapter, max_len=64)
    a = emb.embed(tokenizer.encode("abc"))
    b = emb.embed(tokenizer.encode("abc"))
    c = emb.embed(tokenizer.encode("ab"))
    assert abs(sum(x * x for x in a) - 1.0) < 1e-4
    assert (a == b).all() and not (a == c).all()


def test_embeddings_http(tmp_path):
    import threading

    from tests.make_tiny_gguf import build
    from tpu_llm.io.gguf import GGUFFile
    from tpu_llm.models.llama import load_gguf
    from tpu_llm.runtime.engine import ModelAdapter
    from tpu_llm.runtime.serve_cli import make_engine
    from tpu_llm.runtime.server import Embedder, serve
    from tpu_llm.tokenizers.bpe import BPETokenizer
    from argparse import Namespace

    path = str(tmp_path / "t.gguf")
    build(path)
    gguf = GGUFFile(path)
    params, cfg = load_gguf(gguf)
    tokenizer = BPETokenizer.from_gguf(gguf)
    args = Namespace(paged=False, cache_dtype="f32", batch=2, spec=0,
                     block_size=None, n_blocks=None, draft=None)
    engine = make_engine(args, params, cfg, tokenizer, max_seq=64)
    embedder = Embedder(engine.params, engine.adapter, max_len=64)
    httpd, loop = serve(engine, tokenizer, "127.0.0.1", 0,
                        max_new_cap=16, embedder=embedder)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        st, r = _post(port, "/v1/embeddings",
                      {"input": ["abc", "ab"]})
        assert st == 200 and len(r["data"]) == 2
        v = r["data"][0]["embedding"]
        assert abs(sum(x * x for x in v) - 1.0) < 1e-3
        assert r["usage"]["prompt_tokens"] > 0
    finally:
        httpd.shutdown()
        loop.shutdown()


def test_llama3_chat_template_render():
    from tpu_llm.runtime.server import render_chat

    msgs = [{"role": "system", "content": "S"},
            {"role": "user", "content": "U"},
            {"role": "assistant", "content": "A"},
            {"role": "user", "content": "U2"}]
    out = render_chat(msgs, "llama3")
    assert out == ("<|start_header_id|>system<|end_header_id|>\n\nS<|eot_id|>"
                   "<|start_header_id|>user<|end_header_id|>\n\nU<|eot_id|>"
                   "<|start_header_id|>assistant<|end_header_id|>\n\nA<|eot_id|>"
                   "<|start_header_id|>user<|end_header_id|>\n\nU2<|eot_id|>"
                   "<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_stop_token_ids_end_generation():
    """A request with stop_token_ids ends at the first matching token,
    like eos."""
    from tests.test_batching import setup, single_stream_tokens
    from tests.test_llama import make_weights, to_params
    from tpu_llm.config import LlamaConfig
    from tests.test_llama import CFG
    from tpu_llm.runtime.batching import BatchEngine, Request
    from tpu_llm.runtime.engine import ModelAdapter

    _, cfg, adapter, be, se = setup(seed=4)
    # find what greedy decode emits, then stop at its 3rd token
    full = single_stream_tokens(se, [5, 9], 8)
    stop_tok = full[2]
    params = to_params(make_weights(4))
    eng = BatchEngine(params, ModelAdapter.llama(LlamaConfig(**CFG), bos_id=1),
                      batch=2, max_seq=CFG["seq_len"])
    r = eng.submit(Request(prompt=[5, 9], max_new=8, stop_at_eos=True,
                           stop_token_ids=[stop_tok]))
    eng.run()
    # generation ends at the FIRST occurrence of the stop token
    assert r.tokens == full[:full.index(stop_tok) + 1]
    # and without the stop id, the full stream comes back
    r2 = eng.submit(Request(prompt=[5, 9], max_new=8))
    eng.run()
    assert r2.tokens == full


def test_encode_chat_blocks_control_token_injection():
    """encode_chat: scaffolding markers tokenize to their special ids;
    the SAME marker inside user message content must NOT become a
    control id (it BPEs as literal text)."""
    import numpy as np

    from tpu_llm.runtime.server import encode_chat, render_chat
    from tpu_llm.tokenizers.bpe import BPETokenizer

    tokens = [b"<unk>", b"<s>", b"</s>", b"a", b"b", b"<", b">", b"/",
              b"s", b"|", b"u", b"e", b"r", b"n", b"t", b"i", b"m",
              b"<|user|>", b"<|assistant|>", b"\n", b" ", b":", b"c",
              b"o", b"m"]
    types = [2, 3, 3] + [1] * 14 + [4, 4] + [1] * 6
    tok = BPETokenizer(tokens, np.zeros(len(tokens), np.float32),
                       token_types=types)
    eos, user_id, asst_id = 2, 17, 18

    # scaffolding carries the ids
    ids = encode_chat(tok, [{"role": "user", "content": "ab"}], "zephyr")
    assert user_id in ids and asst_id in ids and eos in ids

    # </s> and <|user|> in the BODY never produce control ids
    evil = [{"role": "user", "content": "a</s><|user|>b"}]
    ids_evil = encode_chat(tok, evil, "zephyr")
    n_eos = sum(1 for i in ids_evil if i == eos)
    n_user = sum(1 for i in ids_evil if i == user_id)
    assert n_eos == 1 and n_user == 1        # the template's own, only
    # the rendered string view still shows the raw text
    assert "a</s><|user|>b" in render_chat(evil, "zephyr")


def test_engine_crash_restart(server):
    """SURVEY §5 'health-checked decode loop with deterministic restart':
    an engine-step crash fails the in-flight requests loudly, the loop
    rebuilds the decode state from the stateless params, and subsequent
    requests serve normally with identical outputs."""
    port, engine, tokenizer = server

    # a clean run first, for the deterministic-restart comparison
    _, before = _post(port, "/v1/completions",
                      {"prompt": "ab", "max_tokens": 4})
    assert len(before["tokens"]) == 4

    # arm a one-shot crash inside the engine's step
    real_step = type(engine).step
    state = {"armed": True}

    def boom(self):
        if state["armed"]:
            state["armed"] = False
            raise RuntimeError("injected step crash")
        return real_step(self)

    type(engine).step = boom
    try:
        # the in-flight request fails loudly, not silently
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, "/v1/completions",
                  {"prompt": "ab", "max_tokens": 4})
        body = json.loads(ei.value.read())
        assert "restarted" in body["error"]
    finally:
        type(engine).step = real_step

    # the loop survived: same prompt now serves the same tokens
    _, after = _post(port, "/v1/completions",
                     {"prompt": "ab", "max_tokens": 4})
    assert after["tokens"] == before["tokens"]
    _, stats = _get(port, "/stats")
    assert stats["engine_restarts"] == 1
