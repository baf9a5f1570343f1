import numpy as np

from tests.test_llama import CFG, make_weights, to_params
from tpu_llm.config import LlamaConfig
from tpu_llm.runtime.batching import BatchEngine, Request
from tpu_llm.runtime.engine import Engine, ModelAdapter


def setup(seed=0, batch=4):
    w = make_weights(seed)
    params = to_params(w)
    cfg = LlamaConfig(**CFG)
    adapter = ModelAdapter.llama(cfg, bos_id=1)
    be = BatchEngine(params, adapter, batch=batch, max_seq=CFG["seq_len"])
    se = Engine(params, adapter, max_seq=CFG["seq_len"])
    return params, cfg, adapter, be, se


def single_stream_tokens(se, prompt, n_new, temperature=0.0, seed=0):
    res = se.generate(prompt, n_new=n_new, temperature=temperature, seed=seed)
    return res.tokens[len(prompt):]


def test_batched_matches_single_stream_greedy():
    _, _, _, be, se = setup()
    prompts = [[5, 11], [3], [9, 2, 40]]
    n_new = [5, 6, 4]
    reqs = [be.submit(Request(prompt=p, max_new=n)) for p, n in zip(prompts, n_new)]
    be.run()
    for req, p, n in zip(reqs, prompts, n_new):
        assert req.done and len(req.tokens) == n
        assert req.tokens == single_stream_tokens(se, p, n), p


def test_staggered_admission():
    """A request admitted mid-flight (reusing a finished slot) must decode
    identically to a fresh single-stream run — stale cache rows from the
    previous occupant may not leak."""
    _, _, _, be, se = setup(batch=2)
    r1 = be.submit(Request(prompt=[5, 11], max_new=3))
    r2 = be.submit(Request(prompt=[3], max_new=8))
    # drive until r1 finishes, then admit r3 into its slot
    while not r1.done:
        be.step()
    r3 = be.submit(Request(prompt=[7, 7, 24], max_new=4))
    be.run()
    assert r2.done and r3.done
    assert r1.tokens == single_stream_tokens(se, [5, 11], 3)
    assert r2.tokens == single_stream_tokens(se, [3], 8)
    assert r3.tokens == single_stream_tokens(se, [7, 7, 24], 4)


def test_temperature_sampling_per_slot_deterministic():
    _, _, _, be, se = setup(seed=1)
    r1 = be.submit(Request(prompt=[4], max_new=6, temperature=0.8, seed=42))
    r2 = be.submit(Request(prompt=[4], max_new=6, temperature=0.8, seed=42))
    r3 = be.submit(Request(prompt=[4], max_new=6, temperature=0.8, seed=7))
    be.run()
    assert r1.tokens == r2.tokens           # same seed, same slot-independent stream
    assert isinstance(r3.tokens, list) and len(r3.tokens) == 6


def test_eos_stopping():
    params, cfg, adapter, be, se = setup(seed=2)
    # find what greedy generates, use its first token as fake EOS
    first = single_stream_tokens(se, [6], 1)[0]
    be.eos_id = first
    r = be.submit(Request(prompt=[6], max_new=10, stop_at_eos=True))
    be.run()
    assert r.tokens == [first]


def test_mamba_batched():
    from tests.test_mamba import make_torch_arrays, CFG as MCFG
    from tpu_llm.io.mamba_ckpt import write_packed, read_packed
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.bin")
        write_packed(path, make_torch_arrays(5), MCFG)
        params, mcfg = read_packed(path)

    adapter = ModelAdapter.mamba(mcfg)
    be = BatchEngine(params, adapter, batch=3, max_seq=24)
    se = Engine(params, adapter, max_seq=24)
    r1 = be.submit(Request(prompt=[3, 7], max_new=4))
    r2 = be.submit(Request(prompt=[9], max_new=5))
    be.run()
    s1 = se.generate([3, 7], n_new=4, add_bos=False)
    e2 = Engine(params, adapter, max_seq=24)
    s2 = e2.generate([9], n_new=5, add_bos=False)
    assert r1.tokens == s1.tokens[2:]
    assert r2.tokens == s2.tokens[1:]


def test_mamba_slot_reuse_resets_state():
    """Recurrent state from a finished request must not leak into the next
    occupant of the slot."""
    from tests.test_mamba import make_torch_arrays, CFG as MCFG
    from tpu_llm.io.mamba_ckpt import write_packed, read_packed
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.bin")
        write_packed(path, make_torch_arrays(6), MCFG)
        params, mcfg = read_packed(path)

    adapter = ModelAdapter.mamba(mcfg)
    be = BatchEngine(params, adapter, batch=1, max_seq=24)
    r1 = be.submit(Request(prompt=[3, 7], max_new=3))
    be.run()
    r2 = be.submit(Request(prompt=[9, 4], max_new=5))
    be.run()
    se = Engine(params, adapter, max_seq=24)
    s2 = se.generate([9, 4], n_new=5, add_bos=False)
    assert r2.tokens == s2.tokens[2:]


def test_long_prompt_admitted_in_one_step():
    """Dedicated prefill: a P-token prompt costs ONE engine step to produce
    its first token, not P teacher-forcing steps."""
    _, _, _, be, se = setup(batch=2)
    long_prompt = list(range(3, 3 + 10))
    r = be.submit(Request(prompt=long_prompt, max_new=3))
    steps = 0
    while not r.tokens and steps < 5:
        be.step()
        steps += 1
    assert len(r.tokens) >= 1 and steps == 1, (steps, r.tokens)
    be.run()
    assert r.tokens == single_stream_tokens(se, long_prompt, 3)


def test_long_prompt_admitted_mid_decode():
    """Admitting a long prompt while another slot decodes must not perturb
    either stream (VERDICT r1 item 5)."""
    _, _, _, be, se = setup(batch=2)
    r1 = be.submit(Request(prompt=[5, 11], max_new=8))
    be.step()
    be.step()
    long_prompt = list(range(2, 2 + 9))
    r2 = be.submit(Request(prompt=long_prompt, max_new=4))
    be.run()
    assert r1.tokens == single_stream_tokens(se, [5, 11], 8)
    assert r2.tokens == single_stream_tokens(se, long_prompt, 4)


def test_sampled_stream_matches_single_stream():
    """With prefill admission the PRNG split order matches the single
    stream engine exactly: same seed -> same sampled tokens, batched or
    not."""
    _, _, _, be, se = setup(seed=3)
    r = be.submit(Request(prompt=[4, 9], max_new=6, temperature=0.8, seed=123))
    be.run()
    assert r.tokens == single_stream_tokens(
        se, [4, 9], 6, temperature=0.8, seed=123)


def test_lookup_draft():
    from tpu_llm.runtime.engine import _lookup_draft

    #                 0  1  2  3  4  5  6
    ctx = [7, 8, 9, 3, 7, 8, 5, 7, 8]
    # trailing 2-gram (7,8) last PRIOR occurrence at 4 -> next tokens [5,7,8...]
    assert _lookup_draft(ctx, 2) == [5, 7]
    assert _lookup_draft(ctx, 5) == [5, 7, 8]   # runs off the end
    assert _lookup_draft([1, 2, 3], 2) == []     # no prior occurrence
    assert _lookup_draft([1], 3) == []           # too short


def test_speculative_matches_plain_greedy():
    """Prompt-lookup speculative decode emits EXACTLY the plain greedy
    stream (acceptance only reorders batching, never content), including
    through the cache-boundary tail fallback."""
    _, _, _, _, se = setup()
    se2 = setup()[4]
    # repetitive prompt so some drafts actually get accepted
    prompt = [5, 11, 5, 11, 5]
    for k in (1, 3, 6):
        plain = se.generate(prompt, n_new=9)
        spec = se2.generate(prompt, n_new=9, speculative_k=k)
        assert spec.tokens == plain.tokens, k


def test_speculative_ignored_for_sampling_and_mamba():
    """Sampling falls back to the plain pipelined loop; Mamba adapters
    (recurrent state, no rollback) never enter the spec path."""
    _, _, _, _, se = setup(seed=1)
    a = se.generate([4], n_new=6, temperature=0.8, seed=42)
    b = setup(seed=1)[4].generate([4], n_new=6, temperature=0.8, seed=42,
                                  speculative_k=4)
    assert a.tokens == b.tokens

    from tests.test_mamba import make_torch_arrays, CFG as MCFG
    from tpu_llm.io.mamba_ckpt import write_packed, read_packed
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.bin")
        write_packed(path, make_torch_arrays(5), MCFG)
        mparams, mcfg = read_packed(path)
    adapter = ModelAdapter.mamba(mcfg)
    e1 = Engine(mparams, adapter, max_seq=24)
    e2 = Engine(mparams, adapter, max_seq=24)
    r1 = e1.generate([3, 7], n_new=5, add_bos=False)
    r2 = e2.generate([3, 7], n_new=5, add_bos=False, speculative_k=4)
    assert r1.tokens == r2.tokens


def test_batched_speculative_matches_plain():
    """Batched prompt-lookup speculation: identical token streams to the
    plain batch engine across staggered admissions, repetitive prompts,
    and the near-cache-boundary fallback (max_seq=16 forces it)."""
    params = None
    _, cfg, adapter, be_plain, se = setup()
    from tests.test_llama import make_weights, to_params
    params = to_params(make_weights(0))
    be_spec = BatchEngine(params, adapter, batch=4, max_seq=CFG["seq_len"],
                          speculative_k=3)
    prompts = [[5, 11, 5, 11, 5], [3, 3, 3], [9, 2, 9, 2]]
    n_new = [6, 7, 5]
    rp = [be_plain.submit(Request(prompt=p, max_new=n))
          for p, n in zip(prompts, n_new)]
    rs = [be_spec.submit(Request(prompt=p, max_new=n))
          for p, n in zip(prompts, n_new)]
    be_plain.run()
    be_spec.run()
    for a, b, p in zip(rp, rs, prompts):
        assert a.tokens == b.tokens, p


def test_batched_speculative_mixed_temperature():
    """A sampled slot in a speculative batch emits the same stream as in
    the plain engine (one key split per step, accepts no drafts)."""
    _, cfg, adapter, be_plain, _ = setup(seed=1)
    from tests.test_llama import make_weights, to_params
    params = to_params(make_weights(1))
    be_spec = BatchEngine(params, adapter, batch=4, max_seq=CFG["seq_len"],
                          speculative_k=3)
    reqs = [Request(prompt=[4, 4, 4], max_new=6, temperature=0.8, seed=42),
            Request(prompt=[5, 11, 5, 11], max_new=6)]
    rp = [be_plain.submit(Request(**{f: getattr(r, f) for f in
                                     ("prompt", "max_new", "temperature",
                                      "seed")})) for r in reqs]
    rs = [be_spec.submit(r) for r in reqs]
    be_plain.run()
    be_spec.run()
    for a, b in zip(rp, rs):
        assert a.tokens == b.tokens


def test_batched_speculative_eos_stop():
    _, cfg, adapter, _, se = setup(seed=2)
    from tests.test_llama import make_weights, to_params
    params = to_params(make_weights(2))
    first = single_stream_tokens(se, [6], 1)[0]
    be = BatchEngine(params, adapter, batch=2, max_seq=CFG["seq_len"],
                     speculative_k=4)
    be.eos_id = first
    r = be.submit(Request(prompt=[6], max_new=10, stop_at_eos=True))
    be.run()
    assert r.tokens == [first]


def test_batched_speculative_int8_cache():
    """Speculation composes with the int8 KV cache: stream identical to
    the plain int8 engine (same quantization at the same write positions)."""
    from tests.test_llama import make_weights, to_params
    params = to_params(make_weights(4))
    cfg = LlamaConfig(**CFG)
    a1 = ModelAdapter.llama(cfg, cache_dtype="int8")
    a2 = ModelAdapter.llama(cfg, cache_dtype="int8")
    plain = BatchEngine(params, a1, batch=2, max_seq=CFG["seq_len"])
    spec = BatchEngine(params, a2, batch=2, max_seq=CFG["seq_len"],
                       speculative_k=3)
    prompts = [[5, 11, 5, 11], [9, 2, 9]]
    rp = [plain.submit(Request(prompt=p, max_new=6)) for p in prompts]
    rs = [spec.submit(Request(prompt=p, max_new=6)) for p in prompts]
    plain.run()
    spec.run()
    for a, b in zip(rp, rs):
        assert a.tokens == b.tokens


def test_top_k_one_matches_greedy():
    """top_k=1 at temperature>0 collapses the distribution to the argmax,
    so the stream must equal the greedy stream — pins the traced filter
    path (engine-level top-k/top-p, round 3)."""
    _, _, _, be, se = setup()
    greedy = single_stream_tokens(se, [5, 11], 6)
    r = be.submit(Request(prompt=[5, 11], max_new=6, temperature=0.9,
                          seed=3, top_k=1))
    be.run()
    assert r.tokens == greedy
    # single-stream engine: same collapse, both loop styles
    res = se.generate([5, 11], n_new=6, temperature=0.9, seed=3, top_k=1)
    assert res.tokens[2:] == greedy
    res = se.generate([5, 11], n_new=6, temperature=0.9, seed=3, top_k=1,
                      use_scan=True)
    assert res.tokens[2:] == greedy


def test_top_p_tiny_matches_greedy():
    """A vanishing nucleus keeps only the top token."""
    _, _, _, be, se = setup()
    greedy = single_stream_tokens(se, [3], 5)
    r = be.submit(Request(prompt=[3], max_new=5, temperature=1.3,
                          seed=11, top_p=1e-9))
    be.run()
    assert r.tokens == greedy


def test_filtered_and_plain_share_batch():
    """A filtered request and a plain greedy request decode in the same
    batch: the filtered step variant must leave greedy slots greedy."""
    _, _, _, be, se = setup()
    r1 = be.submit(Request(prompt=[5, 11], max_new=6))
    r2 = be.submit(Request(prompt=[3], max_new=6, temperature=0.9,
                           seed=5, top_k=1))
    be.run()
    assert r1.tokens == single_stream_tokens(se, [5, 11], 6)
    assert r2.tokens == single_stream_tokens(se, [3], 6)


def test_filtered_sample_matches_static_sampler():
    """filtered_sample (traced knobs) agrees with sample_token (static
    knobs) for the same key on identical filter settings."""
    import jax
    import jax.numpy as jnp
    from tpu_llm.ops.sampling import filtered_sample, sample_token

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((64,)).astype(np.float32))
    for temp, k, p in [(0.7, 5, 1.0), (1.1, 0, 0.6), (0.9, 8, 0.8),
                       (1.0, 1, 1.0)]:
        for seed in range(4):
            key = jax.random.PRNGKey(seed)
            want = sample_token(key, logits, temperature=temp,
                                top_k=k or None, top_p=p)
            got = filtered_sample(logits, key, jnp.float32(temp),
                                  jnp.int32(k), jnp.float32(p))
            assert int(want) == int(got), (temp, k, p, seed)


def test_cancel_mid_decode():
    """cancel() retires a live request immediately; the surviving request
    is unaffected and a new request can reuse the freed slot."""
    _, _, _, be, se = setup(batch=2)
    r1 = be.submit(Request(prompt=[5, 11], max_new=12))
    r2 = be.submit(Request(prompt=[3], max_new=8))
    for _ in range(3):
        be.step()
    n_at_cancel = len(r1.tokens)
    assert be.cancel(r1) is True
    assert r1.done and be.cancel(r1) is False
    r3 = be.submit(Request(prompt=[7, 7, 24], max_new=4))
    be.run()
    # cancel may race the one-step-lagged fetch by at most one token
    assert len(r1.tokens) <= n_at_cancel + 1
    assert r2.tokens == single_stream_tokens(se, [3], 8)
    assert r3.tokens == single_stream_tokens(se, [7, 7, 24], 4)


def test_cancel_queued_request():
    _, _, _, be, _ = setup(batch=1)
    r1 = be.submit(Request(prompt=[5], max_new=4))
    r2 = be.submit(Request(prompt=[3], max_new=4))   # queued behind r1
    assert be.cancel(r2) is True and r2.done
    be.run()
    assert r1.done and len(r1.tokens) == 4 and r2.tokens == []


def test_logprobs_recorded_and_consistent():
    """logprobs=True records one raw-distribution log P per generated
    token; greedy logprobs match a direct forward's log_softmax."""
    import jax
    import jax.numpy as jnp

    params, cfg, adapter, be, se = setup()
    r = be.submit(Request(prompt=[5, 11], max_new=5, logprobs=True))
    be.run()
    assert len(r.token_logprobs) == len(r.tokens) == 5
    assert all(lp <= 0.0 for lp in r.token_logprobs)

    # independent check: teacher-force the sequence through the model
    # forward and compare every generated token's logprob
    from tpu_llm.models import llama as M

    ids = [1, 5, 11] + r.tokens        # BOS + prompt + generated
    cache = M.init_cache(cfg, 1, CFG["seq_len"])
    hidden, _ = M.forward(params, cfg, jnp.asarray([ids[:-1]], jnp.int32),
                          cache, jnp.int32(0))
    logits = M.lm_head(params, cfg, hidden)[0]          # (T, V)
    lp_all = jax.nn.log_softmax(
        logits[-len(r.tokens):].astype(jnp.float32), -1)
    want = [float(lp_all[i, t]) for i, t in enumerate(r.tokens)]
    np.testing.assert_allclose(r.token_logprobs, want, rtol=2e-4, atol=2e-4)


def test_logprobs_speculative_matches_plain():
    """Speculative decoding must emit the same (token, logprob) stream
    as the plain engine."""
    params, cfg, adapter, _, _ = setup()
    from tpu_llm.runtime.batching import BatchEngine

    plain = BatchEngine(params, adapter, batch=2, max_seq=CFG["seq_len"])
    spec = BatchEngine(params, adapter, batch=2, max_seq=CFG["seq_len"],
                       speculative_k=3)
    prompt = [5, 11, 5, 11]
    r1 = plain.submit(Request(prompt=prompt, max_new=6, logprobs=True))
    plain.run()
    r2 = spec.submit(Request(prompt=prompt, max_new=6, logprobs=True))
    spec.run()
    assert r1.tokens == r2.tokens
    np.testing.assert_allclose(r1.token_logprobs, r2.token_logprobs,
                               rtol=1e-5, atol=1e-5)


def test_frequency_penalty_bans_repeats():
    """A huge frequency penalty makes every token of the text-so-far
    unsampleable: the generated stream has no repeats (and avoids the
    prompt/BOS tokens) for n << vocab."""
    _, _, _, be, _ = setup()
    prompt = [5, 11, 7]
    req = be.submit(Request(prompt=prompt, max_new=10,
                            frequency_penalty=1e9))
    be.run()
    assert req.done and len(req.tokens) == 10
    seen = set([1] + prompt)        # BOS + prompt counted too
    for t in req.tokens:
        assert t not in seen, (t, req.tokens)
        seen.add(t)


def test_penalized_and_plain_slots_do_not_interact():
    """Mixed batch: the unpenalized slot's stream must equal its solo
    greedy run; the penalized slot must differ from ITS plain run once
    the penalty forces a divergence."""
    _, _, _, be, se = setup(batch=2)
    plain = be.submit(Request(prompt=[9, 2, 40], max_new=8))
    pen = be.submit(Request(prompt=[5, 11], max_new=8,
                            frequency_penalty=1e9))
    be.run()
    assert plain.tokens == single_stream_tokens(se, [9, 2, 40], 8)
    base = single_stream_tokens(se, [5, 11], 8)
    assert pen.tokens != base       # random-weight greedy repeats quickly
    assert len(set(pen.tokens)) == 8


def test_penalty_after_unpenalized_phase():
    """Counts activate lazily: a penalized request admitted AFTER plain
    ones ran (and into a reused slot) still bans repeats, and the plain
    request finishing later is unaffected."""
    _, _, _, be, se = setup(batch=2)
    first = be.submit(Request(prompt=[3], max_new=3))
    be.run()
    assert first.done
    long_plain = be.submit(Request(prompt=[9, 2, 40], max_new=10))
    pen = be.submit(Request(prompt=[5, 11], max_new=6,
                            presence_penalty=1e9))
    be.run()
    assert len(set(pen.tokens)) == 6
    assert long_plain.tokens == single_stream_tokens(se, [9, 2, 40], 10)


def test_repetition_penalty_changes_stream():
    """HF-style repetition penalty (divide positive logits of seen
    tokens) must alter a repetitive greedy stream but keep determinism."""
    _, _, _, be, _ = setup()
    a = be.submit(Request(prompt=[5, 11], max_new=8,
                          repetition_penalty=5.0))
    be.run()
    _, _, _, be2, _ = setup()
    b = be2.submit(Request(prompt=[5, 11], max_new=8,
                           repetition_penalty=5.0))
    be2.run()
    assert a.tokens == b.tokens     # deterministic


def test_logit_bias_bans_and_forces():
    """OpenAI logit_bias: -100 bans a token the greedy stream would have
    picked; +100 on a rare token forces it every step."""
    _, _, _, be, se = setup()
    base = single_stream_tokens(se, [5, 11], 6)
    banned = base[0]
    req = be.submit(Request(prompt=[5, 11], max_new=6,
                            logit_bias={banned: -100}))
    # +100 forcing, admitted alongside (mixed batch)
    forced = be.submit(Request(prompt=[3], max_new=4,
                               logit_bias={str(17): 100.0}))
    plain = be.submit(Request(prompt=[9, 2, 40], max_new=5))
    be.run()
    assert banned not in req.tokens
    assert forced.tokens == [17, 17, 17, 17]
    assert plain.tokens == single_stream_tokens(se, [9, 2, 40], 5)


def test_top_logprobs_recorded():
    """top_logprobs=N records N (id, logprob) alternatives per generated
    token; the chosen greedy token is always the argmax entry, and values
    are proper log-softmax (<= 0, descending)."""
    _, _, _, be, _ = setup()
    req = be.submit(Request(prompt=[5, 11], max_new=5, top_logprobs=3))
    mixed = be.submit(Request(prompt=[3], max_new=4))   # no-tops slot
    be.run()
    assert len(req.top_ids) == 5 and len(req.top_lps) == 5
    assert len(req.token_logprobs) == 5
    for tok, ids, lps in zip(req.tokens, req.top_ids, req.top_lps):
        assert len(ids) == 3 and len(lps) == 3
        assert ids[0] == tok                 # greedy = top-1
        assert lps[0] <= 0 and sorted(lps, reverse=True) == lps
    assert mixed.top_ids == []


def test_single_stream_engine_penalties():
    """Engine.generate penalties: huge frequency penalty -> all-distinct
    stream; plain runs unchanged; matches the BatchEngine's penalized
    stream for the same request."""
    _, _, _, be, se = setup()
    res = se.generate([5, 11], n_new=8, frequency_penalty=1e9)
    gen = res.tokens[2:]
    assert len(set(gen)) == 8
    base = single_stream_tokens(se, [5, 11], 8)   # plain still greedy
    assert gen != base
    req = be.submit(Request(prompt=[5, 11], max_new=8,
                            frequency_penalty=1e9))
    be.run()
    assert req.tokens == gen


def test_draft_model_speculation_exact_stream():
    """Two-model speculation: output is exactly the plain greedy stream
    with ANY draft. A same-weights draft accepts everything (fast path);
    a different-weights draft mispredicts (correctness under rejects);
    both must reproduce the plain stream."""
    from tests.test_llama import CFG, make_weights, to_params
    from tpu_llm.config import LlamaConfig
    from tpu_llm.runtime.engine import Engine, ModelAdapter

    cfg = LlamaConfig(**CFG)
    params = to_params(make_weights(0))
    adapter = ModelAdapter.llama(cfg, bos_id=1)
    target = Engine(params, adapter, max_seq=CFG["seq_len"])
    base = target.generate([5, 11], n_new=12).tokens

    same = Engine(params, adapter, max_seq=CFG["seq_len"])
    res = target.generate([5, 11], n_new=12, speculative_k=4, draft=same)
    assert res.tokens == base

    other = Engine(to_params(make_weights(3)), adapter,
                   max_seq=CFG["seq_len"])
    res2 = target.generate([5, 11], n_new=12, speculative_k=4, draft=other)
    assert res2.tokens == base


def test_draft_model_vocab_mismatch_rejected():
    import dataclasses

    import pytest as _pytest

    from tests.test_llama import CFG, make_weights, to_params
    from tpu_llm.config import LlamaConfig
    from tpu_llm.runtime.engine import Engine, ModelAdapter

    cfg = LlamaConfig(**CFG)
    params = to_params(make_weights(0))
    target = Engine(params, ModelAdapter.llama(cfg, bos_id=1),
                    max_seq=CFG["seq_len"])
    cfg2 = dataclasses.replace(cfg, vocab_size=cfg.vocab_size + 8)
    bad = Engine(params, ModelAdapter.llama(cfg2, bos_id=1),
                 max_seq=CFG["seq_len"])
    with _pytest.raises(ValueError):
        target.generate([5], n_new=4, speculative_k=2, draft=bad)


def test_batch_engine_draft_model_speculation():
    """Batched two-model speculation: streams identical to plain greedy
    for every slot, with same-weights and different-weights drafts,
    across staggered admissions."""
    from tests.test_llama import CFG, make_weights, to_params
    from tpu_llm.config import LlamaConfig
    from tpu_llm.runtime.engine import Engine, ModelAdapter

    cfg = LlamaConfig(**CFG)
    params = to_params(make_weights(0))
    adapter = ModelAdapter.llama(cfg, bos_id=1)
    se = Engine(params, adapter, max_seq=CFG["seq_len"])
    prompts = [[5, 11], [3], [9, 2, 40]]
    base = [single_stream_tokens(se, p, 8) for p in prompts]

    for draft_seed in (0, 3):
        dparams = to_params(make_weights(draft_seed))
        be = BatchEngine(params, adapter, batch=2, max_seq=CFG["seq_len"],
                         speculative_k=3, draft=(dparams, adapter))
        reqs = [be.submit(Request(prompt=p, max_new=8)) for p in prompts]
        be.run()
        for req, expect in zip(reqs, base):
            assert req.tokens == expect, (draft_seed, req.tokens, expect)
        if draft_seed == 0:
            # perfect draft: every verify emits >1 token on average
            assert be.stats["spec_tokens"] > be.stats["spec_forwards"]


def test_speculative_skipped_for_all_sampled_batch(monkeypatch):
    """temperature>0-only batches must use the pipelined plain step: only
    greedy slots can accept drafts, so the (B, k+1) verify forward plus
    its synchronous host fetch would buy nothing."""
    _, cfg, adapter, be_plain, _ = setup(seed=3)
    from tests.test_llama import make_weights, to_params
    params = to_params(make_weights(3))
    be = BatchEngine(params, adapter, batch=4, max_seq=CFG["seq_len"],
                     speculative_k=3)
    spec_calls = []
    orig = be._step_spec
    monkeypatch.setattr(be, "_step_spec",
                        lambda live: spec_calls.append(1) or orig(live))
    reqs = [Request(prompt=[4, 5, 4], max_new=5, temperature=0.7, seed=1),
            Request(prompt=[6, 7], max_new=5, temperature=0.9, seed=2)]
    rp = [be_plain.submit(Request(**{f: getattr(r, f) for f in
                                     ("prompt", "max_new", "temperature",
                                      "seed")})) for r in reqs]
    rs = [be.submit(r) for r in reqs]
    be_plain.run()
    be.run()
    assert not spec_calls            # gate: no spec step ever ran
    for a, b in zip(rp, rs):
        assert a.tokens == b.tokens

    # a greedy slot joining the batch re-enables speculation
    be2 = BatchEngine(params, adapter, batch=4, max_seq=CFG["seq_len"],
                      speculative_k=3)
    calls2 = []
    orig2 = be2._step_spec
    monkeypatch.setattr(be2, "_step_spec",
                        lambda live: calls2.append(1) or orig2(live))
    be2.submit(Request(prompt=[4, 5, 4], max_new=5, temperature=0.7, seed=1))
    be2.submit(Request(prompt=[5, 11, 5, 11], max_new=5))
    be2.run()
    assert calls2


def test_min_p_filter_semantics():
    """min_p drops tokens with prob < min_p * max_prob; survivors keep
    their relative probabilities (llama.cpp min_p)."""
    import jax
    import jax.numpy as jnp

    from tpu_llm.ops.sampling import filtered_sample

    # logits -> probs [0.6, 0.3, 0.06, 0.04]-ish; min_p=0.2 keeps only
    # the top-2 (floor = 0.12)
    logits = jnp.log(jnp.asarray([0.6, 0.3, 0.06, 0.04], jnp.float32))
    counts = np.zeros(4, np.int64)
    for i in range(200):
        t = filtered_sample(logits, jax.random.PRNGKey(i), jnp.float32(1.0),
                            jnp.int32(0), jnp.float32(1.0), jnp.float32(0.2))
        counts[int(t)] += 1
    assert counts[2] == 0 and counts[3] == 0
    assert counts[0] > counts[1] > 0
    # min_p=0 is the identity filter: matches the unfiltered sampler
    t0 = filtered_sample(logits, jax.random.PRNGKey(0), jnp.float32(1.0),
                         jnp.int32(0), jnp.float32(1.0), jnp.float32(0.0))
    t1 = filtered_sample(logits, jax.random.PRNGKey(0), jnp.float32(1.0),
                         jnp.int32(0), jnp.float32(1.0))
    assert int(t0) == int(t1)


def test_min_p_through_engines():
    """A min_p request flows through BatchEngine (and bans improbable
    tokens), and determinism holds."""
    _, cfg, adapter, be, se = setup(seed=6)
    r1 = be.submit(Request(prompt=[5, 9], max_new=6, temperature=1.2,
                           seed=3, min_p=0.3))
    be.run()
    params2 = be.params
    be2 = BatchEngine(params2, ModelAdapter.llama(cfg, bos_id=1), batch=4,
                      max_seq=cfg.seq_len)
    r2 = be2.submit(Request(prompt=[5, 9], max_new=6, temperature=1.2,
                            seed=3, min_p=0.3))
    be2.run()
    assert r1.tokens == r2.tokens and len(r1.tokens) == 6


def test_min_p_kept_set_is_temperature_independent():
    """llama.cpp's sampler chain applies temperature LAST, so the min_p
    kept-set must come from the UN-temperature-scaled probabilities: at
    any temperature, min_p=0.2 on [0.6, 0.3, 0.06, 0.04] keeps exactly
    the top 2 (floor 0.12). The old temp-first floor kept all four at
    temperature 2.5."""
    import jax
    import jax.numpy as jnp

    from tpu_llm.ops.sampling import filtered_sample

    logits = jnp.log(jnp.asarray([0.6, 0.3, 0.06, 0.04], jnp.float32))
    for temp in (0.5, 1.0, 2.5):
        counts = np.zeros(4, np.int64)
        for i in range(150):
            t = filtered_sample(logits, jax.random.PRNGKey(i),
                                jnp.float32(temp), jnp.int32(0),
                                jnp.float32(1.0), jnp.float32(0.2))
            counts[int(t)] += 1
        assert counts[2] == 0 and counts[3] == 0, (temp, counts)
        assert counts[0] > 0 and counts[1] > 0, (temp, counts)


def test_device_spec_scan_exact_stream():
    """The all-on-device speculative loop (use_scan + speculative_k):
    emitted tokens are EXACTLY the plain greedy stream, on repetitive
    prompts (drafts accept) and non-repetitive ones (every draft
    rejected), including the near-cache-boundary plain-step tail."""
    from tests.test_llama import CFG, make_weights, to_params
    from tpu_llm.config import LlamaConfig
    from tpu_llm.runtime.engine import Engine, ModelAdapter

    cfg = LlamaConfig(**CFG)
    params = to_params(make_weights(0))
    adapter = ModelAdapter.llama(cfg, bos_id=1)
    base_eng = Engine(params, adapter, max_seq=CFG["seq_len"])
    spec_eng = Engine(params, adapter, max_seq=CFG["seq_len"])
    for prompt in ([5, 11], [4, 7, 4, 7, 4, 7]):
        base = base_eng.generate(prompt, n_new=10).tokens
        got = spec_eng.generate(prompt, n_new=10, use_scan=True,
                                speculative_k=3)
        assert got.tokens == base, prompt
    assert spec_eng.stats["spec_forwards"] > 0
    assert spec_eng.stats["spec_tokens"] >= spec_eng.stats["spec_forwards"]
