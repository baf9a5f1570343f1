"""PagedEngine: paged-KV continuous batching + prefix caching.

Ground truth is the dense single-stream Engine — identical greedy/sampled
tokens regardless of block size, slot reuse, on-demand growth, or shared
prefix blocks."""

import numpy as np
import pytest

from tests.test_batching import single_stream_tokens
from tests.test_llama import CFG, make_weights, to_params
from tpu_llm.config import LlamaConfig
from tpu_llm.runtime.batching import Request
from tpu_llm.runtime.engine import Engine, ModelAdapter
from tpu_llm.runtime.paged_engine import PagedEngine


def setup(seed=0, batch=3, n_blocks=32, block_size=4, prefix=True):
    params = to_params(make_weights(seed))
    cfg = LlamaConfig(**CFG)
    pe = PagedEngine(params, cfg, batch=batch, n_blocks=n_blocks,
                     block_size=block_size, max_seq=CFG["seq_len"],
                     prefix_caching=prefix)
    se = Engine(params, ModelAdapter.llama(cfg, bos_id=1),
                max_seq=CFG["seq_len"])
    return pe, se


def test_paged_matches_single_stream_greedy():
    pe, se = setup()
    prompts = [[5, 11], [3], [9, 2, 40]]
    n_new = [5, 6, 4]
    reqs = [pe.submit(Request(prompt=p, max_new=n))
            for p, n in zip(prompts, n_new)]
    pe.run()
    for req, p, n in zip(reqs, prompts, n_new):
        assert req.done and len(req.tokens) == n
        assert req.tokens == single_stream_tokens(se, p, n), p


def test_paged_growth_across_blocks():
    """block_size=2: every other decode step crosses a block boundary and
    must allocate + map a fresh block on the fly."""
    pe, se = setup(block_size=2, batch=2)
    r = pe.submit(Request(prompt=[5, 11, 8], max_new=9))
    pe.run()
    assert r.tokens == single_stream_tokens(se, [5, 11, 8], 9)


def test_paged_slot_reuse_no_leak():
    """A reused slot's stale block mapping must not leak KV into the next
    occupant (the paged analog of dense slot-reset)."""
    pe, se = setup(batch=1, prefix=False)
    r1 = pe.submit(Request(prompt=[5, 11], max_new=3))
    pe.run()
    r2 = pe.submit(Request(prompt=[9, 4, 7], max_new=5))
    pe.run()
    assert r1.tokens == single_stream_tokens(se, [5, 11], 3)
    assert r2.tokens == single_stream_tokens(se, [9, 4, 7], 5)


def test_paged_sampled_matches_single_stream():
    pe, se = setup(seed=3)
    r = pe.submit(Request(prompt=[4, 9], max_new=6, temperature=0.8,
                          seed=123))
    pe.run()
    assert r.tokens == single_stream_tokens(se, [4, 9], 6,
                                            temperature=0.8, seed=123)


def test_prefix_cache_reuses_blocks():
    """Second request with the same prompt: its full prefix blocks come
    from the cache (no new allocations for them) and generation is
    unchanged."""
    pe, se = setup(batch=1, block_size=2)
    prompt = [5, 11, 8, 3, 9, 2, 7]          # +BOS = 8 ids = 4 full blocks
    r1 = pe.submit(Request(prompt=prompt, max_new=4))
    pe.run()
    used_after_first = len(pe.allocator.refs)

    r2 = pe.submit(Request(prompt=prompt, max_new=4))
    pe.run()
    assert r2.tokens == r1.tokens == single_stream_tokens(se, prompt, 4)
    # the prefix blocks stayed cached between requests (refs held by the
    # cache), and the second admission allocated only tail/decode blocks
    assert pe.prefix is not None and len(pe.prefix._map) >= 3
    assert len(pe.allocator.refs) <= used_after_first + 2


def test_prefix_cache_diverging_tail():
    """Shared prefix, different tails: the cache serves the common
    blocks; generations match the dense engine for both."""
    pe, se = setup(batch=2, block_size=2)
    p1 = [5, 11, 8, 3, 9, 2]
    p2 = [5, 11, 8, 3, 40, 6]                # diverges in the 3rd block
    r1 = pe.submit(Request(prompt=p1, max_new=4))
    pe.run()
    r2 = pe.submit(Request(prompt=p2, max_new=4))
    pe.run()
    assert r1.tokens == single_stream_tokens(se, p1, 4)
    assert r2.tokens == single_stream_tokens(se, p2, 4)


def test_chunked_prefill_matches_dense():
    """prefill_chunk smaller than the prompt: the tail is processed in
    fixed chunks (activation memory bound, fewer compiled buckets) with
    unchanged generation."""
    params = to_params(make_weights(0))
    cfg = LlamaConfig(**CFG)
    pe = PagedEngine(params, cfg, batch=2, n_blocks=32, block_size=2,
                     max_seq=CFG["seq_len"], prefill_chunk=4)
    se = Engine(params, ModelAdapter.llama(cfg, bos_id=1),
                max_seq=CFG["seq_len"])
    prompt = [5, 11, 8, 3, 9, 2, 7, 4, 6]     # +BOS = 10 ids -> 2 chunks + tail
    r = pe.submit(Request(prompt=prompt, max_new=4))
    pe.run()
    assert r.tokens == single_stream_tokens(se, prompt, 4)


def test_pool_pressure_defers_admission():
    """With a pool too small for two concurrent requests, the second
    waits for the first to free blocks — and still decodes correctly."""
    # 8 usable blocks (block 0 is null), block_size=2: one request with
    # prompt 5 (+BOS=6 ids -> 3 blocks) + 6 new tokens (3 more) uses ~6
    pe, se = setup(batch=2, n_blocks=9, block_size=2, prefix=False)
    p1, p2 = [5, 11, 8, 3, 9], [7, 4, 2, 6, 1]
    r1 = pe.submit(Request(prompt=p1, max_new=6))
    r2 = pe.submit(Request(prompt=p2, max_new=6))
    pe.run()
    assert r1.done and r2.done
    assert r1.tokens == single_stream_tokens(se, p1, 6)
    assert r2.tokens == single_stream_tokens(se, p2, 6)


def test_pool_eviction_under_pressure():
    """Cached prefix blocks are evicted LRU when the pool runs dry, so a
    stream of distinct prompts never exhausts the pool."""
    pe, se = setup(batch=1, n_blocks=12, block_size=2)
    prompts = [[5 + i, 11, 8, 3] for i in range(6)]
    for p in prompts:
        r = pe.submit(Request(prompt=p, max_new=3))
        pe.run()
        assert r.tokens == single_stream_tokens(se, p, 3), p


def test_impossible_request_raises():
    pe, _ = setup(batch=1, n_blocks=4, block_size=2, prefix=False)
    with pytest.raises(MemoryError):
        pe.submit(Request(prompt=list(range(3, 11)), max_new=4))
        pe.run()


def test_paged_scan_decode_matches_dense():
    """The bench harness pattern: paged decode step inside lax.scan with
    pre-mapped tables == dense scan decode (greedy tokens equal)."""
    import jax
    import jax.numpy as jnp

    from tpu_llm.models import llama as M
    from tpu_llm.ops.paged_kv import PagedKV
    from tpu_llm.runtime.paged_engine import _paged_attn_fn, _paged_update_fn

    params = M.unstack_layers(to_params(make_weights(0)))
    cfg = LlamaConfig(**CFG)
    B, bs, steps, pos0 = 2, 4, 6, 3
    span = pos0 + steps + 1
    bpr = -(-span // bs)
    L, kvd = cfg.n_layers, cfg.kv_dim
    n_blocks = 1 + B * bpr
    table = 1 + np.arange(B * bpr, dtype=np.int32).reshape(B, bpr)
    state = {
        "k": [jnp.zeros((n_blocks, bs, kvd), jnp.float32) for _ in range(L)],
        "v": [jnp.zeros((n_blocks, bs, kvd), jnp.float32) for _ in range(L)],
        "table": jnp.asarray(table),
        "lengths": jnp.zeros((B,), jnp.int32),
    }
    # seed both caches with the same prefix (teacher-forced tokens 1..pos0)
    dense = M.init_cache(cfg, B, 16, jnp.float32, stacked=False)
    prefix = jnp.arange(1, pos0 + 1, dtype=jnp.int32)[None, :].repeat(B, 0)
    _, dense = M.forward(params, cfg, prefix, dense, jnp.int32(0))
    cache_p = {"k": [PagedKV(state["k"][i], state["v"][i], state["table"],
                             state["lengths"]) for i in range(L)],
               "v": [None] * L}
    _, nc = M.forward(params, cfg, prefix, cache_p,
                      jnp.full((B,), 0, jnp.int32),
                      update_fn=_paged_update_fn, attn_fn=_paged_attn_fn)
    state = {"k": [kv.k_pool for kv in nc["k"]],
             "v": [kv.v_pool for kv in nc["k"]],
             "table": state["table"], "lengths": nc["k"][0].lengths}

    token0 = jnp.full((B,), 5, jnp.int32)

    @jax.jit
    def paged_scan(params, token, state):
        def body(carry, _):
            token, state, pos = carry
            cache = {"k": [PagedKV(state["k"][i], state["v"][i],
                                   state["table"], state["lengths"])
                           for i in range(L)],
                     "v": [None] * L}
            hidden, nc = M.forward(params, cfg, token[:, None], cache,
                                   jnp.full((B,), pos, jnp.int32),
                                   update_fn=_paged_update_fn,
                                   attn_fn=_paged_attn_fn)
            logits = M.lm_head(params, cfg, hidden)[:, 0, :]
            token = jnp.argmax(logits, -1).astype(jnp.int32)
            state = {"k": [kv.k_pool for kv in nc["k"]],
                     "v": [kv.v_pool for kv in nc["k"]],
                     "table": state["table"], "lengths": nc["k"][0].lengths}
            return (token, state, pos + 1), token
        (_, _, _), toks = jax.lax.scan(body, (token, state, jnp.int32(pos0)),
                                       None, length=steps)
        return toks

    @jax.jit
    def dense_scan(params, token, cache):
        def body(carry, _):
            token, cache, pos = carry
            logits, cache = M.decode_step(params, cfg, token, cache, pos)
            token = jnp.argmax(logits, -1).astype(jnp.int32)
            return (token, cache, pos + 1), token
        (_, _, _), toks = jax.lax.scan(body, (token, cache, jnp.int32(pos0)),
                                       None, length=steps)
        return toks

    got = np.asarray(paged_scan(params, token0, state))
    want = np.asarray(dense_scan(params, token0, dense))
    np.testing.assert_array_equal(got, want)


def test_paged_int8_matches_dense_int8():
    """int8 paged pools: same per-(token, head) quantization and the same
    score-matrix scale factorization as the dense flat QuantKV cache —
    greedy tokens identical to the dense int8 BatchEngine."""
    from tpu_llm.runtime.batching import BatchEngine

    params = to_params(make_weights(0))
    cfg = LlamaConfig(**CFG)
    pe = PagedEngine(params, cfg, batch=2, n_blocks=32, block_size=4,
                     max_seq=CFG["seq_len"], cache_dtype="int8")
    import jax.numpy as jnp

    be = BatchEngine(params, ModelAdapter.llama(cfg, cache_dtype="int8"),
                     batch=2, max_seq=CFG["seq_len"])
    prompts = [[5, 11, 8], [9, 2]]
    rp = [pe.submit(Request(prompt=p, max_new=5)) for p in prompts]
    rb = [be.submit(Request(prompt=p, max_new=5)) for p in prompts]
    pe.run()
    be.run()
    for a, b, p in zip(rp, rb, prompts):
        assert a.tokens == b.tokens, p


def test_paged_decode_under_tp_sharding():
    """Paged decode composes with tensor parallelism: pools sharded on
    the Hkv*D axis (the KV-head TP axis), tables/lengths replicated —
    logits equal the single-device paged step."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tpu_llm.models import llama as M
    from tpu_llm.ops.paged_kv import PagedKV
    from tpu_llm.parallel.mesh import make_mesh
    from tpu_llm.runtime.paged_engine import _paged_attn_fn, _paged_update_fn

    cfg = LlamaConfig(**CFG)
    params = M.unstack_layers(to_params(make_weights(0)))
    B, bs, bpr = 2, 4, 4
    L, kvd = cfg.n_layers, cfg.kv_dim
    n_blocks = 1 + B * bpr
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        1 + np.arange(B * bpr, dtype=np.int32).reshape(B, bpr))
    pools = [
        [jnp.asarray(rng.standard_normal((n_blocks, bs, kvd)), jnp.float32)
         for _ in range(L)] for _ in range(2)
    ]
    lengths = jnp.asarray([6, 3], jnp.int32)
    token = jnp.asarray([4, 9], jnp.int32)
    offsets = jnp.asarray([6, 3], jnp.int32)

    def step(params, kps, vps, table, lengths, token, offsets):
        cache = {"k": [PagedKV(kps[i], vps[i], table, lengths)
                       for i in range(L)],
                 "v": [None] * L}
        hidden, _ = M.forward(params, cfg, token[:, None], cache, offsets,
                              update_fn=_paged_update_fn,
                              attn_fn=_paged_attn_fn)
        return M.lm_head(params, cfg, hidden)[:, 0, :]

    want = step(params, pools[0], pools[1], table, lengths, token, offsets)

    mesh = make_mesh(1, 2)          # 2-way model parallelism (Hkv = 2)
    sh = lambda spec: jax.NamedSharding(mesh, spec)
    col, row, rep = P(None, "model"), P("model", None), P(None)
    lspec = {"attn_norm": rep, "ffn_norm": rep,
             "wq": col, "wk": col, "wv": col, "wo": row,
             "w1": col, "w3": col, "w2": row}
    p_sh = {
        "tok_emb": jax.device_put(params["tok_emb"], sh(P(None, None))),
        "final_norm": jax.device_put(params["final_norm"], sh(rep)),
        "wcls": jax.device_put(params["wcls"], sh(P(None, "model"))),
        "layers": [
            {k: jax.device_put(v, sh(lspec[k])) for k, v in lp.items()}
            for lp in params["layers"]
        ],
    }
    kps = [jax.device_put(p, sh(P(None, None, "model"))) for p in pools[0]]
    vps = [jax.device_put(p, sh(P(None, None, "model"))) for p in pools[1]]
    got = jax.jit(step)(p_sh, kps, vps,
                        jax.device_put(table, sh(P(None, None))),
                        jax.device_put(lengths, sh(P(None))),
                        token, offsets)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_paged_update_tokens_matches_dense():
    """Unit parity: multi-token paged write + gather == dense cache."""
    import jax.numpy as jnp

    from tpu_llm.ops.paged_kv import PagedKV, paged_gather, paged_update_tokens

    B, T, Hkv, D, bs = 2, 5, 2, 4, 4
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    kv = PagedKV.zeros(n_blocks=8, block_size=bs, batch=B, max_blocks=4,
                       kv_dim=Hkv * D, dtype=jnp.float32)
    # row 0 writes at pos 2 (blocks 1,2), row 1 at pos 0 (blocks 3,4)
    table = np.zeros((B, 4), np.int32)
    table[0, :2] = [1, 2]
    table[1, :2] = [3, 4]
    kv = PagedKV(kv.k_pool, kv.v_pool, jnp.asarray(table), kv.lengths)
    pos0 = jnp.asarray([2, 0], jnp.int32)
    kv = paged_update_tokens(kv, k, v, pos0)

    kg, vg = paged_gather(kv)
    kf = np.asarray(k.reshape(B, T, Hkv * D))
    for b, start in enumerate([2, 0]):
        np.testing.assert_allclose(
            np.asarray(kg)[b, start : start + T], kf[b], rtol=0, atol=0)
    assert list(np.asarray(kv.lengths)) == [7, 5]


def test_paged_speculative_matches_plain():
    """Speculative paged engine emits the plain paged/dense streams
    exactly, across block growth and slot reuse."""
    params = to_params(make_weights(0))
    cfg = LlamaConfig(**CFG)
    se = Engine(params, ModelAdapter.llama(cfg, bos_id=1),
                max_seq=CFG["seq_len"])
    pe = PagedEngine(params, cfg, batch=2, n_blocks=32, block_size=2,
                     max_seq=CFG["seq_len"], speculative_k=3)
    prompts = [[5, 11, 5, 11, 5], [9, 2, 9, 2]]
    n_new = [6, 5]
    rs = [pe.submit(Request(prompt=p, max_new=n))
          for p, n in zip(prompts, n_new)]
    pe.run()
    for r, p, n in zip(rs, prompts, n_new):
        assert r.tokens == single_stream_tokens(se, p, n), p
    # slot reuse after speculative decode
    r2 = pe.submit(Request(prompt=[3, 3, 3], max_new=4))
    pe.run()
    assert r2.tokens == single_stream_tokens(se, [3, 3, 3], 4)


def test_multi_turn_prefix_reuse():
    """A follow-up request whose prompt extends a finished conversation
    (prompt + completion + new text) reuses the finished turn's cached
    blocks — generations still match the dense engine exactly."""
    pe, se = setup(batch=1, block_size=2, n_blocks=64)
    p1 = [5, 11, 8, 3]
    r1 = pe.submit(Request(prompt=p1, max_new=4))
    pe.run()
    # turn 2: the conversation so far + new user tokens
    p2 = p1 + r1.tokens + [9, 2]
    cached_before = len(pe.prefix._map)
    r2 = pe.submit(Request(prompt=p2, max_new=3))
    pe.run()
    assert r2.tokens == single_stream_tokens(se, p2, 3)
    # completion blocks were registered, and the follow-up matched past
    # the original prompt's extent
    assert cached_before > len(p1) // 2        # prompt + completion blocks
    assert r1.tokens == single_stream_tokens(se, p1, 4)


def test_exactly_fitting_request_admits():
    """prompt (+BOS) + max_new == max_seq with a minimal pool must admit
    (review r2: the reservation over-counted by one block when
    n_in+max_new-1 was a block multiple)."""
    params = to_params(make_weights(0))
    cfg = LlamaConfig(**CFG)
    # max_seq 16, bs 2 -> 8 blocks per slot; pool = 1 null + 8
    pe = PagedEngine(params, cfg, batch=1, n_blocks=9, block_size=2,
                     max_seq=CFG["seq_len"], prefix_caching=False)
    se = Engine(params, ModelAdapter.llama(cfg, bos_id=1),
                max_seq=CFG["seq_len"])
    prompt = list(range(3, 3 + 11))       # +BOS = 12, + 4 new = 16 = max_seq
    r = pe.submit(Request(prompt=prompt, max_new=4))
    pe.run()
    assert r.done and r.tokens == single_stream_tokens(se, prompt, 4)


def test_paged_penalties_match_dense_engine():
    """Frequency/presence penalties over the paged engine: same no-repeat
    guarantee and the same stream as the dense BatchEngine."""
    import tpu_llm.runtime.batching as B
    from tests.test_llama import CFG, make_weights, to_params
    from tpu_llm.config import LlamaConfig
    from tpu_llm.runtime.engine import ModelAdapter

    params = to_params(make_weights(0))
    cfg = LlamaConfig(**CFG)
    pe = PagedEngine(params, cfg, batch=2, n_blocks=64, block_size=16,
                     max_seq=CFG["seq_len"])
    r_p = pe.submit(Request(prompt=[5, 11], max_new=8,
                            frequency_penalty=1e9))
    pe.run()
    assert len(set(r_p.tokens)) == 8 and 1 not in r_p.tokens

    be = B.BatchEngine(params, ModelAdapter.llama(cfg, bos_id=1), batch=2,
                       max_seq=CFG["seq_len"])
    r_d = be.submit(B.Request(prompt=[5, 11], max_new=8,
                              frequency_penalty=1e9))
    be.run()
    assert r_p.tokens == r_d.tokens


def test_paged_logit_bias():
    from tests.test_llama import CFG, make_weights, to_params
    from tpu_llm.config import LlamaConfig

    params = to_params(make_weights(0))
    cfg = LlamaConfig(**CFG)
    pe = PagedEngine(params, cfg, batch=2, n_blocks=64, block_size=16,
                     max_seq=CFG["seq_len"])
    forced = pe.submit(Request(prompt=[3], max_new=4,
                               logit_bias={"17": 100.0}))
    pe.run()
    assert forced.tokens == [17, 17, 17, 17]


def test_paged_engine_reset_recovers():
    """reset() (serving crash recovery): fresh pools, allocator, prefix
    cache and slot metadata from the stateless params — a post-reset
    request produces exactly the same tokens as a fresh engine."""
    pe, _ = setup(prefix=True)
    r1 = pe.submit(Request(prompt=[5, 9, 3], max_new=6))
    pe.run()

    pe.reset()
    assert pe.n_active == 0 and not pe._queue
    r2 = pe.submit(Request(prompt=[5, 9, 3], max_new=6))
    pe.run()
    assert r2.tokens == r1.tokens
