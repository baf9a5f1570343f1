"""Ring attention / context parallelism on the 8-virtual-device CPU mesh:
sequence-sharded KV with ppermute rotation must match the dense masked
attention and the single-device prefill exactly (SURVEY.md §2.3 CP row)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tpu_llm.config import LlamaConfig
from tpu_llm.models import llama as M
from tpu_llm.ops.attention import gqa_attention
from tpu_llm.parallel import make_mesh
from tpu_llm.parallel.ring import prefill_context_parallel, ring_gqa_attention

CFG = dict(dim=64, hidden_dim=128, n_layers=2, n_heads=8, n_kv_heads=4,
           vocab_size=256, seq_len=32)


def test_ring_attention_matches_dense():
    rng = np.random.default_rng(0)
    B, S, H, Hkv, D = 2, 32, 8, 4, 8
    n = 4
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    positions = jnp.arange(S, dtype=jnp.int32)

    expected = gqa_attention(q, k, v, positions)

    mesh = make_mesh(1, n)

    def local(q, k, v):
        r = jax.lax.axis_index("model")
        Tl = q.shape[1]
        pos = r * Tl + jnp.arange(Tl, dtype=jnp.int32)
        return ring_gqa_attention(q, k, v, pos, pos, "model")

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "model"), P(None, "model"), P(None, "model")),
        out_specs=P(None, "model"),
        check_vma=False,
    )
    got = fn(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("data,seq", [(1, 8), (2, 4)])
def test_cp_prefill_matches_single_device(data, seq):
    from tests.test_sharding import make_params

    cfg = LlamaConfig(**CFG)
    params = make_params(7)
    batch = max(data, 2)
    T = CFG["seq_len"]
    tokens = jnp.asarray(
        np.random.default_rng(4).integers(0, CFG["vocab_size"], (batch, T)),
        jnp.int32,
    )

    cache0 = M.init_cache(cfg, batch, T)
    hidden0, cache0 = M.forward(params, cfg, tokens, cache0, jnp.int32(0))

    mesh = make_mesh(data, seq)
    cache = M.init_cache(cfg, batch, T)
    hidden1, cache1 = prefill_context_parallel(params, cfg, tokens, cache, mesh)

    np.testing.assert_allclose(
        np.asarray(hidden0), np.asarray(hidden1), rtol=2e-4, atol=2e-4
    )
    # the sequence-sharded cache must reassemble to the dense one
    for kk in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(cache1[kk]), np.asarray(cache0[kk]), rtol=1e-5, atol=1e-5
        )


def test_cp_decode_matches_dense():
    """Sequence-sharded DECODE (ring.decode_step_context_parallel): a
    fresh cache sharded over 4 devices, 10 decode steps crossing two
    shard-ownership boundaries — logits must match the dense
    single-device decode at every step."""
    import jax.numpy as jnp

    from tpu_llm.config import LlamaConfig
    from tpu_llm.models import llama as M
    from tpu_llm.parallel.mesh import make_mesh
    from tpu_llm.parallel.ring import decode_step_context_parallel

    cfg = LlamaConfig(dim=32, hidden_dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=2, vocab_size=64, seq_len=16)
    rng = np.random.default_rng(3)
    s = lambda *sh: jnp.asarray((rng.standard_normal(sh) * 0.05).astype(np.float32))
    L, E, F, V, KV = cfg.n_layers, cfg.dim, cfg.hidden_dim, cfg.vocab_size, cfg.kv_dim
    params = {
        "tok_emb": s(V, E), "final_norm": s(E) + 1.0, "wcls": s(E, V),
        "layers": {
            "attn_norm": s(L, E) + 1.0, "ffn_norm": s(L, E) + 1.0,
            "wq": s(L, E, E), "wk": s(L, E, KV), "wv": s(L, E, KV),
            "wo": s(L, E, E), "w1": s(L, E, F), "w3": s(L, E, F),
            "w2": s(L, F, E)},
    }
    B = 2
    mesh = make_mesh(data=1, model=4)

    dense_cache = M.init_cache(cfg, B, cfg.seq_len)
    cp_cache = M.init_cache(cfg, B, cfg.seq_len)
    tok = jnp.asarray([3, 7], jnp.int32)
    tok_cp = tok
    for step in range(10):
        pos = jnp.int32(step)
        ref_logits, dense_cache = M.decode_step(params, cfg, tok, dense_cache, pos)
        got_logits, cp_cache = decode_step_context_parallel(
            params, cfg, tok_cp, cp_cache, pos, mesh)
        np.testing.assert_allclose(
            np.asarray(got_logits), np.asarray(ref_logits),
            rtol=2e-5, atol=2e-5)
        tok = jnp.argmax(ref_logits, -1).astype(jnp.int32)
        tok_cp = jnp.argmax(got_logits, -1).astype(jnp.int32)
