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
