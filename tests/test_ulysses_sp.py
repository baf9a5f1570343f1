"""Ulysses (head<->sequence all-to-all) and sequence-parallel prefill on the
8-virtual-device CPU mesh: both must match single-device numerics, and SP
must actually leave the residual stream sequence-sharded (SURVEY.md §2.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tests.test_sharding import CFG, make_params
from tpu_llm.config import LlamaConfig
from tpu_llm.models import llama as M
from tpu_llm.ops.attention import gqa_attention
from tpu_llm.parallel import make_mesh, llama_param_specs, llama_cache_spec, shard_pytree
from tpu_llm.parallel.sequence import prefill_sequence_parallel
from tpu_llm.parallel.ulysses import prefill_ulysses, ulysses_gqa_attention


def test_ulysses_attention_matches_dense():
    rng = np.random.default_rng(0)
    B, S, H, Hkv, D = 2, 32, 8, 4, 8
    n = 4
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))

    expected = gqa_attention(q, k, v, jnp.arange(S, dtype=jnp.int32))

    mesh = make_mesh(1, n)
    fn = shard_map(
        lambda q, k, v: ulysses_gqa_attention(q, k, v, "model"),
        mesh=mesh,
        in_specs=(P(None, "model"), P(None, "model"), P(None, "model")),
        out_specs=P(None, "model"),
        check_vma=False,
    )
    np.testing.assert_allclose(
        np.asarray(fn(q, k, v)), np.asarray(expected), rtol=1e-5, atol=1e-5
    )


def test_ulysses_prefill_matches_single_device():
    cfg = LlamaConfig(**CFG)  # n_kv_heads=4 -> max ulysses degree 4
    params = make_params(11)
    batch, T = 2, CFG["seq_len"]
    tokens = jnp.asarray(
        np.random.default_rng(5).integers(0, CFG["vocab_size"], (batch, T)),
        jnp.int32,
    )

    cache0 = M.init_cache(cfg, batch, T)
    hidden0, cache0 = M.forward(params, cfg, tokens, cache0, jnp.int32(0))

    mesh = make_mesh(2, 4)
    cache = M.init_cache(cfg, batch, T)
    hidden1, cache1 = prefill_ulysses(params, cfg, tokens, cache, mesh)

    np.testing.assert_allclose(
        np.asarray(hidden0), np.asarray(hidden1), rtol=2e-4, atol=2e-4
    )
    for kk in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(cache1[kk]), np.asarray(cache0[kk]), rtol=1e-5, atol=1e-5
        )


def test_ulysses_rejects_bad_degree():
    cfg = LlamaConfig(**CFG)
    mesh = make_mesh(1, 8)  # 8 does not divide n_kv_heads=4
    tokens = jnp.zeros((1, 32), jnp.int32)
    cache = M.init_cache(cfg, 1, 32)
    with pytest.raises(ValueError, match="ring attention"):
        prefill_ulysses(make_params(0), cfg, tokens, cache, mesh)


def test_sp_prefill_matches_and_is_sequence_sharded():
    cfg = LlamaConfig(**CFG)
    params = make_params(13)
    batch, T = 2, CFG["seq_len"]
    tokens = jnp.asarray(
        np.random.default_rng(6).integers(0, CFG["vocab_size"], (batch, T)),
        jnp.int32,
    )

    cache0 = M.init_cache(cfg, batch, T)
    hidden0, _ = M.forward(params, cfg, tokens, cache0, jnp.int32(0))

    mesh = make_mesh(2, 4)
    p_sh = shard_pytree(params, llama_param_specs(cfg), mesh)
    cache = M.init_cache(cfg, batch, CFG["seq_len"])
    cache = shard_pytree(cache, llama_cache_spec(), mesh)

    hidden1, _ = prefill_sequence_parallel(params=p_sh, cfg=cfg,
                                           tokens=tokens, cache=cache, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(hidden0), np.asarray(hidden1), rtol=2e-4, atol=2e-4
    )
    # the output must come back sequence-sharded over the TP axis
    spec = hidden1.sharding.spec
    assert spec[1] == "model", f"hidden not sequence-sharded: {spec}"


def test_ulysses_decode_matches_single_device():
    """Full Ulysses lifecycle: sequence-sharded prefill -> one-time
    reshard to the head-sharded decode layout -> greedy decode steps.
    Logits and tokens must match the dense single-device path."""
    from tpu_llm.parallel.ulysses import (decode_ulysses,
                                          reshard_cache_for_decode)

    cfg = LlamaConfig(**CFG)
    params = make_params(13)
    batch, T = 2, CFG["seq_len"]
    max_seq = T + 8
    rng = np.random.default_rng(9)
    tokens = jnp.asarray(
        rng.integers(0, CFG["vocab_size"], (batch, T)), jnp.int32)

    # dense reference: prefill then 4 greedy steps
    cache0 = M.init_cache(cfg, batch, max_seq)
    hidden0, cache0 = M.forward(params, cfg, tokens, cache0, jnp.int32(0))
    tok0 = jnp.argmax(
        M.lm_head(params, cfg, hidden0[:, -1:, :])[:, 0, :], axis=-1
    ).astype(jnp.int32)
    ref_toks = []
    pos = T
    for _ in range(4):
        logits0, cache0 = M.decode_step(params, cfg, tok0, cache0,
                                        jnp.int32(pos))
        ref_toks.append(np.asarray(tok0))
        tok0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
        pos += 1

    mesh = make_mesh(2, 4)
    pcache = M.init_cache(cfg, batch, T)
    hidden1, pcache = prefill_ulysses(params, cfg, tokens, pcache, mesh)
    tok1 = jnp.argmax(
        M.lm_head(params, cfg, hidden1[:, -1:, :])[:, 0, :], axis=-1
    ).astype(jnp.int32)
    dcache = reshard_cache_for_decode(pcache, max_seq, mesh)
    pos = T
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(tok1), ref_toks[i])
        logits1, dcache = decode_ulysses(params, cfg, tok1, dcache,
                                         jnp.int32(pos), mesh)
        tok1 = jnp.argmax(logits1, axis=-1).astype(jnp.int32)
        pos += 1


def test_ulysses_decode_rejects_bad_degree():
    from tpu_llm.parallel.ulysses import decode_ulysses

    cfg = LlamaConfig(**CFG)
    mesh = make_mesh(1, 8)
    cache = M.init_cache(cfg, 1, 32)
    with pytest.raises(ValueError, match="ring attention"):
        decode_ulysses(make_params(0), cfg, jnp.zeros((1,), jnp.int32),
                       cache, jnp.int32(0), mesh)
