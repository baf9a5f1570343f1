"""Pipeline-parallel tests on the 8-virtual-device CPU mesh: layer-range
sharding with ppermute handoff must match single-device prefill + decode
numerics exactly (SURVEY.md §2.3 PP row)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_llm.config import LlamaConfig
from tpu_llm.models import llama as M
from tpu_llm.parallel import make_mesh, llama_param_specs, shard_pytree
from tpu_llm.parallel.pipeline import decode_step_pipelined, prefill_pipelined

CFG = dict(dim=64, hidden_dim=128, n_layers=4, n_heads=8, n_kv_heads=4,
           vocab_size=256, seq_len=32)


def make_params(seed=0):
    rng = np.random.default_rng(seed)
    d, h, L, V = CFG["dim"], CFG["hidden_dim"], CFG["n_layers"], CFG["vocab_size"]
    kv = d // CFG["n_heads"] * CFG["n_kv_heads"]
    s = lambda *sh: jnp.asarray((rng.standard_normal(sh) * 0.08).astype(np.float32))
    return {
        "tok_emb": s(V, d),
        "final_norm": 1.0 + 0.1 * s(d),
        "wcls": s(d, V),
        "layers": {
            "attn_norm": 1.0 + 0.1 * s(L, d),
            "ffn_norm": 1.0 + 0.1 * s(L, d),
            "wq": s(L, d, d), "wk": s(L, d, kv), "wv": s(L, d, kv),
            "wo": s(L, d, d),
            "w1": s(L, d, h), "w3": s(L, d, h), "w2": s(L, h, d),
        },
    }


def _shard_pp(params, cfg, mesh, batch):
    p_sh = shard_pytree(params, llama_param_specs(cfg, pipe=True), mesh)
    cache = M.init_cache(cfg, batch, CFG["seq_len"])
    spec = P("pipe", "data", None, None, None)
    cache = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, spec)), cache
    )
    return p_sh, cache


@pytest.mark.parametrize("pipe,data,nmb", [(4, 2, 0), (2, 1, 4)])
def test_pp_prefill_and_decode_match_single_device(pipe, data, nmb):
    cfg = LlamaConfig(**CFG)
    params = make_params(3)
    batch = max(2, data)
    T = 16
    tokens = jnp.asarray(
        np.random.default_rng(8).integers(0, CFG["vocab_size"], (batch, T)),
        jnp.int32,
    )

    # single-device reference
    cache0 = M.init_cache(cfg, batch, CFG["seq_len"])
    hidden0, cache0 = M.forward(params, cfg, tokens, cache0, jnp.int32(0))
    logits0, cache0 = M.decode_step(params, cfg, tokens[:, -1], cache0, jnp.int32(T))

    mesh = make_mesh(data=data, model=1, pipe=pipe)
    p_sh, cache = _shard_pp(params, cfg, mesh, batch)
    hidden1, cache = prefill_pipelined(
        p_sh, cfg, tokens, cache, mesh, microbatches=nmb
    )
    np.testing.assert_allclose(
        np.asarray(hidden0), np.asarray(hidden1), rtol=2e-4, atol=2e-4
    )

    logits1, cache = decode_step_pipelined(
        p_sh, cfg, tokens[:, -1], cache, jnp.int32(T), mesh
    )
    np.testing.assert_allclose(
        np.asarray(logits0), np.asarray(logits1), rtol=2e-4, atol=2e-4
    )
    for kk in ("k", "v"):
        got = np.asarray(cache[kk])[:, :, : T + 1]
        want = np.asarray(cache0[kk])[:, :, : T + 1]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pp_rejects_indivisible_layers():
    cfg = LlamaConfig(**{**CFG, "n_layers": 3})
    mesh = make_mesh(data=1, model=1, pipe=4)
    with pytest.raises(ValueError, match="divisible"):
        decode_step_pipelined(
            make_params(0), cfg, jnp.zeros((1,), jnp.int32),
            M.init_cache(cfg, 1, 8), jnp.int32(0), mesh,
        )


def test_pp_tp_composed_decode_matches_dense():
    """PP=2 x TP=2 x DP=2 over 8 devices: composed decode parity with the
    dense single-device step (VERDICT r1 missing 7)."""
    import jax.numpy as jnp

    from tpu_llm.config import LlamaConfig
    from tpu_llm.models import llama as M
    from tpu_llm.parallel.mesh import make_mesh
    from tpu_llm.parallel.pipeline import decode_step_pp_tp

    cfg = LlamaConfig(dim=32, hidden_dim=64, n_layers=4, n_heads=4,
                      n_kv_heads=2, vocab_size=64, seq_len=16)
    rng = np.random.default_rng(9)
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
    mesh = make_mesh(data=2, model=2, pipe=2)
    B = 2
    tok = jnp.asarray([3, 9], jnp.int32)
    dense_cache = M.init_cache(cfg, B, cfg.seq_len)
    pp_cache = M.init_cache(cfg, B, cfg.seq_len)
    for step in range(4):
        pos = jnp.int32(step)
        ref, dense_cache = M.decode_step(params, cfg, tok, dense_cache, pos)
        got, pp_cache = decode_step_pp_tp(params, cfg, tok, pp_cache, pos, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        tok = jnp.argmax(ref, -1).astype(jnp.int32)
