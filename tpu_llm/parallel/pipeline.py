"""Pipeline parallelism (PP) — layer-range sharding across the "pipe" mesh
axis (SURVEY.md §2.3 PP row).

Each stage owns a contiguous slice of the layer stack (params and KV cache
sharded on the leading L axis via ``llama_param_specs(cfg, pipe=True)``).
Activations hop stage-to-stage with ``jax.lax.ppermute``:

- DECODE: single-token handoff — the token's hidden state visits the n
  stages in sequence (latency n·stage_time, which is the PP decode floor);
  no microbatching, per the plan in SURVEY.md §2.3.
- PREFILL: the prompt is split into sequence chunks that stream through
  the pipeline (chunk c enters stage s at tick s+c), so all stages work
  concurrently after the fill; a chunk's attention sees earlier chunks'
  KV because those were written to the SAME stage's cache shard on
  earlier ticks.

SPMD note: every device executes every tick and results are selected by
``stage == tick - chunk`` masks; off-turn compute is discarded. That
wasted work rides in parallel with the critical path, so pipeline latency
is unaffected — it costs energy, not time. (A lax.cond would not help:
under shard_map a device-dependent predicate lowers to select anyway.)

``decode_step_pipelined`` / ``prefill_pipelined`` shard over
("pipe", "data") with TP left at 1. ``decode_step_pp_tp`` composes PP
with tensor parallelism: the same stage ring, but each stage's layer
slice is additionally head/ffn-column sharded over "model" with
Megatron psum placement — the full 3-axis (pipe, data, model) serving
layout.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpu_llm.parallel.sharding import llama_param_specs


def _perm(n):
    return [(j, (j + 1) % n) for j in range(n)]


def _cache_specs(pipe_axis, data_axis):
    spec = P(pipe_axis, data_axis, None, None, None)
    return {"k": spec, "v": spec}


def decode_step_pipelined(
    params,
    cfg,
    token: jax.Array,    # (B,) int32
    cache,               # (L, B, S, Hkv, D), L sharded over pipe
    pos: jax.Array,      # scalar int32
    mesh: Mesh,
    pipe_axis: str = "pipe",
    data_axis: str = "data",
) -> Tuple[jax.Array, dict]:
    """One pipelined decode step. Returns ((B, V) logits, new cache);
    numerics identical to ``llama.decode_step``."""
    from tpu_llm.models import llama as M

    n = mesh.shape[pipe_axis]
    if cfg.n_layers % n:
        raise ValueError(f"n_layers={cfg.n_layers} not divisible by pipe={n}")
    p_specs = llama_param_specs(cfg, pipe=True)
    c_specs = _cache_specs(pipe_axis, data_axis)

    def local_fn(params, token, cache, pos):
        stage = jax.lax.axis_index(pipe_axis)
        x = jnp.take(params["tok_emb"], token[:, None], axis=0)   # (B', 1, E)
        positions = pos + jnp.arange(1, dtype=jnp.int32)
        kc, vc = cache["k"], cache["v"]
        for i in range(n):
            y, kc_i, vc_i = M.run_layers(
                params["layers"], cfg, x, kc, vc, positions, pos
            )
            keep = stage == i
            kc = jnp.where(keep, kc_i, kc)
            vc = jnp.where(keep, vc_i, vc)
            x = jax.lax.ppermute(y, pipe_axis, _perm(n))
        # after n hops the finished activation sits on stage 0; broadcast it
        hidden = jax.lax.psum(jnp.where(stage == 0, x, 0.0), pipe_axis)
        return hidden, {"k": kc, "v": vc}

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(p_specs, P(data_axis), c_specs, P()),
        out_specs=(P(data_axis, None, None), c_specs),
        check_vma=False,
    )
    hidden, cache = fn(params, token, cache, pos)
    hidden = M.apply_final_norm(params, cfg, hidden)
    logits = M.lm_head(params, cfg, hidden)[:, 0, :]
    return logits, cache


def decode_step_pp_tp(
    params,
    cfg,
    token: jax.Array,    # (B,) int32
    cache,               # (L, B, S, Hkv, D): L over pipe, Hkv over model
    pos: jax.Array,      # scalar int32
    mesh: Mesh,
    pipe_axis: str = "pipe",
    data_axis: str = "data",
    tp_axis: str = "model",
) -> Tuple[jax.Array, dict]:
    """PP x TP composed decode step (VERDICT r1 missing item 7): the
    pipeline's single-token stage ring with each stage's layers
    head/ffn-column sharded over ``tp_axis``, psum after wo/w2 inside the
    stage (Megatron placement), and the vocab-sharded classifier gathered
    at the end. Numerics match ``llama.decode_step``."""
    from tpu_llm.models import llama as M
    from tpu_llm.ops.attention import gqa_attention, update_kv_cache
    from tpu_llm.ops.norms import rmsnorm
    from tpu_llm.ops.activations import silu
    from tpu_llm.ops.rope import apply_rope
    from tpu_llm.quant.linear import matmul

    n = mesh.shape[pipe_axis]
    tp = mesh.shape[tp_axis]
    if cfg.n_layers % n:
        raise ValueError(f"n_layers={cfg.n_layers} not divisible by pipe={n}")
    assert cfg.n_heads % tp == 0 and cfg.n_kv_heads % tp == 0
    Hl, Hkvl, D = cfg.n_heads // tp, cfg.n_kv_heads // tp, cfg.head_dim
    Fl = cfg.hidden_dim // tp

    col = P(pipe_axis, None, tp_axis)
    row = P(pipe_axis, tp_axis, None)
    p_specs = {
        "tok_emb": P(None, None),
        "final_norm": P(None),
        "wcls": P(None, tp_axis),
        "layers": {
            "attn_norm": P(pipe_axis, None), "ffn_norm": P(pipe_axis, None),
            "wq": col, "wk": col, "wv": col, "wo": row,
            "w1": col, "w3": col, "w2": row,
        },
    }
    c_spec = P(pipe_axis, data_axis, None, tp_axis, None)
    c_specs = {"k": c_spec, "v": c_spec}

    def stage_layers(lp, x, kc, vc, positions, pos):
        # Deliberately a separate body from models/llama._block: inside
        # shard_map every operand is a LOCAL shard and the reductions
        # after wo/w2 are explicit psums — _block has no collective
        # hooks. Numerics drift vs the canonical block is pinned by
        # test_pipeline.py::test_pp_tp_composed_decode_matches_dense.
        # lp: stacked local slice (Ll, ..., /tp); python loop (harness path)
        B = x.shape[0]
        Ll = lp["wq"].shape[0]
        for i in range(Ll):
            h = rmsnorm(x, lp["attn_norm"][i], cfg.norm_eps)
            q = matmul(h, lp["wq"][i]).reshape(B, 1, Hl, D)
            k = matmul(h, lp["wk"][i]).reshape(B, 1, Hkvl, D)
            v = matmul(h, lp["wv"][i]).reshape(B, 1, Hkvl, D)
            q = apply_rope(q, positions, cfg.rope_theta, cfg.rope_variant,
                           cfg.rope_dims, cfg.rope_scaling)
            k = apply_rope(k, positions, cfg.rope_theta, cfg.rope_variant,
                           cfg.rope_dims, cfg.rope_scaling)
            kc_i, vc_i = update_kv_cache(kc[i], vc[i], k, v, pos)
            kc = kc.at[i].set(kc_i)
            vc = vc.at[i].set(vc_i)
            attn = gqa_attention(q, kc_i, vc_i, positions)
            attn_out = jax.lax.psum(
                matmul(attn.reshape(B, 1, Hl * D), lp["wo"][i]), tp_axis)
            x = x + attn_out
            m = rmsnorm(x, lp["ffn_norm"][i], cfg.norm_eps)
            mid = silu(matmul(m, lp["w1"][i])) * matmul(m, lp["w3"][i])
            x = x + jax.lax.psum(matmul(mid, lp["w2"][i]), tp_axis)
        return x, kc, vc

    def local_fn(params, token, cache, pos):
        stage = jax.lax.axis_index(pipe_axis)
        x = jnp.take(params["tok_emb"], token[:, None], axis=0)
        positions = pos + jnp.arange(1, dtype=jnp.int32)
        kc, vc = cache["k"], cache["v"]
        for i in range(n):
            y, kc_i, vc_i = stage_layers(
                params["layers"], x, kc, vc, positions, pos)
            keep = stage == i
            kc = jnp.where(keep, kc_i, kc)
            vc = jnp.where(keep, vc_i, vc)
            x = jax.lax.ppermute(y, pipe_axis, _perm(n))
        hidden = jax.lax.psum(jnp.where(stage == 0, x, 0.0), pipe_axis)
        hidden = rmsnorm(hidden, params["final_norm"], cfg.norm_eps)
        logits = matmul(hidden, params["wcls"], out_dtype=jnp.float32)
        logits = jax.lax.all_gather(
            logits[:, 0, :], tp_axis, axis=-1, tiled=True)
        return logits, {"k": kc, "v": vc}

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(p_specs, P(data_axis), c_specs, P()),
        out_specs=(P(data_axis, None), c_specs),
        check_vma=False,
    )
    return fn(params, token, cache, pos)


def prefill_pipelined(
    params,
    cfg,
    tokens: jax.Array,   # (B, T)
    cache,
    mesh: Mesh,
    microbatches: int = 0,   # sequence chunks in flight; 0 -> n_stages
    pipe_axis: str = "pipe",
    data_axis: str = "data",
) -> Tuple[jax.Array, dict]:
    """Microbatched pipelined prefill over sequence chunks. Returns
    (hidden (B, T, E) after final norm, new cache)."""
    from tpu_llm.models import llama as M

    n = mesh.shape[pipe_axis]
    B, T = tokens.shape
    nmb = microbatches or n
    if T % nmb:
        raise ValueError(f"T={T} not divisible by microbatches={nmb}")
    C = T // nmb
    p_specs = llama_param_specs(cfg, pipe=True)
    c_specs = _cache_specs(pipe_axis, data_axis)

    def local_fn(params, tokens, cache):
        stage = jax.lax.axis_index(pipe_axis)
        emb = jnp.take(params["tok_emb"], tokens, axis=0)          # (B', T, E)
        kc, vc = cache["k"], cache["v"]
        hidden_out = jnp.zeros(emb.shape, jnp.float32)
        x = jnp.zeros(emb[:, :C].shape, emb.dtype)

        for t in range(n + nmb - 1):
            c_in = t - stage                       # chunk this stage runs now
            offset = jnp.clip(c_in, 0, nmb - 1) * C
            emb_chunk = jax.lax.dynamic_slice_in_dim(
                emb, min(t, nmb - 1) * C, C, axis=1
            )
            x_in = jnp.where(stage == 0, emb_chunk, x)
            positions = offset + jnp.arange(C, dtype=jnp.int32)
            y, kc_i, vc_i = M.run_layers(
                params["layers"], cfg, x_in, kc, vc, positions, offset
            )
            valid = (c_in >= 0) & (c_in < nmb)
            kc = jnp.where(valid, kc_i, kc)
            vc = jnp.where(valid, vc_i, vc)
            emit = valid & (stage == n - 1)
            updated = jax.lax.dynamic_update_slice_in_dim(
                hidden_out, y.astype(jnp.float32), offset, axis=1
            )
            hidden_out = jnp.where(emit, updated, hidden_out)
            x = jax.lax.ppermute(y, pipe_axis, _perm(n))

        hidden = jax.lax.psum(
            jnp.where(stage == n - 1, hidden_out, 0.0), pipe_axis
        )
        return hidden, {"k": kc, "v": vc}

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(p_specs, P(data_axis), c_specs),
        out_specs=(P(data_axis, None, None), c_specs),
        check_vma=False,
    )
    hidden, cache = fn(params, tokens, cache)
    return M.apply_final_norm(params, cfg, hidden), cache
