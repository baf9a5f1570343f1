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

The harness shard_maps over ("pipe", "data") with TP ("model") left at 1;
PP x TP composition via partially-auto shard_map is the documented
follow-up.
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
