"""Ulysses attention — head↔sequence all-to-all context parallelism.

The alternative long-context strategy to ring attention (SURVEY.md §2.3):
activations stay sequence-sharded through the projections, then ONE
``all_to_all`` per side of attention switches layout — scatter heads,
gather sequence — so each device runs dense attention over the FULL
sequence for H/n of the heads, and a second all_to_all switches back.
Communication is two all-to-alls per layer instead of ring's n-1
ppermutes, but it requires n_kv_heads % n_devices == 0 — TinyLlama's 4 KV
heads cap the Ulysses degree at 4, which is why ring is the default for
that config (documented decision, SURVEY.md §2.3 Ulysses row).

GQA alignment: splitting the query-head axis into contiguous chunks of
H/n keeps each chunk's heads with their kv group iff (H/n) % G == 0,
i.e. n | n_kv_heads — checked at call time.

DECODE (``decode_ulysses``): at T=1 the sequence side of the all-to-all
is degenerate, so the decode-phase layout keeps the resident KV cache
HEAD-sharded (each device holds the FULL sequence for Hkv/n heads —
``reshard_cache_for_decode`` switches a prefill's sequence-sharded cache
over once). Each step every device runs the replicated projections,
attends its own head group over its full local cache (the O(S) work — the
part that grows with context — parallelizes n ways), writes its kv-head
slice, and one tiled all-gather on the tiny (B, 1, H/n, D) output row
reassembles heads. Win case vs ring-CP decode: head-rich models, where
ring pays (n-1) ppermutes of query/output rows per layer while Ulysses
pays one all-gather; TinyLlama-class models (4 KV heads) stay on ring.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpu_llm.ops.attention import gqa_attention


def ulysses_gqa_attention(
    q: jax.Array,       # (B, Tl, H, D)   sequence-sharded queries
    k: jax.Array,       # (B, Sl, Hkv, D) sequence-sharded KV
    v: jax.Array,
    axis_name: str,
) -> jax.Array:
    """All-to-all to head-sharded layout, dense causal GQA attention over
    the full gathered sequence, all-to-all back. Must run inside shard_map
    over ``axis_name``. Assumes the sequence shards are contiguous blocks
    in axis-index order (so the gathered axis is globally ordered) and
    S == T (prefill). Returns (B, Tl, H, D)."""
    n = jax.lax.psum(1, axis_name)
    H, Hkv = q.shape[2], k.shape[2]
    # (B, Tl, H, D) -> (B, T, H/n, D): scatter heads, gather sequence
    qg = jax.lax.all_to_all(q, axis_name, split_axis=2, concat_axis=1, tiled=True)
    kg = jax.lax.all_to_all(k, axis_name, split_axis=2, concat_axis=1, tiled=True)
    vg = jax.lax.all_to_all(v, axis_name, split_axis=2, concat_axis=1, tiled=True)

    T = qg.shape[1]
    positions = jnp.arange(T, dtype=jnp.int32)
    out = gqa_attention(qg, kg, vg, positions)           # (B, T, H/n, D)

    # back: scatter sequence, gather heads -> (B, Tl, H, D)
    return jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2, tiled=True)


def prefill_ulysses(
    params,
    cfg,
    tokens: jax.Array,   # (B, T) — T divisible by the seq-axis size
    cache,               # llama KV cache (L, B, S, Hkv, D) with S == T
    mesh: Mesh,
    data_axis: str = "data",
    seq_axis: str = "model",
) -> Tuple[jax.Array, dict]:
    """Ulysses llama prefill: tokens + KV cache sequence-sharded over
    ``seq_axis``, attention through the all-to-all layout switch. Returns
    (hidden (B, T, E), sequence-sharded cache); numerics identical to the
    single-device prefill."""
    from tpu_llm.models import llama as M

    n_seq = mesh.shape[seq_axis]
    B, T = tokens.shape
    if T % n_seq:
        raise ValueError(f"T={T} not divisible by seq axis {n_seq}")
    if cfg.n_kv_heads % n_seq:
        raise ValueError(
            f"Ulysses degree {n_seq} must divide n_kv_heads={cfg.n_kv_heads} "
            "(use ring attention instead — SURVEY.md §2.3)"
        )
    if cache["k"].shape[2] != T:
        raise ValueError("Ulysses prefill expects cache S == T (prefill region)")

    tok_spec = P(data_axis, seq_axis)
    cache_spec = P(None, data_axis, seq_axis, None, None)
    out_spec = P(data_axis, seq_axis, None)

    def local_fn(params, tokens, cache):
        r = jax.lax.axis_index(seq_axis)
        first = r * tokens.shape[1]

        def attn_fn(q, kc, vc, positions, offset):
            return ulysses_gqa_attention(q, kc, vc, seq_axis)

        return M.forward(
            params, cfg, tokens, cache, jnp.int32(first),
            attn_fn=attn_fn, kv_offset=jnp.int32(0),
        )

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), tok_spec, {"k": cache_spec, "v": cache_spec}),
        out_specs=(out_spec, {"k": cache_spec, "v": cache_spec}),
        check_vma=False,
    )
    return fn(params, tokens, cache)


def reshard_cache_for_decode(
    cache,               # sequence-sharded (L, B, T, Hkv, D) prefill cache
    max_seq: int,
    mesh: Mesh,
    data_axis: str = "data",
    seq_axis: str = "model",
):
    """Switch a Ulysses prefill's sequence-sharded cache to the decode
    layout: (L, B, max_seq, Hkv, D) planes HEAD-sharded over ``seq_axis``
    (full sequence resident per device for Hkv/n heads), zero-padded past
    the prefill length. One cache-sized all-to-all, paid once per
    sequence at the prefill->decode transition."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    head_spec = NamedSharding(
        mesh, P(None, data_axis, None, seq_axis, None))

    def one(plane):
        L, B, T, Hkv, D = plane.shape
        if max_seq < T:
            raise ValueError(f"max_seq={max_seq} < prefill T={T}")
        pad = [(0, 0), (0, 0), (0, max_seq - T), (0, 0), (0, 0)]
        return jax.device_put(jnp.pad(plane, pad), head_spec)

    return {"k": one(cache["k"]), "v": one(cache["v"])}


def decode_ulysses(
    params,
    cfg,
    token: jax.Array,    # (B,) int32
    cache,               # head-sharded cache from reshard_cache_for_decode
    pos: jax.Array,      # scalar int32
    mesh: Mesh,
    data_axis: str = "data",
    seq_axis: str = "model",
) -> Tuple[jax.Array, dict]:
    """One Ulysses decode step. Returns (logits (B, V) f32, cache).

    Inside shard_map: projections run replicated (their cost is
    context-independent), each device attends its head group over its
    full resident cache slice and writes its kv-head rows at ``pos``,
    and a tiled all-gather on the (B, 1, H/n, D) output row restores the
    full head layout. Numerics identical to the dense decode step."""
    from tpu_llm.models import llama as M

    n = mesh.shape[seq_axis]
    if cfg.n_kv_heads % n:
        raise ValueError(
            f"Ulysses degree {n} must divide n_kv_heads={cfg.n_kv_heads} "
            "(use ring attention instead — SURVEY.md §2.3)")
    Hl, Hkvl = cfg.n_heads // n, cfg.n_kv_heads // n

    cache_spec = P(None, data_axis, None, seq_axis, None)

    def local_fn(params, token, cache, pos):
        r = jax.lax.axis_index(seq_axis)

        def attn_fn(q, kc, vc, positions, offset):
            # q (B, 1, H, D) replicated -> this device's head group
            q_l = jax.lax.dynamic_slice_in_dim(q, r * Hl, Hl, axis=2)
            out_l = gqa_attention(q_l, kc, vc, positions)
            return jax.lax.all_gather(out_l, seq_axis, axis=2, tiled=True)

        def update_fn(kc, vc, k, v, off):
            # write only this device's kv-head slice of the new row
            k_l = jax.lax.dynamic_slice_in_dim(k, r * Hkvl, Hkvl, axis=2)
            v_l = jax.lax.dynamic_slice_in_dim(v, r * Hkvl, Hkvl, axis=2)
            from tpu_llm.ops.attention import update_kv_cache

            return update_kv_cache(kc, vc, k_l, v_l, off)

        hidden, cache = M.forward(
            params, cfg, token[:, None], cache, pos,
            attn_fn=attn_fn, update_fn=update_fn)
        logits = M.lm_head(params, cfg, hidden)[:, 0, :]
        return logits, cache

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(data_axis), {"k": cache_spec, "v": cache_spec},
                  P()),
        out_specs=(P(data_axis, None), {"k": cache_spec, "v": cache_spec}),
        check_vma=False,
    )
    return fn(params, token, cache, pos)
