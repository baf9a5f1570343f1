"""GQA attention against a preallocated KV cache.

The reference computes attention one token at a time with scalar loops over
heads and cached positions (``llama2.f90:574-598``), with a softmax that
truncates to positions 1..pos (``llama2.f90:468-478``). Note the reference's
literal kv-head slice is buggy (empty for most heads — SURVEY.md §2 #13);
we implement the *intended* GQA: query head h reads kv head h // kv_groups.

TPU-first design: a single batched einsum formulation that serves both
prefill (T > 1, causal) and decode (T = 1) so XLA maps the contractions to
the MXU and fuses mask+softmax. KV cache is a static-shape array updated
with dynamic_update_slice; masking by position replaces the reference's
truncation (numerically identical through softmax).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def update_kv_cache(
    k_cache: jax.Array,  # (B, S, Hkv, D)
    v_cache: jax.Array,
    k_new: jax.Array,    # (B, T, Hkv, D)
    v_new: jax.Array,
    offset: jax.Array,   # scalar int, or (B,) per-slot write positions
) -> Tuple[jax.Array, jax.Array]:
    offset = offset.astype(jnp.int32)
    if offset.ndim == 0:
        zero = jnp.zeros((), dtype=jnp.int32)
        idx = (zero, offset, zero, zero)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_new.astype(k_cache.dtype), idx)
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_new.astype(v_cache.dtype), idx)
        return k_cache, v_cache

    # per-slot offsets (continuous batching): vmap the row update
    def row(kc, vc, kn, vn, off):
        zero = jnp.zeros((), dtype=jnp.int32)
        kc = jax.lax.dynamic_update_slice(kc, kn.astype(kc.dtype), (off, zero, zero))
        vc = jax.lax.dynamic_update_slice(vc, vn.astype(vc.dtype), (off, zero, zero))
        return kc, vc

    return jax.vmap(row)(k_cache, v_cache, k_new, v_new, offset)


def gqa_attention(
    q: jax.Array,          # (B, T, H, D)
    k_cache: jax.Array,    # (B, S, Hkv, D)
    v_cache: jax.Array,    # (B, S, Hkv, D)
    q_positions: jax.Array,  # (T,) or (B, T) 0-based absolute positions of q rows
    kv_lengths: jax.Array | None = None,  # (B,) valid cache length per row; None -> causal only
) -> jax.Array:
    """Scaled dot-product GQA attention. Returns (B, T, H, D).

    Visibility rule: cache slot s is attended iff s <= q_position (causal)
    and s < kv_length (ragged batch support). Matches the reference's
    softmax-truncation at pos (llama2.f90:586) for the dense single-stream
    case.
    """
    B, T, H, D = q.shape
    S, Hkv = k_cache.shape[1], k_cache.shape[2]
    G = H // Hkv
    scale = 1.0 / jnp.sqrt(jnp.float32(D))

    # bf16 q + bf16 cache contract directly on the MXU with f32 accumulation
    # (preferred_element_type) — casting the FULL cache to f32 first
    # materializes 2x the cache bytes per layer per token, which at decode
    # shapes is pure HBM overhead. f32 inputs keep the exact f32 path.
    bf16_inputs = (
        q.dtype == jnp.bfloat16
        and k_cache.dtype == jnp.bfloat16
        and v_cache.dtype == jnp.bfloat16
    )
    qg = q.reshape(B, T, Hkv, G, D)
    if not bf16_inputs:
        qg = qg.astype(jnp.float32)
        k_cache = k_cache.astype(jnp.float32)
        v_cache = v_cache.astype(jnp.float32)

    # scores: (B, T, Hkv, G, S), f32 accumulation either way
    scores = jnp.einsum(
        "bthgd,bshd->bthgs", qg, k_cache, preferred_element_type=jnp.float32
    ) * scale

    if q_positions.ndim == 1:
        q_positions = q_positions[None, :]
    s_idx = jnp.arange(S, dtype=jnp.int32)
    mask = s_idx[None, None, :] <= q_positions[:, :, None]  # (B, T, S)
    if kv_lengths is not None:
        mask = mask & (s_idx[None, None, :] < kv_lengths[:, None, None])
    scores = jnp.where(mask[:, :, None, None, :], scores, _NEG_INF)

    att = jax.nn.softmax(scores, axis=-1)
    if bf16_inputs:
        att = att.astype(jnp.bfloat16)
    out = jnp.einsum(
        "bthgs,bshd->bthgd", att, v_cache, preferred_element_type=jnp.float32
    )
    return out.reshape(B, T, H, D).astype(q.dtype)
