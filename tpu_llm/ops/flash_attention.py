"""Flash (tiled online-softmax) GQA attention for prefill.

The XLA einsum path (ops/attention.py) materializes (B, T, H, S) scores —
at TinyLlama's full 2048 context that is 0.5 GB and collapses prefill.
This kernel never materializes scores: the KV sequence is tiled and a
running (m, l, acc) softmax state lives in VMEM scratch, following the
canonical JAX/Pallas TPU flash attention structure.

Inference-only (no VJP), GQA-aware (kv head = q head // G via the K/V
index maps), causal against a KV cache with an arbitrary query offset:
query row t attends cache slots s <= offset + t. KV tiles entirely above
the causal diagonal are skipped (their DMAs still happen; compute is
predicated off).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def _flash_kernel(
    off_ref,            # SMEM (1,)   — query position offset
    q_ref,              # (1, 1, block_q, D)
    k_ref,              # (1, 1, block_k, D)
    v_ref,              # (1, 1, block_k, D)
    o_ref,              # (1, 1, block_q, D)
    m_scr,              # VMEM (block_q, LANES) f32
    l_scr,              # VMEM (block_q, LANES) f32
    acc_scr,            # VMEM (block_q, D) f32
    *,
    block_q: int,
    block_k: int,
    kv_tiles: int,
    sm_scale: float,
):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    offset = off_ref[0]

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

    # skip KV tiles entirely above the causal diagonal:
    # max q_pos in this tile = offset + (iq+1)*block_q - 1
    should_run = ik * block_k <= offset + (iq + 1) * block_q - 1

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0].astype(jnp.float32)             # (bq, D)
        k = k_ref[0, 0].astype(jnp.float32)             # (bk, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                     # (bq, bk)

        q_pos = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            + offset + iq * block_q
        )
        kv_pos = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            + ik * block_k
        )
        s = jnp.where(kv_pos <= q_pos, s, NEG_INF)

        m_prev = m_scr[:]                                # (bq, LANES)
        l_prev = l_scr[:]
        m_curr = jnp.max(s, axis=1, keepdims=True)       # (bq, 1)
        m_next = jnp.maximum(m_prev, m_curr)             # broadcast -> (bq, LANES)
        alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])   # (bq, 1)
        p = jnp.exp(s - m_next[:, :1])                   # (bq, bk)
        l_next = alpha * l_prev[:, :1] + jnp.sum(p, axis=1, keepdims=True)

        m_scr[:] = m_next
        l_scr[:] = jnp.broadcast_to(l_next, l_scr.shape)
        v = v_ref[0, 0].astype(jnp.float32)              # (bk, D)
        acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )

    @pl.when(ik == kv_tiles - 1)
    def _store():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[:] * l_inv).astype(o_ref.dtype)


def flash_gqa_attention(
    q: jax.Array,         # (B, T, H, D)
    k_cache: jax.Array,   # (B, S, Hkv, D)
    v_cache: jax.Array,
    offset: jax.Array,    # scalar int32 — absolute position of q[:, 0]
    *,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    B, T, H, D = q.shape
    S, Hkv = k_cache.shape[1], k_cache.shape[2]
    G = H // Hkv
    sm_scale = 1.0 / (D ** 0.5)

    block_q = min(block_q, T)
    block_k = min(block_k, S)
    if T % block_q or S % block_k:
        raise ValueError(f"T={T} S={S} must tile by ({block_q},{block_k})")

    qt = jnp.swapaxes(q, 1, 2)              # (B, H, T, D)
    kt = jnp.swapaxes(k_cache, 1, 2)        # (B, Hkv, S, D)
    vt = jnp.swapaxes(v_cache, 1, 2)
    kv_tiles = S // block_k
    off = jnp.reshape(offset.astype(jnp.int32), (1,))

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            block_q=block_q, block_k=block_k,
            kv_tiles=kv_tiles, sm_scale=sm_scale,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, T // block_q, kv_tiles),
            in_specs=[
                # index maps get the scalar-prefetch ref as a trailing arg
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, iq, ik, off: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, iq, ik, off: (b, h // G, ik, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, iq, ik, off: (b, h // G, ik, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, iq, ik, off: (b, h, iq, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(off, qt, kt, vt)
    return jnp.swapaxes(out, 1, 2)          # (B, T, H, D)
