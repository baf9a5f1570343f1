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


def _gqa_diag(hkv: int, group: int, d: int):
    """(H, Hkv*D) mask: row h is True on its own kv head's D columns.
    Expanding q block-diagonally with this mask lets ONE MXU pass contract
    all heads against the flat (S, Hkv*D) cache plane (the 8-small-dots
    version cost ~2x: MXU fill overhead per dot)."""
    heads = hkv * group
    col_head = jax.lax.broadcasted_iota(jnp.int32, (heads, hkv * d), 1) // d
    row_head = jax.lax.broadcasted_iota(jnp.int32, (heads, hkv * d), 0) // group
    return col_head == row_head


def _pick_own_head(full, diag, hkv: int, d: int):
    """(H, Hkv*D) block-diag AV result -> (H, D): keep each row's own
    kv-head D-column block. Static lane slices — a 3D reshape here is an
    unsupported Mosaic shape cast."""
    picked = jnp.where(diag, full, jnp.zeros_like(full))
    av = picked[:, :d]
    for i in range(1, hkv):
        av = av + picked[:, i * d : (i + 1) * d]
    return av


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


def _decode_kernel(
    pos_ref,            # SMEM (B,) — absolute position of the query per row
    q_ref,              # (1, H, D)
    k_ref,              # (1, CS, Hkv*D)
    v_ref,              # (1, CS, Hkv*D)
    o_ref,              # (1, H, D)
    m_scr,              # VMEM (H, LANES) f32
    l_scr,              # VMEM (H, LANES) f32
    acc_scr,            # VMEM (H, D) f32
    *,
    chunk: int,
    n_chunks: int,
    hkv: int,
    group: int,
    d: int,
    sm_scale: float,
):
    b = pl.program_id(0)
    ik = pl.program_id(1)
    pos = pos_ref[b]

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

    # chunks past the query position are fully masked — their compute is
    # predicated off AND their K/V DMAs never happen (the index map pins
    # the block index at pos//chunk for them)
    @pl.when(ik * chunk <= pos)
    def _run():
        q = q_ref[0]                                     # (H, D) bf16/f32
        kc = k_ref[0]                                    # (CS, Hkv*D)
        diag = _gqa_diag(hkv, group, d)                  # (H, Hkv*D)
        q_tiled = jnp.concatenate([q] * hkv, axis=1)     # (H, Hkv*D)
        q_bd = jnp.where(diag, q_tiled, jnp.zeros_like(q_tiled))
        s = jax.lax.dot_general(
            q_bd, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                     # (H, CS)

        s_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * chunk
        s = jnp.where(s_idx <= pos, s, NEG_INF)

        m_prev = m_scr[:]
        m_curr = jnp.max(s, axis=1, keepdims=True)       # (H, 1)
        m_next = jnp.maximum(m_prev[:, :1], m_curr)
        alpha = jnp.exp(m_prev[:, :1] - m_next)
        p = jnp.exp(s - m_next)                          # (H, CS)
        l_next = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_next, l_scr.shape)

        # ONE MXU pass for AV: (H, CS) @ (CS, Hkv*D) -> (H, Hkv*D); each
        # row then keeps only its own head's D-column slice.
        full = jax.lax.dot_general(
            p.astype(q.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (H, Hkv*D)
        acc_scr[:] = acc_scr[:] * alpha + _pick_own_head(full, diag, hkv, d)

    @pl.when(ik == n_chunks - 1)
    def _store():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[:] * l_inv).astype(o_ref.dtype)


def flash_decode_attention(
    q: jax.Array,         # (B, 1, H, D)
    k_cache: jax.Array,   # (B, S, Hkv, D)
    v_cache: jax.Array,
    positions: jax.Array,  # (B,) int32 — absolute position of each query
    *,
    chunk: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """One-query flash GQA attention against the KV cache.

    A single kernel per layer: one pass over the cache, online softmax in
    VMEM scratch, O(pos) HBM traffic — cache chunks past the query
    position are compute-predicated AND never DMA'd (the index map pins
    their block index, Mosaic skips the re-fetch).

    This is the default batch-1 decode attention (models/llama._attend).
    Round 1 measured it slower than the XLA einsum chain (958 vs 980
    tok/s); after the RoPE fold and the unstacked fast path it wins at
    every probed point (1088 vs 1043 tok/s on the bench harness at
    S=1024, and wider at deep positions — experiments/r2_bench_like.py,
    r2_append.py). Also the per-shard building block for ring/
    sequence-sharded decode (parallel/ring.py), where per-shard softmax
    state is required anyway.
    """
    B, T, H, D = q.shape
    S, Hkv = k_cache.shape[1], k_cache.shape[2]
    G = H // Hkv
    assert flash_decode_ok(q, k_cache, S, chunk), (
        f"shape gate failed: T={T} D={D} Hkv*D={Hkv * D} S={S} chunk={chunk}"
        " (S % chunk != 0 would dot Pallas-padded garbage rows in the last"
        " K chunk whenever pos >= S - S % chunk)"
    )
    n_chunks = S // chunk
    sm_scale = 1.0 / (D ** 0.5)

    q2 = q.reshape(B, H, D)
    kc = k_cache.reshape(B, S, Hkv * D)
    vc = v_cache.reshape(B, S, Hkv * D)
    pos = positions.astype(jnp.int32).reshape(B)

    def kv_index(b, ik, pos_ref):
        return (b, jnp.minimum(ik, pos_ref[b] // chunk), 0)

    out = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            chunk=chunk, n_chunks=n_chunks, hkv=Hkv, group=G, d=D,
            sm_scale=sm_scale,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_chunks),
            in_specs=[
                pl.BlockSpec((1, H, D), lambda b, ik, pos: (b, 0, 0)),
                pl.BlockSpec((1, chunk, Hkv * D), kv_index),
                pl.BlockSpec((1, chunk, Hkv * D), kv_index),
            ],
            out_specs=pl.BlockSpec((1, H, D), lambda b, ik, pos: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((H, LANES), jnp.float32),
                pltpu.VMEM((H, LANES), jnp.float32),
                pltpu.VMEM((H, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pos, q2, kc, vc)
    return out.reshape(B, 1, H, D)


def _paged_decode_kernel(
    pos_ref,            # SMEM (B,) — absolute position of the query per row
    table_ref,          # SMEM (B, MB) — block table (pool indices)
    q_ref,              # (1, H, D)
    k_hbm,              # ANY/HBM (N, BS, Hkv*D) — whole pool
    v_hbm,
    o_ref,              # (1, H, D)
    k_buf,              # VMEM (2, cb, BS, Hkv*D) — double-buffered chunk
    v_buf,              #   (per-block dims so one coalesced (cb, BS, kvd)
                        #   DMA and per-block (BS, kvd) copies both align)
    sems,               # DMA sems (2, cb, 2)
    m_scr, l_scr, acc_scr,
    *,
    bs: int,
    cb: int,            # pool blocks gathered per grid step
    chunk: int,         # cb * bs logical rows per grid step
    n_chunks: int,
    hkv: int,
    group: int,
    d: int,
    sm_scale: float,
    coalesce: bool = False,
):
    """Grid step (b, ik) covers logical rows [ik*chunk, (ik+1)*chunk):
    cb table-indirected pool blocks are DMA'd into ONE contiguous VMEM
    chunk buffer, then the dense decode kernel's exact compute runs —
    one score dot, one online-softmax update, one AV pass per chunk.

    Why manual DMA instead of per-block BlockSpec windows: at serving
    block sizes the per-block costs dominated (bs=32 ran at 52% of
    dense, bs=64 at 70%; xprof showed the paged kernel at 1145us/step
    vs dense 455us, experiments/r3_paged_gap.py + r3_paged_trace.py),
    and a sub-block-per-window rewrite only recovered ~5% because every
    window still pays its own buffering machinery and softmax update.
    Here the chunk buffer is double-buffered by hand: while chunk ik
    computes, chunk ik+1's blocks stream in — the same pipelining
    BlockSpec windows get automatically, but with dense-kernel-shaped
    compute. Chunks past the query position are never DMA'd at all
    (start/wait share the ``ci*chunk <= pos`` predicate).

    ``coalesce`` (TPU_LLM_PAGED_COALESCE=1): when a chunk's cb table
    entries are CONSECUTIVE pool indices (the common case — the
    allocator hands out sequential blocks per slot), ONE (cb, bs, kvd)
    DMA replaces the cb per-block copies. The r5 identical-harness gap
    attribution pinned the paged kernels' loss vs dense to exactly these
    scattered latency-bound small copies (BASELINE.md); the contiguity
    test reads only SMEM table entries, and non-contiguous chunks
    (prefix-cache shares, recycled blocks) take the per-block path
    unchanged."""
    b = pl.program_id(0)
    ik = pl.program_id(1)
    pos = pos_ref[b]
    mbm = table_ref.shape[1] - 1

    def _contig(ci):
        """(all cb entries consecutive, first entry). Raw (unclamped)
        entries: an unmapped tail (id 0 / arbitrary) fails the test and
        falls back to the clamped per-block path."""
        first = table_ref[b, jnp.minimum(ci * cb, mbm)]
        ok = jnp.bool_(cb > 0)
        for j in range(1, cb):
            ok = jnp.logical_and(
                ok, table_ref[b, jnp.minimum(ci * cb + j, mbm)] == first + j)
        return ok, first

    def _copies(ci, slot):
        """The cb block copies of chunk ``ci`` into buffer ``slot``."""
        out = []
        for j in range(cb):
            bid = table_ref[b, jnp.minimum(ci * cb + j, pos // bs)]
            out.append(pltpu.make_async_copy(
                k_hbm.at[bid], k_buf.at[slot, j], sems.at[slot, j, 0]))
            out.append(pltpu.make_async_copy(
                v_hbm.at[bid], v_buf.at[slot, j], sems.at[slot, j, 1]))
        return out

    def _coalesced(ci, slot):
        _, first = _contig(ci)
        return [
            pltpu.make_async_copy(k_hbm.at[pl.ds(first, cb)],
                                  k_buf.at[slot], sems.at[slot, 0, 0]),
            pltpu.make_async_copy(v_hbm.at[pl.ds(first, cb)],
                                  v_buf.at[slot], sems.at[slot, 0, 1]),
        ]

    def _start(ci, slot):
        if not coalesce:
            for c in _copies(ci, slot):
                c.start()
            return
        ok, _ = _contig(ci)

        @pl.when(ok)
        def _():
            for c in _coalesced(ci, slot):
                c.start()

        @pl.when(jnp.logical_not(ok))
        def _():
            for c in _copies(ci, slot):
                c.start()

    def _wait(ci, slot):
        if not coalesce:
            for c in _copies(ci, slot):
                c.wait()
            return
        ok, _ = _contig(ci)

        @pl.when(ok)
        def _():
            for c in _coalesced(ci, slot):
                c.wait()

        @pl.when(jnp.logical_not(ok))
        def _():
            for c in _copies(ci, slot):
                c.wait()

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)
        _start(0, 0)              # chunk 0 is always active (pos >= 0)

    active = ik * chunk <= pos

    @pl.when(active)
    def _run():
        slot = jax.lax.rem(ik, 2)

        # start the successor chunk's DMAs before blocking on ours
        @pl.when(jnp.logical_and(ik + 1 < n_chunks,
                                 (ik + 1) * chunk <= pos))
        def _prefetch():
            _start(ik + 1, 1 - slot)

        _wait(ik, slot)

        q = q_ref[0]                                     # (H, D)
        diag = _gqa_diag(hkv, group, d)                  # (H, Hkv*D)
        q_tiled = jnp.concatenate([q] * hkv, axis=1)
        q_bd = jnp.where(diag, q_tiled, jnp.zeros_like(q_tiled))
        kc = k_buf[slot].reshape(chunk, hkv * d)         # (chunk, Hkv*D)
        s = jax.lax.dot_general(
            q_bd, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                     # (H, chunk)
        s_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * chunk
        s = jnp.where(s_idx <= pos, s, NEG_INF)

        m_prev = m_scr[:]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev[:, :1], m_curr)
        alpha = jnp.exp(m_prev[:, :1] - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_next, l_scr.shape)

        full = jax.lax.dot_general(
            p.astype(q.dtype), v_buf[slot].reshape(chunk, hkv * d),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + _pick_own_head(full, diag, hkv, d)

    @pl.when(ik == n_chunks - 1)
    def _store():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[:] * l_inv).astype(o_ref.dtype)


def _paged_decode_q_kernel(
    pos_ref,            # SMEM (B,)
    table_ref,          # SMEM (B, MB)
    q_ref,              # (1, H, D)
    k_hbm,              # ANY/HBM (N, BS, Hkv*D) int8 pool
    v_hbm,
    ks_hbm,             # ANY/HBM (N*HP, SP) f32 2D scale pool — block b's
    vs_hbm,             #   scales are rows [b*HP, b*HP+Hkv) (see
                        #   paged_kv.scale_rows_per_block for why 2D)
    o_ref,              # (1, H, D)
    k_buf,              # VMEM (2, chunk, Hkv*D) int8
    v_buf,
    ks_buf,             # VMEM (2, cb, HP, SP) f32 — per-block planes
    vs_buf,             #   (concatenated along lanes in-kernel; a column
                        #   offset j*BS into one (Hkv, chunk) buffer would
                        #   not be a lane-aligned DMA destination, and the
                        #   pool's minor dim is padded to SP = lcm-128 for
                        #   the same Mosaic alignment rule)
    sems,               # DMA sems (2, cb, 4)
    m_scr, l_scr, acc_scr,
    *,
    bs: int,
    cb: int,
    chunk: int,
    n_chunks: int,
    hkv: int,
    hp: int,
    group: int,
    d: int,
    sm_scale: float,
    coalesce: bool = False,
):
    """int8-pool variant of _paged_decode_kernel: same manual-DMA chunk
    gather (incl. the ``coalesce`` contiguous-run fast path — the scale
    pool's rows for consecutive blocks are consecutive too, so k/v AND
    scale planes coalesce); the plane is contracted in its widened form
    and the per-(token, kv-head) scales are applied to the (H, chunk)
    score matrix — chunk multiplies per head instead of chunk x D (the
    same factorization as ops/attention._gqa_attention_int8_flat)."""
    b = pl.program_id(0)
    ik = pl.program_id(1)
    pos = pos_ref[b]
    mbm = table_ref.shape[1] - 1

    def _contig(ci):
        first = table_ref[b, jnp.minimum(ci * cb, mbm)]
        ok = jnp.bool_(cb > 0)
        for j in range(1, cb):
            ok = jnp.logical_and(
                ok, table_ref[b, jnp.minimum(ci * cb + j, mbm)] == first + j)
        return ok, first

    def _copies(ci, slot):
        out = []
        for j in range(cb):
            bid = table_ref[b, jnp.minimum(ci * cb + j, pos // bs)]
            for i, (hbm, buf) in enumerate(((k_hbm, k_buf), (v_hbm, v_buf))):
                out.append(pltpu.make_async_copy(
                    hbm.at[bid], buf.at[slot, j], sems.at[slot, j, i]))
            for i, (hbm, buf) in enumerate(((ks_hbm, ks_buf),
                                            (vs_hbm, vs_buf))):
                out.append(pltpu.make_async_copy(
                    hbm.at[pl.ds(bid * hp, hp)],
                    buf.at[slot, j],
                    sems.at[slot, j, 2 + i]))
        return out

    def _coalesced(ci, slot):
        # k/v pools coalesce into one (cb, BS, kvd) copy each; the scale
        # planes keep per-block copies (their dst is per-block-padded
        # (hp, sp) tiles — and r3 measured them free anyway), just at the
        # consecutive ids first+j
        _, first = _contig(ci)
        out = [
            pltpu.make_async_copy(k_hbm.at[pl.ds(first, cb)],
                                  k_buf.at[slot], sems.at[slot, 0, 0]),
            pltpu.make_async_copy(v_hbm.at[pl.ds(first, cb)],
                                  v_buf.at[slot], sems.at[slot, 0, 1]),
        ]
        for j in range(cb):
            for i, (hbm, buf) in enumerate(((ks_hbm, ks_buf),
                                            (vs_hbm, vs_buf))):
                out.append(pltpu.make_async_copy(
                    hbm.at[pl.ds((first + j) * hp, hp)],
                    buf.at[slot, j],
                    sems.at[slot, j, 2 + i]))
        return out

    def _io(ci, slot, op):
        if not coalesce:
            for c in _copies(ci, slot):
                getattr(c, op)()
            return
        ok, _ = _contig(ci)

        @pl.when(ok)
        def _():
            for c in _coalesced(ci, slot):
                getattr(c, op)()

        @pl.when(jnp.logical_not(ok))
        def _():
            for c in _copies(ci, slot):
                getattr(c, op)()

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)
        _io(0, 0, "start")

    active = ik * chunk <= pos

    @pl.when(active)
    def _run():
        slot = jax.lax.rem(ik, 2)

        @pl.when(jnp.logical_and(ik + 1 < n_chunks,
                                 (ik + 1) * chunk <= pos))
        def _prefetch():
            _io(ik + 1, 1 - slot, "start")

        _io(ik, slot, "wait")

        # int8 pool values are EXACT in bf16 (|q| <= 127 < 2^8), and the
        # MXU takes bf16 natively — widening to f32 instead cost ~2x on
        # the VPU (the all-f32 version of this kernel measured 4474
        # tok/s at b8/bs64 vs the dense-pool kernel's 6923)
        q = q_ref[0].astype(jnp.bfloat16)                # (H, D)
        diag = _gqa_diag(hkv, group, d)
        q_tiled = jnp.concatenate([q] * hkv, axis=1)
        q_bd = jnp.where(diag, q_tiled, jnp.zeros_like(q_tiled))
        kc = k_buf[slot].reshape(chunk, hkv * d).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q_bd, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                     # (H, chunk) f32
        # (cb, HP, SP) block scale planes -> (H, chunk) row scales
        # ([:hkv, :bs] drops the sublane/lane padding)
        ks = jnp.concatenate(
            [ks_buf[slot, j][:hkv, :bs] for j in range(cb)], axis=1)
        s = s * jnp.repeat(ks, group, axis=0)
        s_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * chunk
        s = jnp.where(s_idx <= pos, s, NEG_INF)

        m_prev = m_scr[:]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev[:, :1], m_curr)
        alpha = jnp.exp(m_prev[:, :1] - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_next, l_scr.shape)

        vs = jnp.concatenate(
            [vs_buf[slot, j][:hkv, :bs] for j in range(cb)], axis=1)
        pv = (p * jnp.repeat(vs, group, axis=0)).astype(jnp.bfloat16)
        full = jax.lax.dot_general(
            pv, v_buf[slot].reshape(chunk, hkv * d).astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + _pick_own_head(full, diag, hkv, d)

    @pl.when(ik == n_chunks - 1)
    def _store():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[:] * l_inv).astype(o_ref.dtype)


def _coalesce_enabled() -> bool:
    """Single-DMA fast path for chunks whose block-table entries are
    consecutive pool indices (the allocator's common case). ON by
    default — measured on-chip (r5_paged_coalesce.py, int8 bs=32
    prompt 512 batch 32): 7959.3 vs 7743.7 tok/s (+2.8%), no loss
    mechanism for scattered tables (they take the per-block path after
    a cb-read SMEM contiguity test). The +2.8% also REVISES the r5 gap
    attribution: merging the 16 scattered 8KB copies into one 128KB DMA
    recovers only a sliver of the paged-vs-dense gap (7.7k vs 16.9k),
    so the residual is the kernel's per-(batch, chunk) grid granularity
    — little compute per step against dense's contiguous streaming —
    not DMA issue rate. Block size remains the config lever.
    TPU_LLM_PAGED_COALESCE=0 opts out."""
    import os

    return os.environ.get("TPU_LLM_PAGED_COALESCE", "1") not in ("0", "")


def _chunk_blocks(bs: int, mb: int, kvd: int = 256,
                  itemsize: float = 2.0) -> int:
    """Pool blocks per grid step. Bigger chunks mean fewer grid steps
    and bigger DMAs — the b32/bs64 sweep (r3_chunk_rows_kernel.py) cut
    the int8 kernel 24% going 256 -> 512 rows (bf16 -11%); past 512 the
    return is marginal while short sequences pay more pinned-duplicate
    DMA. The double-buffered k+v windows are capped at ~4MB VMEM so
    large-kvd models (7B MHA: kvd 4096) keep the 256-row chunk."""
    budget_rows = int(4 * 1024 * 1024 / (4 * kvd * itemsize))
    target = max(256, min(512, budget_rows))
    return max(1, min(mb, target // bs))


def paged_flash_decode_q(
    q: jax.Array,            # (B, 1, H, D)
    k_pool: jax.Array,       # (N, BS, Hkv*D) int8
    v_pool: jax.Array,
    k_scale: jax.Array,      # (N*HP, SP) f32 2D pool — SP =
    v_scale: jax.Array,      #   scale_pool_width(BS), HP = scale_rows_per_
                             #   block(Hkv); only [:Hkv, :BS] of each
                             #   block's (HP, SP) tile is live
    block_table: jax.Array,  # (B, MB) int32
    positions: jax.Array,    # (B,) int32
    *,
    interpret: bool = False,
) -> jax.Array:
    """Paged flash decode over int8 pools (see _paged_decode_q_kernel)."""
    B, T, H, D = q.shape
    N, bs, kvd = k_pool.shape
    Hkv = kvd // D
    G = H // Hkv
    MB = block_table.shape[1]
    sp = k_scale.shape[-1]
    hp = k_scale.shape[0] // N
    assert T == 1 and D in (64, 128) and kvd % LANES == 0
    assert sp % LANES == 0 and sp >= bs, (
        f"scale pools must be lane-padded (paged_kv.scale_pool_width): "
        f"got minor dim {sp} for block_size {bs}")
    assert hp * N == k_scale.shape[0] and hp >= Hkv and hp % 8 == 0, (
        f"scale pools must be 2D (N*HP, SP), HP = "
        f"scale_rows_per_block(Hkv): got {k_scale.shape} for N={N}, "
        f"Hkv={Hkv}")
    sm_scale = 1.0 / (D ** 0.5)
    cb = _chunk_blocks(bs, MB, kvd=kvd, itemsize=1.0)
    chunk = cb * bs
    n_chunks = -(-MB // cb)

    q2 = q.reshape(B, H, D)
    pos = positions.astype(jnp.int32).reshape(B)

    out = pl.pallas_call(
        functools.partial(
            _paged_decode_q_kernel,
            bs=bs, cb=cb, chunk=chunk, n_chunks=n_chunks, hkv=Hkv, hp=hp,
            group=G, d=D, sm_scale=sm_scale, coalesce=_coalesce_enabled(),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_chunks),
            in_specs=[
                pl.BlockSpec((1, H, D), lambda b, ik, pos, tbl: (b, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, D),
                                   lambda b, ik, pos, tbl: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, cb, bs, kvd), k_pool.dtype),
                pltpu.VMEM((2, cb, bs, kvd), v_pool.dtype),
                pltpu.VMEM((2, cb, hp, sp), jnp.float32),
                pltpu.VMEM((2, cb, hp, sp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, cb, 4)),
                pltpu.VMEM((H, LANES), jnp.float32),
                pltpu.VMEM((H, LANES), jnp.float32),
                pltpu.VMEM((H, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pos, block_table.astype(jnp.int32), q2, k_pool, v_pool,
      k_scale, v_scale)
    return out.reshape(B, 1, H, D)


def paged_flash_decode_ok(q, k_pool, block_size: int) -> bool:
    """Shape gate for the paged decode kernel: lane-aligned head slices
    and sublane-tile-aligned pool blocks (a non-multiple block size would
    dot Pallas-padded garbage rows)."""
    B, T, H, D = q.shape
    kvd = k_pool.shape[-1]
    return (T == 1 and D in (64, 128) and kvd % LANES == 0
            and block_size % _group_rows(k_pool.dtype) == 0)


def paged_flash_decode_attention(
    q: jax.Array,            # (B, 1, H, D)
    k_pool: jax.Array,       # (N, BS, Hkv*D) — shared block pool
    v_pool: jax.Array,
    block_table: jax.Array,  # (B, MB) int32 pool indices
    positions: jax.Array,    # (B,) int32 — absolute position of each query
    *,
    interpret: bool = False,
) -> jax.Array:
    """One-query flash GQA attention over a PAGED cache.

    The kernel walks each sequence's logical blocks through the
    scalar-prefetched block table: grid step (b, ik) DMAs pool block
    ``table[b, ik]`` directly — no gather materializing the logical
    (B, MB*BS, Hkv*D) view in HBM (ops/paged_kv.paged_gather writes it
    out and reads it back; this reads each resident block once). Blocks
    past the query position are pinned to the block holding ``pos``, so
    HBM traffic is O(pos), not O(max_blocks).

    Caller contract (PagedEngine upholds both): every table entry for
    logical blocks <= pos//BS is mapped, and the row at ``pos`` was
    written before attending (write-then-attend). Causal masking makes
    rows past ``pos`` invisible, so trailing garbage in partially-filled
    blocks is harmless."""
    B, T, H, D = q.shape
    N, bs, kvd = k_pool.shape
    Hkv = kvd // D
    G = H // Hkv
    MB = block_table.shape[1]
    assert paged_flash_decode_ok(q, k_pool, bs)
    sm_scale = 1.0 / (D ** 0.5)
    cb = _chunk_blocks(bs, MB, kvd=kvd,
                       itemsize=float(jnp.dtype(k_pool.dtype).itemsize))
    chunk = cb * bs
    n_chunks = -(-MB // cb)

    q2 = q.reshape(B, H, D)
    pos = positions.astype(jnp.int32).reshape(B)

    out = pl.pallas_call(
        functools.partial(
            _paged_decode_kernel,
            bs=bs, cb=cb, chunk=chunk, n_chunks=n_chunks, hkv=Hkv, group=G,
            d=D, sm_scale=sm_scale, coalesce=_coalesce_enabled(),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_chunks),
            in_specs=[
                pl.BlockSpec((1, H, D), lambda b, ik, pos, tbl: (b, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, D),
                                   lambda b, ik, pos, tbl: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, cb, bs, kvd), k_pool.dtype),
                pltpu.VMEM((2, cb, bs, kvd), v_pool.dtype),
                pltpu.SemaphoreType.DMA((2, cb, 2)),
                pltpu.VMEM((H, LANES), jnp.float32),
                pltpu.VMEM((H, LANES), jnp.float32),
                pltpu.VMEM((H, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pos, block_table.astype(jnp.int32), q2, k_pool, v_pool)
    return out.reshape(B, 1, H, D)


def _decode_fused_kernel(
    pos_ref,            # SMEM (B,) — absolute position of the query per row
    q_ref,              # (1, H, D)
    k_ref,              # (1, CS, Hkv*D) — STALE cache chunk (rows >= g0 unused)
    v_ref,
    kcur_ref,           # (1, 1, Hkv*D) — this step's k/v
    vcur_ref,
    o_ref,              # (1, H, D)
    kplane_ref,         # ANY/HBM (B, S, Hkv*D) — aliased cache plane
    vplane_ref,
    kgrp, vgrp,         # VMEM (1, GR, Hkv*D) — the row group holding ``pos``
    m_scr, l_scr, acc_scr, dma_sem,
    *,
    chunk: int,
    n_chunks: int,
    hkv: int,
    group: int,
    d: int,
    gr: int,
    sm_scale: float,
):
    b = pl.program_id(0)
    ik = pl.program_id(1)
    pos = pos_ref[b]
    g0 = (pos // gr) * gr          # tile-aligned start of pos's row group

    diag = _gqa_diag(hkv, group, d)                      # (H, Hkv*D)
    q = q_ref[0]                                         # (H, D)
    q_tiled = jnp.concatenate([q] * hkv, axis=1)         # (H, Hkv*D)
    q_bd = jnp.where(diag, q_tiled, jnp.zeros_like(q_tiled))

    # start the group read early (waited at the final step, so its
    # latency hides behind the chunk passes). Reading from the ALIASED
    # output ref = reading the cache: a GR-row tile-aligned slice is a
    # legal Mosaic HBM access for this dtype (a single-row slice is not
    # — Mosaic rejects sub-(sublane-tile) slice shapes).
    @pl.when(ik == 0)
    def _start_group_read():
        pltpu.make_async_copy(
            kplane_ref.at[pl.ds(b, 1), pl.ds(g0, gr), :], kgrp, dma_sem.at[0]
        ).start()
        pltpu.make_async_copy(
            vplane_ref.at[pl.ds(b, 1), pl.ds(g0, gr), :], vgrp, dma_sem.at[1]
        ).start()

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

    # cache chunks cover rows [0, g0): STRICT mask s < g0 — rows in
    # [g0, pos] enter through the group merge below. When g0 == 0 no
    # chunk runs; the merge starts from (m, l) = (NEG_INF, 0) and
    # alpha = 0 annihilates the empty state exactly.
    @pl.when(ik * chunk < g0)
    def _run():
        kc = k_ref[0]                                    # (CS, Hkv*D)
        s = jax.lax.dot_general(
            q_bd, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                     # (H, CS)
        s_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * chunk
        s = jnp.where(s_idx < g0, s, NEG_INF)

        m_prev = m_scr[:]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev[:, :1], m_curr)
        alpha = jnp.exp(m_prev[:, :1] - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_next, l_scr.shape)

        full = jax.lax.dot_general(
            p.astype(q.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + _pick_own_head(full, diag, hkv, d)

    @pl.when(ik == n_chunks - 1)
    def _merge_group_and_store():
        # the read-modify-write append: insert this step's k/v at row
        # r = pos - g0 of the group and write the whole tile-aligned
        # group back to the aliased plane. Rows (pos, g0+GR) re-write
        # whatever the cache held — past the sequence head, don't-care.
        pltpu.make_async_copy(
            kplane_ref.at[pl.ds(b, 1), pl.ds(g0, gr), :], kgrp, dma_sem.at[0]
        ).wait()
        pltpu.make_async_copy(
            vplane_ref.at[pl.ds(b, 1), pl.ds(g0, gr), :], vgrp, dma_sem.at[1]
        ).wait()
        r = pos - g0
        row_sel = jax.lax.broadcasted_iota(jnp.int32, (gr, hkv * d), 0) == r
        new_k = jnp.where(row_sel, kcur_ref[0], kgrp[0])    # (GR, Hkv*D)
        new_v = jnp.where(row_sel, vcur_ref[0], vgrp[0])
        kgrp[0] = new_k
        vgrp[0] = new_v
        kw = pltpu.make_async_copy(
            kgrp, kplane_ref.at[pl.ds(b, 1), pl.ds(g0, gr), :], dma_sem.at[0]
        )
        vw = pltpu.make_async_copy(
            vgrp, vplane_ref.at[pl.ds(b, 1), pl.ds(g0, gr), :], dma_sem.at[1]
        )
        kw.start()
        vw.start()

        # online-softmax merge of the group columns j with g0 + j <= pos
        # (includes the current token at j = r)
        s_g = jax.lax.dot_general(
            q_bd.astype(jnp.float32), new_k.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                     # (H, GR)
        col = jax.lax.broadcasted_iota(jnp.int32, s_g.shape, 1)
        s_g = jnp.where(g0 + col <= pos, s_g, NEG_INF)

        m_prev = m_scr[:, :1]
        m_next = jnp.maximum(m_prev, jnp.max(s_g, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s_g - m_next)                        # (H, GR)
        l = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        full = jax.lax.dot_general(
            p, new_v.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (H, Hkv*D)
        acc = acc_scr[:] * alpha + _pick_own_head(full, diag, hkv, d)

        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc * l_inv).astype(o_ref.dtype)
        kw.wait()
        vw.wait()


def _group_rows(dtype) -> int:
    """Smallest tile-aligned row count for HBM slices of this dtype:
    Mosaic packs 32 bits per sublane row (f32: 8 rows/tile, bf16: 16,
    int8: 32)."""
    return 8 * 4 // jnp.dtype(dtype).itemsize


def flash_decode_fused(
    q: jax.Array,         # (B, 1, H, D)
    k_cache: jax.Array,   # flat (B, S, Hkv*D) dense plane — STALE at pos
    v_cache: jax.Array,
    k_cur: jax.Array,     # (B, 1, Hkv*D)
    v_cur: jax.Array,
    positions: jax.Array,  # (1,) or (B, 1) — query position(s)
    *,
    chunk: int = 256,
    interpret: bool = False,
):
    """Fused decode attention + in-kernel cache append: ONE kernel per
    layer replaces score-einsum + mask + softmax + AV-einsum + two
    dynamic_update_slice cache writes (~4us/layer of per-op overhead,
    experiments/r2_trace.py). The kernel reads the tile-aligned row
    group containing ``pos`` from the aliased plane (async, hidden
    behind the chunk passes), inserts the current k/v row, writes the
    group back, and merges the group's visible columns into the online
    softmax. No staging state leaks into the cache pytree — the planes
    are the only carry.

    Returns (attn (B, 1, H, D), k_cache', v_cache')."""
    B, T, H, D = q.shape
    S, HkvD = k_cache.shape[1], k_cache.shape[2]
    Hkv = HkvD // D
    G = H // Hkv
    gr = _group_rows(k_cache.dtype)
    chunk = min(chunk, S)
    assert T == 1 and S % chunk == 0 and HkvD % LANES == 0 and S % gr == 0
    assert chunk % gr == 0
    n_chunks = S // chunk
    sm_scale = 1.0 / (D ** 0.5)

    q2 = q.reshape(B, H, D)
    pos = jnp.broadcast_to(positions.astype(jnp.int32).reshape(-1)[:1], (B,)) \
        if positions.size == 1 else positions.astype(jnp.int32).reshape(B)

    def kv_index(b, ik, pos_ref):
        g0 = (pos_ref[b] // gr) * gr
        return (b, jnp.minimum(ik, jnp.maximum(g0 - 1, 0) // chunk), 0)

    out, k_new, v_new = pl.pallas_call(
        functools.partial(
            _decode_fused_kernel,
            chunk=chunk, n_chunks=n_chunks, hkv=Hkv, group=G, d=D, gr=gr,
            sm_scale=sm_scale,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_chunks),
            in_specs=[
                pl.BlockSpec((1, H, D), lambda b, ik, pos: (b, 0, 0)),
                pl.BlockSpec((1, chunk, HkvD), kv_index),
                pl.BlockSpec((1, chunk, HkvD), kv_index),
                pl.BlockSpec((1, 1, HkvD), lambda b, ik, pos: (b, 0, 0)),
                pl.BlockSpec((1, 1, HkvD), lambda b, ik, pos: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, H, D), lambda b, ik, pos: (b, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((1, gr, HkvD), k_cache.dtype),
                pltpu.VMEM((1, gr, HkvD), v_cache.dtype),
                pltpu.VMEM((H, LANES), jnp.float32),
                pltpu.VMEM((H, LANES), jnp.float32),
                pltpu.VMEM((H, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, D), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={2: 1, 3: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pos, q2, k_cache, v_cache,
      k_cur.astype(k_cache.dtype), v_cur.astype(v_cache.dtype))
    return out.reshape(B, 1, H, D), k_new, v_new


def flash_decode_ok(q, k_cache, S: int, chunk: int = 256) -> bool:
    """Shape gate for the decode kernel: lane-aligned head slices and a
    chunkable cache length."""
    B, T, H, D = q.shape
    Hkv = k_cache.shape[2]
    return (
        T == 1
        and D in (64, 128)
        and (Hkv * D) % LANES == 0
        and S % chunk == 0
        and H % Hkv == 0
    )


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
