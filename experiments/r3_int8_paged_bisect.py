"""Bisect the int8 paged decode kernel's loss vs the dense-pool kernel
(BASELINE r2: b8/bs64 int8 pools 4480 vs dense pools 6935).

Candidates: (a) the 2cb extra tiny scale-block DMAs per chunk,
(b) the VPU scale application (cb-way concat + repeat(group) on the
score matrix, twice). Variants of the SAME kernel, attention op timed
in isolation (scan of 256 calls, slope-timed):

  full         — production kernel
  vpu_off      — scale DMAs issued, application skipped
  dma_off      — scale DMAs and application both skipped
  stacked      — k/v scales in ONE stacked pool: 3cb DMAs, same VPU work
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

from tpu_llm.ops.flash_attention import (LANES, NEG_INF, _chunk_blocks,
                                         _gqa_diag, _pick_own_head)


def kernel(pos_ref, table_ref, q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm,
           o_ref, k_buf, v_buf, ks_buf, vs_buf, sems,
           m_scr, l_scr, acc_scr, *,
           bs, cb, chunk, n_chunks, hkv, group, d, sm_scale, mode):
    b = pl.program_id(0)
    ik = pl.program_id(1)
    pos = pos_ref[b]
    n_dma = {"full": 4, "vpu_off": 4, "stacked": 3, "dma_off": 2}[mode]

    def _copies(ci, slot):
        out = []
        for j in range(cb):
            bid = table_ref[b, jnp.minimum(ci * cb + j, pos // bs)]
            for i, (hbm, buf) in enumerate(((k_hbm, k_buf), (v_hbm, v_buf))):
                out.append(pltpu.make_async_copy(
                    hbm.at[pl.ds(bid, 1)],
                    buf.at[pl.ds(slot, 1), pl.ds(j * bs, bs), :],
                    sems.at[slot, j, i]))
            if mode in ("full", "vpu_off"):
                for i, (hbm, buf) in enumerate(((ks_hbm, ks_buf),
                                                (vs_hbm, vs_buf))):
                    out.append(pltpu.make_async_copy(
                        hbm.at[pl.ds(bid, 1)],
                        buf.at[pl.ds(slot, 1), j],
                        sems.at[slot, j, 2 + i]))
            elif mode == "stacked":
                # ks_hbm here is (N, 2, Hkv, SP); one DMA covers k+v scales
                out.append(pltpu.make_async_copy(
                    ks_hbm.at[pl.ds(bid, 1)],
                    ks_buf.at[pl.ds(slot, 1), j],
                    sems.at[slot, j, 2]))
        return out

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)
        for c in _copies(0, 0):
            c.start()

    active = ik * chunk <= pos

    @pl.when(active)
    def _run():
        slot = jax.lax.rem(ik, 2)

        @pl.when(jnp.logical_and(ik + 1 < n_chunks,
                                 (ik + 1) * chunk <= pos))
        def _prefetch():
            for c in _copies(ik + 1, 1 - slot):
                c.start()

        for c in _copies(ik, slot):
            c.wait()

        q = q_ref[0].astype(jnp.bfloat16)
        diag = _gqa_diag(hkv, group, d)
        q_tiled = jnp.concatenate([q] * hkv, axis=1)
        q_bd = jnp.where(diag, q_tiled, jnp.zeros_like(q_tiled))
        kc = k_buf[slot].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q_bd, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        if mode == "full":
            ks = jnp.concatenate(
                [ks_buf[slot, j][:, :bs] for j in range(cb)], axis=1)
            s = s * jnp.repeat(ks, group, axis=0)
        elif mode == "stacked":
            ks = jnp.concatenate(
                [ks_buf[slot, j, 0][:, :bs] for j in range(cb)], axis=1)
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

        if mode == "full":
            vs = jnp.concatenate(
                [vs_buf[slot, j][:, :bs] for j in range(cb)], axis=1)
            pv = (p * jnp.repeat(vs, group, axis=0)).astype(jnp.bfloat16)
        elif mode == "stacked":
            vs = jnp.concatenate(
                [ks_buf[slot, j, 1][:, :bs] for j in range(cb)], axis=1)
            pv = (p * jnp.repeat(vs, group, axis=0)).astype(jnp.bfloat16)
        else:
            pv = p.astype(jnp.bfloat16)
        full = jax.lax.dot_general(
            pv, v_buf[slot].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + _pick_own_head(full, diag, hkv, d)

    @pl.when(ik == n_chunks - 1)
    def _store():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[:] * l_inv).astype(o_ref.dtype)


def build(mode, B=8, S=1024, H=32, Hkv=4, D=64, bs=16):
    kvd = Hkv * D
    G = H // Hkv
    MB = S // bs
    N = B * MB + 1
    sp = max(LANES, bs)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float32))
    k_pool = jnp.asarray(rng.integers(-127, 127, (N, bs, kvd), np.int8))
    v_pool = jnp.asarray(rng.integers(-127, 127, (N, bs, kvd), np.int8))
    if mode == "stacked":
        ks = jnp.asarray(
            rng.standard_normal((N, 2, Hkv, sp)).astype(np.float32))
        vs = ks  # unused
        scale_block = (2, Hkv, sp)
    else:
        ks = jnp.asarray(rng.standard_normal((N, Hkv, sp)).astype(np.float32))
        vs = jnp.asarray(rng.standard_normal((N, Hkv, sp)).astype(np.float32))
        scale_block = (Hkv, sp)
    table = jnp.asarray(
        np.arange(B * MB, dtype=np.int32).reshape(B, MB) + 1)
    pos = jnp.full((B,), S - 2, jnp.int32)
    sm = 1.0 / D ** 0.5
    cb = _chunk_blocks(bs, MB)
    chunk = cb * bs
    n_chunks = -(-MB // cb)

    f = pl.pallas_call(
        functools.partial(kernel, bs=bs, cb=cb, chunk=chunk,
                          n_chunks=n_chunks, hkv=Hkv, group=G, d=D,
                          sm_scale=sm, mode=mode),
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
                pltpu.VMEM((2, chunk, kvd), jnp.int8),
                pltpu.VMEM((2, chunk, kvd), jnp.int8),
                pltpu.VMEM((2, cb) + scale_block, jnp.float32),
                pltpu.VMEM((2, cb) + scale_block, jnp.float32),
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
    )

    @jax.jit
    def many(q, pos, table, kp, vp, ks, vs, n):
        def body(c, _):
            o = f(pos, table, c, kp, vp, ks, vs)
            return o, None
        out, _ = jax.lax.scan(body, q, None, length=256)
        return out

    def timed():
        t0 = time.perf_counter()
        out = many(q, pos, table, k_pool, v_pool, ks, vs, 256)
        _ = np.asarray(jax.device_get(out))[0, 0, 0]
        return time.perf_counter() - t0

    timed()
    best = min(timed() for _ in range(3))
    us = best / 256 * 1e6
    print(f"{mode:10s} bs={bs}: {us:8.2f} us/call")
    return us


if __name__ == "__main__":
    for bs in (16, 64):
        for mode in ("full", "vpu_off", "dma_off", "stacked"):
            build(mode, bs=bs)
