import numpy as np
import pytest

import jax.numpy as jnp

from tpu_llm.ops.attention import gqa_attention
from tpu_llm.ops.flash_attention import flash_gqa_attention


def make(B=2, T=32, S=64, H=4, Hkv=2, D=16, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, T, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((B, S, Hkv, D)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("offset", [0, 7, 30])
def test_flash_matches_einsum(offset):
    q, k, v = make()
    positions = offset + jnp.arange(32, dtype=jnp.int32)
    expected = gqa_attention(q, k, v, positions)
    got = flash_gqa_attention(
        q, k, v, jnp.int32(offset), block_q=16, block_k=16, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )


def test_flash_single_tile():
    q, k, v = make(B=1, T=8, S=8, H=2, Hkv=1, D=8, seed=1)
    positions = jnp.arange(8, dtype=jnp.int32)
    expected = gqa_attention(q, k, v, positions)
    got = flash_gqa_attention(
        q, k, v, jnp.int32(0), block_q=8, block_k=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )


def test_flash_mha_large_blocks():
    q, k, v = make(B=1, T=64, S=128, H=2, Hkv=2, D=32, seed=2)
    positions = 50 + jnp.arange(64, dtype=jnp.int32)
    expected = gqa_attention(q, k, v, positions)
    got = flash_gqa_attention(
        q, k, v, jnp.int32(50), block_q=32, block_k=64, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("pos", [0, 3, 77, 511])
def test_flash_decode_matches_einsum(pos):
    from tpu_llm.ops.flash_attention import flash_decode_attention

    q, k, v = make(B=2, T=1, S=512, H=8, Hkv=2, D=64, seed=2)
    positions = jnp.full((2,), pos, jnp.int32)
    expected = gqa_attention(q, k, v, jnp.asarray([[pos], [pos]], jnp.int32))
    got = flash_decode_attention(q, k, v, positions, chunk=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )


def test_flash_decode_per_row_positions():
    from tpu_llm.ops.flash_attention import flash_decode_attention

    q, k, v = make(B=3, T=1, S=256, H=4, Hkv=4, D=64, seed=3)
    positions = jnp.asarray([5, 130, 255], jnp.int32)
    expected = gqa_attention(q, k, v, positions[:, None])
    got = flash_decode_attention(q, k, v, positions, chunk=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("pos", [0, 5, 7, 8, 63, 190])
@pytest.mark.parametrize("batch", [1, 2])
def test_flash_decode_fused_matches_einsum(pos, batch):
    """Fused attention + in-kernel cache append (aliased planes): output
    equals write-then-attend einsum attention; the returned planes hold
    the appended row at pos; rows past pos inside the tile-aligned row
    group are don't-care (rewritten from the stale cache); rows beyond
    the group are untouched."""
    from tpu_llm.ops.attention import update_kv_cache
    from tpu_llm.ops.flash_attention import _group_rows, flash_decode_fused

    B, S, H, Hkv, D = batch, 256, 8, 2, 64
    rng = np.random.default_rng(1000 + pos)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((B, S, Hkv * D)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((B, S, Hkv * D)).astype(np.float32))
    k_cur = jnp.asarray(rng.standard_normal((B, 1, Hkv * D)).astype(np.float32))
    v_cur = jnp.asarray(rng.standard_normal((B, 1, Hkv * D)).astype(np.float32))
    positions = jnp.asarray([pos], jnp.int32)

    kc_ref, vc_ref = update_kv_cache(
        kc, vc, k_cur.reshape(B, 1, Hkv, D), v_cur.reshape(B, 1, Hkv, D),
        jnp.int32(pos))
    expected = gqa_attention(q, kc_ref, vc_ref, positions)

    got, kc_new, vc_new = flash_decode_fused(
        q, kc, vc, k_cur, v_cur, positions, chunk=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)
    # visible rows (<= pos) must match the write-then-attend reference
    np.testing.assert_allclose(np.asarray(kc_new)[:, : pos + 1],
                               np.asarray(kc_ref)[:, : pos + 1],
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(vc_new)[:, : pos + 1],
                               np.asarray(vc_ref)[:, : pos + 1],
                               rtol=0, atol=0)
    # rows beyond pos's row group are untouched
    gr = _group_rows(kc.dtype)
    g_end = (pos // gr) * gr + gr
    np.testing.assert_allclose(np.asarray(kc_new)[:, g_end:],
                               np.asarray(kc)[:, g_end:], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(vc_new)[:, g_end:],
                               np.asarray(vc)[:, g_end:], rtol=0, atol=0)


def test_flash_decode_fused_multistep_parity():
    """Chained fused-append decode steps equal write-then-attend decode
    over a whole token sequence (the in-model usage pattern)."""
    from tpu_llm.ops.attention import update_kv_cache
    from tpu_llm.ops.flash_attention import flash_decode_fused

    B, S, H, Hkv, D = 1, 128, 4, 2, 64
    rng = np.random.default_rng(7)
    kc = jnp.zeros((B, S, Hkv * D), jnp.float32)
    vc = jnp.zeros((B, S, Hkv * D), jnp.float32)
    kc_ref, vc_ref = kc, vc
    for pos in range(10):
        q = jnp.asarray(rng.standard_normal((B, 1, H, D)).astype(np.float32))
        k_cur = jnp.asarray(
            rng.standard_normal((B, 1, Hkv * D)).astype(np.float32))
        v_cur = jnp.asarray(
            rng.standard_normal((B, 1, Hkv * D)).astype(np.float32))
        positions = jnp.asarray([pos], jnp.int32)

        kc_ref, vc_ref = update_kv_cache(
            kc_ref, vc_ref, k_cur.reshape(B, 1, Hkv, D),
            v_cur.reshape(B, 1, Hkv, D), jnp.int32(pos))
        expected = gqa_attention(q, kc_ref, vc_ref, positions)

        got, kc, vc = flash_decode_fused(
            q, kc, vc, k_cur, v_cur, positions, chunk=64, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-5, atol=2e-5)
