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
