"""Fused FFN megakernel vs the unfused two-matmul path (interpret mode on
CPU; the real-chip path is exercised by bench/CLI runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_llm.quant.pallas_ffn import ffn_fused_pallas, ffn_tiles_ok, _ffn_tiles
from tpu_llm.quant.qtensor import quantize_tensor, dequantize


@pytest.mark.parametrize("kind", ["q4_0", "q8_0"])
@pytest.mark.parametrize("rows", [1, 8])
def test_ffn_fused_matches_unfused(kind, rows):
    E, F = 512, 1024
    rng = np.random.default_rng(0)
    w13 = quantize_tensor(
        (rng.standard_normal((E, 2 * F)) * 0.05).astype(np.float32), kind
    )
    w2 = quantize_tensor(
        (rng.standard_normal((F, E)) * 0.05).astype(np.float32), kind
    )
    assert ffn_tiles_ok(E, F, w13, w2)
    x = jnp.asarray((rng.standard_normal((rows, E)) * 0.3).astype(np.float32)
                    ).astype(jnp.bfloat16)

    got = ffn_fused_pallas(x, w13, w2, interpret=True)

    # unfused reference with identical bf16 numerics
    w13d = dequantize(w13, jnp.bfloat16)
    w2d = dequantize(w2, jnp.bfloat16)
    h13 = jnp.dot(x, w13d, preferred_element_type=jnp.float32)
    a, b = h13[:, :F], h13[:, F:]
    g = (a * jax.nn.sigmoid(a) * b).astype(jnp.bfloat16)
    want = jnp.dot(g, w2d, preferred_element_type=jnp.float32).astype(x.dtype)

    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_ffn_tiles_tinyllama():
    # the flagship config must take the megakernel path
    assert _ffn_tiles(2048, 5632) is not None
    # and an incompatible shape must fall back
    assert _ffn_tiles(2048, 1000) is None
