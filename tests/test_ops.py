import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import reference_impl as ref
from tpu_llm.ops.norms import rmsnorm, layernorm
from tpu_llm.ops.rope import apply_rope
from tpu_llm.ops.sampling import masked_softmax, greedy, sample_token


def test_rmsnorm_matches_fortran_semantics():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(64).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    expected = ref.rmsnorm(x, w)
    got = np.asarray(rmsnorm(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_rmsnorm_batched():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)
    got = np.asarray(rmsnorm(jnp.asarray(x), jnp.asarray(w)))
    for i in range(2):
        for j in range(3):
            np.testing.assert_allclose(
                got[i, j], ref.rmsnorm(x[i, j], w), rtol=1e-5, atol=1e-6
            )


def test_layernorm():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(48).astype(np.float32)
    w = rng.standard_normal(48).astype(np.float32)
    b = rng.standard_normal(48).astype(np.float32)
    mu, var = x.mean(), x.var()
    expected = (x - mu) / np.sqrt(var + 1e-5) * w + b
    got = np.asarray(layernorm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("variant", ["llmf90", "interleaved"])
@pytest.mark.parametrize("pos", [0, 1, 7])
def test_rope_variants_match_scalar_loop(variant, pos):
    rng = np.random.default_rng(3)
    H, D = 4, 16
    x = rng.standard_normal((1, 1, H, D)).astype(np.float32)
    flat = x.reshape(H * D)
    fn = ref.rope_llmf90 if variant == "llmf90" else ref.rope_interleaved
    expected = fn(flat, pos, D).reshape(1, 1, H, D)
    got = np.asarray(
        apply_rope(jnp.asarray(x), jnp.asarray([pos], dtype=jnp.int32), variant=variant)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_rope_neox_pairs():
    # neox rotates (j, j+rot/2); pos 0 must be identity
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 1, 2, 8)).astype(np.float32)
    got = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray([0]), variant="neox"))
    np.testing.assert_allclose(got, x, rtol=1e-6)


def test_rope_partial_dims_passthrough():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 1, 2, 16)).astype(np.float32)
    got = np.asarray(
        apply_rope(jnp.asarray(x), jnp.asarray([3]), variant="neox", rope_dims=8)
    )
    np.testing.assert_allclose(got[..., 8:], x[..., 8:], rtol=1e-6)
    assert not np.allclose(got[..., :8], x[..., :8])


def test_masked_softmax_matches_truncation():
    rng = np.random.default_rng(6)
    x = rng.standard_normal(32).astype(np.float32)
    for n in (1, 5, 32):
        expected = ref.softmax_trunc(x, n)
        got = np.asarray(masked_softmax(jnp.asarray(x), n))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)


def test_greedy_first_max():
    x = jnp.asarray([0.0, 3.0, 3.0, 1.0])
    assert int(greedy(x)) == 1


def test_sample_temperature_zero_is_greedy():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray([[0.1, 2.0, -1.0]])
    tok = sample_token(key, logits, temperature=0.0)
    assert int(tok[0]) == 1


def test_sample_cdf_statistics():
    key = jax.random.PRNGKey(0)
    logits = jnp.log(jnp.asarray([0.7, 0.2, 0.1]))
    keys = jax.random.split(key, 512)
    toks = jax.vmap(lambda k: sample_token(k, logits, temperature=1.0))(keys)
    counts = np.bincount(np.asarray(toks), minlength=3) / 512
    np.testing.assert_allclose(counts, [0.7, 0.2, 0.1], atol=0.08)


def test_sample_top_k():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray([5.0, 4.0, -10.0, -10.0])
    keys = jax.random.split(key, 64)
    toks = jax.vmap(lambda k: sample_token(k, logits, temperature=1.0, top_k=2))(keys)
    assert set(np.asarray(toks).tolist()) <= {0, 1}


def test_rope_table_matches_apply_rope():
    import jax.numpy as jnp
    import numpy as np

    from tpu_llm.ops.rope import apply_rope, apply_rope_table, rope_table

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 16)), jnp.float32)
    positions = jnp.asarray([5, 6, 7], jnp.int32)
    for variant in ("interleaved", "neox", "llmf90"):
        table = rope_table(32, 16, 10000.0, variant)
        direct = apply_rope(x, positions, 10000.0, variant)
        via_table = apply_rope_table(x, table, positions, variant)
        np.testing.assert_array_equal(
            np.asarray(direct), np.asarray(via_table))


def test_rope_table_partial_dims():
    import jax.numpy as jnp
    import numpy as np

    from tpu_llm.ops.rope import apply_rope, apply_rope_table, rope_table

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 2, 2, 32)), jnp.float32)
    positions = jnp.asarray([0, 9], jnp.int32)
    table = rope_table(16, 32, 10000.0, "neox", rope_dims=16)
    direct = apply_rope(x, positions, 10000.0, "neox", rope_dims=16)
    via = apply_rope_table(x, table, positions, "neox", rope_dims=16)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(via))
