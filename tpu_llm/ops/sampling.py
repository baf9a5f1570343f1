"""Token sampling.

The reference supports exactly two modes (``llama2.f90:386-393``): greedy
argmax at temperature 0, and temperature softmax followed by an inverse-CDF
multinomial draw (``sample`` at ``llama2.f90:428-447``: scan the CDF, return
the first index where r < cdf, falling back to the last index). We reproduce
those semantics with an explicit JAX PRNG key (deterministic per seed at any
world size), and additionally provide top-k / top-p for the framework API.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_softmax(x: jax.Array, n: int) -> jax.Array:
    """Reference ``softmax(x, s)`` (llama2.f90:468-478): softmax over the
    first ``n`` entries, zeros elsewhere. Used by parity tests; the model
    uses additive-mask softmax which is numerically identical."""
    xn = x[..., :n]
    p = jax.nn.softmax(xn.astype(jnp.float32), axis=-1)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, x.shape[-1] - n)]
    return jnp.pad(p, pad)


def greedy(logits: jax.Array) -> jax.Array:
    """Argmax over the vocab (first max wins, like Fortran ``maxloc``)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _cdf_sample(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Inverse-CDF draw: first index with r < cdf (llama2.f90:436-444)."""
    cdf = jnp.cumsum(probs, axis=-1)
    r = jax.random.uniform(key, probs.shape[:-1] + (1,), dtype=probs.dtype)
    # first index where cdf > r; fall back to last index like the reference
    idx = jnp.sum((cdf <= r).astype(jnp.int32), axis=-1)
    return jnp.minimum(idx, probs.shape[-1] - 1).astype(jnp.int32)


def filtered_sample(
    logits: jax.Array,
    key: jax.Array,
    temperature: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
    min_p: Optional[jax.Array] = None,
) -> jax.Array:
    """Branch-free greedy/top-k/min-p/top-p/CDF sampling over TRACED knobs.

    One-row variant (vocab,) for ``jax.vmap`` across batch slots: every
    argument may differ per slot without recompiling the decode step.
    ``top_k == 0``, ``top_p >= 1.0``, and ``min_p == 0`` are identity
    filters, and ``temperature == 0`` short-circuits to greedy — so a
    single compiled step serves any mix of per-request sampling settings.
    Filter order: top-k on logits, then min-p, then the top-p nucleus.
    min-p drops tokens with prob < min_p * max_prob where the probs are
    softmax of the UN-temperature-scaled logits — llama.cpp's sampler
    chain applies temperature last, so its min_p kept-set is
    temperature-independent and this matches it exactly. (top-p here
    operates on the temperature-scaled distribution, which llama.cpp's
    temp-last chain does not; the reference has none of these filters.)
    """
    v = logits.shape[-1]
    t = jnp.maximum(temperature, 1e-8)
    x0 = logits.astype(jnp.float32)
    # traced top-k: ascending sort, threshold at the (V-k)'th entry
    # (temperature-monotone, so masking raw logits == masking scaled)
    k = jnp.clip(top_k.astype(jnp.int32), 0, v)
    sx = jnp.sort(x0, axis=-1)
    kth = jax.lax.dynamic_index_in_dim(
        sx, v - jnp.maximum(k, 1), keepdims=False)
    x0 = jnp.where((k > 0) & (x0 < kth), -jnp.inf, x0)
    if min_p is not None:
        praw = jax.nn.softmax(x0, axis=-1)
        floor = jnp.max(praw, axis=-1, keepdims=False) * min_p
        x0 = jnp.where(praw < floor, -jnp.inf, x0)
    probs = jax.nn.softmax(x0 / t, axis=-1)
    # traced top-p: nucleus cutoff; p >= 1.0 keeps everything
    sp = jnp.sort(probs, axis=-1)[..., ::-1]
    csum = jnp.cumsum(sp, axis=-1)
    keep = csum - sp < jnp.minimum(top_p, 1.0)
    cutoff = jnp.min(jnp.where(keep, sp, jnp.inf), axis=-1, keepdims=False)
    probs = jnp.where(probs < cutoff, 0.0, probs)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    sampled = _cdf_sample(key, probs)
    return jnp.where(temperature > 0, sampled, greedy(logits))


def sample_token(
    key: jax.Array,
    logits: jax.Array,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> jax.Array:
    """Sample next token ids from logits (..., vocab).

    temperature == 0 -> greedy. Otherwise softmax(logits/temperature) and an
    inverse-CDF multinomial draw; optional top-k / top-p filtering applied
    to the logits first (framework extension; the reference has neither).
    """
    if temperature == 0.0:
        return greedy(logits)
    x = logits.astype(jnp.float32) / temperature
    if top_k is not None and top_k > 0:
        kth = jnp.sort(x, axis=-1)[..., -top_k][..., None]
        x = jnp.where(x < kth, -jnp.inf, x)
    probs = jax.nn.softmax(x, axis=-1)
    if top_p is not None and 0.0 < top_p < 1.0:
        sorted_p = jnp.sort(probs, axis=-1)[..., ::-1]
        csum = jnp.cumsum(sorted_p, axis=-1)
        # smallest prob still inside the nucleus
        keep = csum - sorted_p < top_p
        cutoff = jnp.min(jnp.where(keep, sorted_p, jnp.inf), axis=-1, keepdims=True)
        probs = jnp.where(probs < cutoff, 0.0, probs)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    return _cdf_sample(key, probs)
