"""Activation functions.

SiLU is written literally in the reference (``llama2.f90:615``,
``ssm/mamba.f90:481-486``): ``x * 1/(1+exp(-x))``. Softplus
(``ssm/mamba.f90:631``): ``log(1+exp(x))``; we use the numerically-stable
jax.nn version (identical in f32 for the magnitudes involved).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def softplus(x: jax.Array) -> jax.Array:
    return jax.nn.softplus(x)


def gelu(x: jax.Array) -> jax.Array:
    # phi-2 uses tanh-approximated ("new") GELU.
    return jax.nn.gelu(x, approximate=True)
