"""Rotary position embeddings.

Three variants (see ``tpu_llm.config.ROPE_VARIANTS``):

- ``"interleaved"``: llama2.c / GGUF "NORM" rope. Per head of size D, pair j
  rotates dims (2j, 2j+1) by angle ``pos * theta^(-2j/D)``, pos 0-based.
- ``"neox"``: half-rotation. Pair j rotates dims (j, j + rot/2) by
  ``pos * theta^(-2j/rot)`` where rot = rope_dims (partial RoPE, phi-2) or D.
- ``"llmf90"``: bit-exact reproduction of the reference's inline loop
  (``llama2.f90:543-559``). The Fortran iterates 1-based flat dims i=1,3,5,...
  with exponent ``mod(i, head_size)`` and angle ``pos * freq`` with pos
  starting at 1 — i.e. per head, pair j uses exponent (2j+1)/D and an
  effective position of pos+1. Same pairing as "interleaved", exponents and
  positions each shifted by one. Kept so parity tests can match the Fortran
  bit-for-bit; real checkpoints should use "interleaved".

All math in float32; everything is vectorized over (batch, time, heads) so
XLA fuses the rotation into the surrounding QKV matmul — no scalar loops.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# RoPE context-extension scaling, spelled as (type, factor, orig_ctx):
#   "linear" — frequencies divided by factor (llama.cpp rope.scale_linear /
#              rope.scaling.type=linear); positions are effectively
#              compressed by 1/factor.
#   "yarn"   — per-dim interpolation/extrapolation ramp + attention
#              magnitude correction, matching ggml's rope_yarn with the
#              default beta_fast=32 / beta_slow=1 / ext_factor=1: dims that
#              complete >beta_fast rotations inside the original context
#              are extrapolated (unscaled), dims with <beta_slow rotations
#              are fully interpolated (freq/factor), with a linear ramp
#              between, and cos/sin are scaled by 1 + 0.1*ln(factor).
RopeScaling = Tuple[str, float, int]


def _yarn_corr_dim(n_rot: int, orig_ctx: int, n_rotations: float,
                   theta: float) -> float:
    # dim index whose wavelength completes `n_rotations` turns in orig_ctx
    return (n_rot * math.log(orig_ctx / (n_rotations * 2 * math.pi))
            / (2 * math.log(theta)))


def _scaled_freqs(freq: jax.Array, j: jax.Array, rot: int, theta: float,
                  scaling: Optional[RopeScaling]):
    """Apply context scaling to the base frequencies; returns (freq, mscale)."""
    if scaling is None:
        return freq, 1.0
    kind, factor, orig_ctx = scaling
    if kind == "linear":
        return freq / factor, 1.0
    if kind == "yarn":
        low = max(math.floor(_yarn_corr_dim(rot, orig_ctx, 32.0, theta)), 0)
        high = min(math.ceil(_yarn_corr_dim(rot, orig_ctx, 1.0, theta)),
                   rot - 1)
        ramp = 1.0 - jnp.clip((j - low) / max(0.001, high - low), 0.0, 1.0)
        # ramp is the EXTRAPOLATION weight: 1 for low j (high-frequency dims
        # that complete >beta_fast turns in orig_ctx stay unscaled), 0 for
        # high j (slow dims fully interpolated to freq/factor).
        freq = (freq / factor) * (1.0 - ramp) + freq * ramp
        return freq, 1.0 + 0.1 * math.log(factor)
    raise ValueError(f"unknown rope scaling kind {kind!r}")


def rope_angles(
    positions: jax.Array,
    head_dim: int,
    theta: float = 10000.0,
    variant: str = "interleaved",
    rope_dims: Optional[int] = None,
    scaling: Optional[RopeScaling] = None,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given positions.

    positions: int array (...,) — 0-based token positions.
    Returns (cos, sin), each shaped positions.shape + (rot//2,), float32.
    """
    rot = rope_dims if rope_dims is not None else head_dim
    if rot % 2:
        raise ValueError("rotated dim count must be even")
    j = jnp.arange(rot // 2, dtype=jnp.float32)
    if variant == "llmf90":
        # Fortran exponent mod(i, head_size) for 1-based odd i -> 2j+1, over
        # the full head size (partial rope is not a reference feature).
        exponent = (2.0 * j + 1.0) / head_dim
        pos = positions.astype(jnp.float32) + 1.0  # reference pos starts at 1
    else:
        exponent = (2.0 * j) / rot
        pos = positions.astype(jnp.float32)
    freq = theta ** (-exponent)
    freq, mscale = _scaled_freqs(freq, j, rot, theta, scaling)
    ang = pos[..., None] * freq
    if mscale != 1.0:
        return jnp.cos(ang) * mscale, jnp.sin(ang) * mscale
    return jnp.cos(ang), jnp.sin(ang)


def rope_table(
    max_pos: int,
    head_dim: int,
    theta: float = 10000.0,
    variant: str = "interleaved",
    rope_dims: Optional[int] = None,
    scaling: Optional[RopeScaling] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Precomputed (cos, sin) tables for positions 0..max_pos-1, each
    (max_pos, rot//2) float32.

    The reference carries a vestigial generator for exactly this pos x freq
    outer product (``get_rope_freqs``, read_ggml.f90:541-559 /
    load.f90:538-556 — call sites commented out). Here it is live: decode
    loops can gather one row per step (``apply_rope_table``) instead of
    recomputing sin/cos, and converters can bake the table next to the
    weights."""
    positions = jnp.arange(max_pos, dtype=jnp.int32)
    return rope_angles(positions, head_dim, theta, variant, rope_dims, scaling)


def apply_rope_table(
    x: jax.Array,            # (..., T, H, D)
    table: Tuple[jax.Array, jax.Array],
    positions: jax.Array,    # (T,) or (B, T)
    variant: str = "interleaved",
    rope_dims: Optional[int] = None,
) -> jax.Array:
    """apply_rope with a precomputed table: gathers rows of (cos, sin)
    instead of evaluating transcendentals. Bit-identical to apply_rope for
    the same variant/theta (the table rows ARE rope_angles outputs; the
    llmf90 position shift is baked into the table, its pairing is
    interleaved)."""
    cos_t, sin_t = table
    cos = jnp.take(cos_t, positions, axis=0)
    sin = jnp.take(sin_t, positions, axis=0)
    return _rotate(x, cos, sin, variant, rope_dims)


def _rotate(x, cos, sin, variant, rope_dims):
    *lead, T, H, D = x.shape
    rot = rope_dims if rope_dims is not None else D
    # cos/sin (..., T, rot//2) -> (..., T, 1, rot//2) to broadcast over heads
    cos = jnp.expand_dims(cos, axis=-2)
    sin = jnp.expand_dims(sin, axis=-2)

    xf = x.astype(jnp.float32)
    xr, x_pass = xf[..., :rot], xf[..., rot:]
    if variant == "neox":
        x0, x1 = xr[..., : rot // 2], xr[..., rot // 2 :]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rotated = jnp.concatenate([r0, r1], axis=-1)
    else:  # interleaved / llmf90
        xp = xr.reshape(*xr.shape[:-1], rot // 2, 2)
        x0, x1 = xp[..., 0], xp[..., 1]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rotated = jnp.stack([r0, r1], axis=-1).reshape(*xr.shape)
    if rot < D:
        rotated = jnp.concatenate([rotated, x_pass], axis=-1)
    return rotated.astype(x.dtype)


def apply_rope(
    x: jax.Array,
    positions: jax.Array,
    theta: float = 10000.0,
    variant: str = "interleaved",
    rope_dims: Optional[int] = None,
    scaling: Optional[RopeScaling] = None,
) -> jax.Array:
    """Rotate ``x`` of shape (..., T, H, D) by position-dependent angles.

    positions broadcasts against x's (..., T) leading shape (typically (T,)
    or (B, T)).
    """
    D = x.shape[-1]
    cos, sin = rope_angles(positions, D, theta, variant, rope_dims, scaling)
    return _rotate(x, cos, sin, variant, rope_dims)
