"""Why does the KV-cache dynamic_update_slice copy the whole plane?

xprof (experiments/b32_attn_trace.py) shows every cache update in the
batch-32 decode scan costs 27us — the price of copying the (32,1024,4,64)
int8 plane, not of writing one (32,1,4,64) row. Inside a lax.scan body
the old carry buffer is dead after the update, so XLA *should* alias.

Variants (all: 22 planes as a list carry, one dus per plane per step,
chained; slope-timed):
  write_only      — dus only, carry = planes
  write_then_read — dus then jnp.sum of a slice (attention-like read)
  einsum_read     — dus then einsum contraction like gqa_attention
  stacked         — single (22, B, S, H*D) plane, per-layer dus
  flat_layout     — planes shaped (B, S, 256) instead of (B, S, 4, 64)
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/experiments")
from slope_timer import time_scan_body  # noqa: E402

B, S, Hkv, D = 32, 1024, 4, 64
L = 22


def main():
    rng = np.random.default_rng(0)
    row = jnp.asarray(rng.integers(-127, 127, (B, 1, Hkv, D)), jnp.int8)
    planes = [jnp.zeros((B, S, Hkv, D), jnp.int8) for _ in range(L)]

    def write_only(c, row):
        planes, pos = c
        out = []
        for p in planes:
            p = jax.lax.dynamic_update_slice(
                p, row, (jnp.int32(0), pos, jnp.int32(0), jnp.int32(0)))
            out.append(p)
        return (out, pos + 1)

    us = time_scan_body(write_only, (planes, jnp.int32(16)), (row,),
                        r1=32, r2=160)
    print(f"write_only     : {us:8.1f} us/step ({us/L:5.2f}/plane)", flush=True)

    q = jnp.asarray(rng.standard_normal((B, Hkv, 8, D)), jnp.bfloat16)

    def einsum_read(c, row, q):
        planes, pos = c
        out = []
        acc = jnp.float32(0)
        for p in planes:
            p = jax.lax.dynamic_update_slice(
                p, row, (jnp.int32(0), pos, jnp.int32(0), jnp.int32(0)))
            s = jnp.einsum("bhgd,bshd->bhgs", q, p.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            acc = acc + jnp.sum(s) * 1e-9
            out.append(p)
        return (out, pos + (acc * 0).astype(jnp.int32) + 1)

    us = time_scan_body(einsum_read, (planes, jnp.int32(16)), (row, q),
                        r1=32, r2=160)
    print(f"einsum_read    : {us:8.1f} us/step ({us/L:5.2f}/plane)", flush=True)

    for label, dt, flat in (("flat_int8", jnp.int8, True),
                            ("flat_bf16", jnp.bfloat16, True),
                            ("4d_bf16", jnp.bfloat16, False)):
        shape = (B, S, Hkv * D) if flat else (B, S, Hkv, D)
        rshape = (B, 1, Hkv * D) if flat else (B, 1, Hkv, D)
        planes2 = [jnp.zeros(shape, dt) for _ in range(L)]
        row2 = row.reshape(rshape).astype(dt)
        zeros = tuple(jnp.int32(0) for _ in range(len(shape) - 2))

        def write2(c, row2):
            planes, pos = c
            out = []
            for p in planes:
                p = jax.lax.dynamic_update_slice(
                    p, row2, (jnp.int32(0), pos) + zeros)
                out.append(p)
            return (out, pos + 1)

        us = time_scan_body(write2, (planes2, jnp.int32(16)), (row2,),
                            r1=32, r2=160)
        print(f"{label:15s}: {us:8.1f} us/step ({us/L:5.2f}/plane)",
              flush=True)

    # int8 scale planes: logical (B, S, Hkv) f32 pads lanes 4 -> 128
    # (16.8MB physical). Try flat (B, S*Hkv) and transposed (B, Hkv, S).
    svariants = [
        ("scales_BSH", (B, S, Hkv), (B, 1, Hkv), 1),
        ("scales_BSxH", (B, S * Hkv), (B, Hkv), 1),      # write at pos*Hkv
        ("scales_BHS", (B, Hkv, S), (B, Hkv, 1), 2),     # write at lane pos
    ]
    for label, shape, rshape, pos_axis in svariants:
        planes3 = [jnp.zeros(shape, jnp.float32) for _ in range(L)]
        row3 = jnp.ones(rshape, jnp.float32)

        def write3(c, row3, shape=shape, rshape=rshape, pos_axis=pos_axis):
            planes, pos = c
            out = []
            for p in planes:
                if len(shape) == 2:
                    idx = (jnp.int32(0), pos * Hkv)
                elif pos_axis == 1:
                    idx = (jnp.int32(0), pos, jnp.int32(0))
                else:
                    idx = (jnp.int32(0), jnp.int32(0), pos)
                p = jax.lax.dynamic_update_slice(p, row3, idx)
                out.append(p)
            return (out, pos + 1)

        us = time_scan_body(write3, (planes3, jnp.int32(16)), (row3,),
                            r1=32, r2=160)
        print(f"{label:15s}: {us:8.1f} us/step ({us/L:5.2f}/plane)",
              flush=True)

    stacked = jnp.zeros((L, B, S, Hkv * D), jnp.int8)
    row_f = row.reshape(B, 1, Hkv * D)

    def stacked_w(c, row_f):
        planes, pos = c
        for i in range(L):
            planes = jax.lax.dynamic_update_slice(
                planes, row_f[None],
                (jnp.int32(i), jnp.int32(0), pos, jnp.int32(0)))
        return (planes, pos + 1)

    us = time_scan_body(stacked_w, (stacked, jnp.int32(16)), (row_f,),
                        r1=32, r2=160)
    print(f"stacked_write  : {us:8.1f} us/step ({us/L:5.2f}/plane)", flush=True)


if __name__ == "__main__":
    main()
