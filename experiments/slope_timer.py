"""Slope-based on-device timing that cancels the tunnel round-trip.

Every host-side timing of a jitted scan includes a CONSTANT ~25-50 ms
axon-tunnel round trip (dispatch + result fetch), so t_measured/REPS is
inflated by roundtrip/REPS — at REPS=512 that is ~60-100 us/step, larger
than most kernels being measured. Fix: time the same program at REPS=R1
and REPS=R2 and report (t2 - t1)/(R2 - R1); the constant cancels.

time_scan_body(body, carry, args) returns us/step. `body(carry, *args)`
must return a carry of the same structure (chained, so nothing hoists).
Each REPS gets its own jit (length is static) — compile both before
timing. Repeat the pair measurement `pairs` times and take the median.
"""

import time

import numpy as np
import jax


def time_scan_body(body, carry, args=(), r1=128, r2=640, pairs=5, prep=None):
    def make(loop_len):
        @jax.jit
        def loop(carry, *args):
            if prep is not None:
                args = prep(*args)

            def step(c, _):
                return body(c, *args), None

            c, _ = jax.lax.scan(step, carry, None, length=loop_len)
            return c

        return loop

    loops = {r: make(r) for r in (r1, r2)}

    def run(r):
        c = loops[r](carry, *args)
        leaf = jax.tree_util.tree_leaves(c)[0]
        _ = np.asarray(leaf).ravel()[:1]

    # compile + warm both
    for r in (r1, r2):
        run(r)
        run(r)

    slopes = []
    for _ in range(pairs):
        t0 = time.perf_counter()
        run(r1)
        t1 = time.perf_counter()
        run(r2)
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (r2 - r1))
    return float(np.median(slopes) * 1e6)
