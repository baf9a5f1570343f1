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


import numpy as np
import jax


def time_scan_body(body, carry, args=(), r1=128, r2=640, pairs=5, prep=None):
    """us/step. Thin wrapper over the production measurement protocol
    (tpu_llm.runtime.timing.slope_time_s) that builds the two-length
    jitted scans from a step body."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tpu_llm.runtime.timing import slope_time_s

    def make_run(loop_len):
        @jax.jit
        def loop(carry, *args):
            if prep is not None:
                args = prep(*args)

            def step(c, _):
                return body(c, *args), None

            c, _ = jax.lax.scan(step, carry, None, length=loop_len)
            return c

        def run():
            c = loop(carry, *args)
            leaf = jax.tree_util.tree_leaves(c)[0]
            _ = np.asarray(leaf).ravel()[:1]

        return run

    return slope_time_s(make_run, r1, r2, pairs=pairs) * 1e6
