"""Decode-throughput benchmark (driver contract: prints ONE JSON line).

Measures single-chip TinyLlama-1.1B bf16 greedy decode tokens/s with the
all-on-device scan loop (no host round-trips), random weights (no
checkpoint ships with the repo — throughput is weight-content-independent).

Baseline anchor: the reference's best published single-stream number,
7.3 tok/s (f16 + C SIMD dot, one CPU core, /root/reference/README.md:13).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

REFERENCE_TOK_S = 7.3  # llm.f90 optimize16 branch, 1 CPU core (README.md:13)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--prompt-len", type=int, default=16)
    args = ap.parse_args()

    from tpu_llm.config import tinyllama_1_1b
    from tpu_llm.models import llama as M
    import __graft_entry__ as ge

    cfg = tinyllama_1_1b()
    _, (params, token, _, _) = ge.entry()
    cache = M.init_cache(cfg, args.batch, args.max_seq, dtype=jnp.bfloat16)
    token = jnp.ones((args.batch,), jnp.int32)

    @jax.jit
    def decode_n(params, token, cache, pos0, n_steps=args.steps):
        def body(carry, _):
            token, cache, pos = carry
            logits, cache = M.decode_step(params, cfg, token, cache, pos)
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (token, cache, pos + 1), token

        (token, cache, _), toks = jax.lax.scan(
            body, (token, cache, pos0), None, length=n_steps
        )
        return toks, cache

    import numpy as np

    # warmup / compile. NOTE: sync via host fetch, not block_until_ready —
    # under tunneled backends (axon) block_until_ready returns before the
    # device work completes and wildly overstates throughput.
    toks, cache = decode_n(params, token, cache, jnp.int32(args.prompt_len))
    _ = np.asarray(toks[-1])

    t0 = time.perf_counter()
    toks, cache = decode_n(params, token, cache, jnp.int32(args.prompt_len))
    _ = np.asarray(toks[-1])
    dt = time.perf_counter() - t0

    tok_s = args.steps * args.batch / dt
    print(json.dumps({
        "metric": "tinyllama_1.1b_bf16_decode_tokens_per_s_per_chip",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / REFERENCE_TOK_S, 2),
    }))


if __name__ == "__main__":
    main()
