"""Decode-throughput benchmark (driver contract: prints ONE JSON line).

Headline config (BASELINE.json): TinyLlama-1.1B Q4_0 single-chip greedy
decode tokens/s, measured with the all-on-device scan loop (no host
round-trips), random weights quantized to packed Q4_0 (throughput is
weight-content-independent).

Baseline anchor: the reference's best published single-stream number,
7.3 tok/s (f16 + C SIMD dot, one CPU core, /root/reference/README.md:13).

Sync is by host fetch: under tunneled backends (axon) block_until_ready
returns before device work completes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _stage(msg: str) -> None:
    """Progress on stderr (stdout stays the one JSON line): localizes
    hangs — under axon every compile is REMOTE, so a stuck compile looks
    like an idle process from the host."""
    print(f"[bench +{time.monotonic() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.monotonic()

REFERENCE_TOK_S = 7.3  # llm.f90 optimize16 branch, 1 CPU core (README.md:13)


def build_params(quant: str, cfg=None):
    import dataclasses

    import jax

    import __graft_entry__ as ge
    from tpu_llm.models.llama import unstack_layers
    from tpu_llm.quant.convert_params import (
        fold_rope_interleave, fuse_llama_layers, quantize_llama_params,
    )

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if (quant in ("q4_0", "q8_0") and cfg is not None and on_tpu
            and not os.environ.get("TPU_LLM_BENCH_HOST_QUANT")):
        # Device-side packed synth (same path the 7B rows use): the host
        # quantize route moves ~3 GB through the tunnel (device RNG ->
        # host fetch -> numpy quantize -> upload) — 5+ minutes at the
        # tunnel's good ~10 MB/s and 20+ when it degrades, all before a
        # single measured step. The synth builds the same packed QTensor
        # layouts with on-device RNG in seconds; throughput is
        # weight-content-independent (kernels, tiles, and HBM traffic are
        # identical). The measured program also matches the folded-RoPE
        # form: random weights need no column permutation, so setting
        # rope_variant="neox" compiles the exact relayout-free rotation
        # the fold produces. TPU_LLM_BENCH_HOST_QUANT=1 restores the old
        # host path (useful when validating the quantize/fold chain).
        from tpu_llm.runtime.bench_cli import synth_quant_llama

        cfg = dataclasses.replace(cfg, rope_variant="neox")
        return synth_quant_llama(cfg, kind=quant), cfg
    if os.environ.get("TPU_LLM_BENCH_TINY") and cfg is not None:
        from tpu_llm.runtime.bench_cli import random_llama_params

        params = random_llama_params(cfg)
    else:
        _, (params, _, _, _) = ge.entry()
    if quant != "none":
        params = quantize_llama_params(params, quant, fuse=True)
    else:
        params = dict(params, layers=fuse_llama_layers(params["layers"]))
    params = unstack_layers(params)
    if cfg is not None:
        # fold interleaved RoPE into the wq/wk column order: the rotation
        # becomes the relayout-free neox form (-30us/step; exact up to f32
        # summation order — tests/test_llama.py::test_fold_rope_interleave)
        params, cfg = fold_rope_interleave(params, cfg)
    return params, cfg


def measure(params, cfg, steps: int, batch: int, max_seq: int, prompt_len: int,
            i4: bool = True, cache_dtype=jnp.bfloat16, defer_kv: bool = True,
            pack_scales="bf16"):
    from tpu_llm.models import llama as M
    from tpu_llm.quant.convert_params import unpack_params_int4

    cache = M.init_cache(cfg, batch, max_seq, dtype=cache_dtype,
                         stacked=not isinstance(params["layers"], (list, tuple)))
    token = jnp.ones((batch,), jnp.int32)
    # defer_kv (attend stale cache + explicit current k/v, fused append)
    # and bf16 scale planes are the measured-best batch-1 config:
    # 1113.4 tok/s vs 1095.3 for the round-1 defaults (r2_full_measure,
    # 2026-08-18). defer_kv needs the unstacked dense-cache path; only
    # batch 1 is chip-validated, so batched runs keep the eager append.
    defer_kv = (defer_kv and batch == 1 and cache_dtype != "int8"
                and isinstance(params["layers"], (list, tuple)))

    def make_run(length):
        @jax.jit
        def decode_n(params, token, cache, pos0):
            if i4:
                # one hoisted repack pass before the scan: q4_0 nibbles ->
                # int4 planes (same HBM bytes, hardware widening in-kernel)
                params = unpack_params_int4(params, pack_scales=pack_scales)

            def body(carry, _):
                token, cache, pos = carry
                logits, cache = M.decode_step(params, cfg, token, cache, pos,
                                              defer_kv=defer_kv)
                token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (token, cache, pos + 1), token

            (token, cache, _), toks = jax.lax.scan(
                body, (token, cache, pos0), None, length=length
            )
            return toks, cache

        def run():
            _stage(f"dispatch decode_n(length={length})")
            toks, _ = decode_n(params, token, cache, jnp.int32(prompt_len))
            _stage("dispatched; fetching")
            _ = np.asarray(toks[-1])  # sync by fetch
            _stage("fetched")

        return run

    # Slope timing between a short and a 5x scan: the tunnel's constant
    # ~30ms dispatch+fetch round trip cancels (total/steps would
    # overstate per-step time by RT/steps). Both scans must stay inside
    # the cache: positions reach prompt_len + 5*steps, and
    # dynamic_update_slice would silently clamp past max_seq.
    from tpu_llm.runtime.timing import slope_time_s

    steps = min(steps, max(1, (max_seq - prompt_len - 1) // 5))
    return batch / slope_time_s(make_run, steps, steps * 5)


def main():
    import os as _os

    if not _os.environ.get("TPU_LLM_NO_COMPILE_CACHE"):
        from tpu_llm.runtime.compile_cache import enable_compile_cache

        enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--prompt-len", type=int, default=16)
    ap.add_argument("--quant", default="q4_0", choices=["none", "q4_0", "q8_0"])
    ap.add_argument("--no-i4", action="store_true",
                    help="keep the manual uint8 nibble-unpack kernel")
    ap.add_argument("--cache-dtype", default="bf16",
                    choices=["f32", "bf16", "int8"])
    ap.add_argument("--no-defer-kv", action="store_true",
                    help="eager per-layer cache appends (round-1 path)")
    ap.add_argument("--pack-scales", default="bf16",
                    choices=["none", "f16", "bf16"],
                    help="Q4_0 scale-plane storage for the int4 fast path")
    args = ap.parse_args()

    from tpu_llm.config import LlamaConfig, tinyllama_1_1b

    if os.environ.get("TPU_LLM_BENCH_TINY"):
        # smoke mode: exercise the FULL bench path (quantize, fold,
        # int4 repack, scan, slope timing) on toy shapes — catches
        # harness breakage without a chip or a 20-minute compile
        cfg = LlamaConfig(dim=64, hidden_dim=128, n_layers=2, n_heads=4,
                          n_kv_heads=2, vocab_size=256, seq_len=256)
    else:
        cfg = tinyllama_1_1b()
    _stage("building params")
    params, cfg = build_params(args.quant, cfg)
    _stage("params built")
    cache_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                   "int8": "int8"}[args.cache_dtype]
    tok_s = measure(params, cfg, args.steps, args.batch, args.max_seq,
                    args.prompt_len, i4=not args.no_i4,
                    cache_dtype=cache_dtype,
                    defer_kv=not args.no_defer_kv,
                    pack_scales=(False if args.pack_scales == "none"
                                 else args.pack_scales))

    name = "bf16" if args.quant == "none" else args.quant
    print(json.dumps({
        "metric": f"tinyllama_1.1b_{name}_decode_tokens_per_s_per_chip",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / REFERENCE_TOK_S, 2),
    }))


if __name__ == "__main__":
    main()
