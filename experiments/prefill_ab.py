"""Prefill-path A/B at T=128 (TTFT driver): the q4 Pallas kernels were
tuned for matvec decode; at 128 activation rows the dequant cost amortizes
differently and XLA's fused dequant+GEMM or a dense bf16 GEMM may win.

Variants (one full forward + lm_head on a 128-token prompt, TinyLlama):
  q4_pallas — production path
  q4_xla    — TPU_LLM_DISABLE_PALLAS: XLA dequant fused into dense dot
  bf16      — dense bf16 weights (upper bound for MXU prefill)
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from tpu_llm.config import tinyllama_1_1b
from tpu_llm.models import llama as M
from tpu_llm.models.llama import unstack_layers
from tpu_llm.quant.convert_params import fuse_llama_layers, quantize_llama_params

T = 128
REPS = 8


def bench(label, params, cfg, disable_pallas=False):
    if disable_pallas:
        os.environ["TPU_LLM_DISABLE_PALLAS"] = "1"
    else:
        os.environ.pop("TPU_LLM_DISABLE_PALLAS", None)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, T)), jnp.int32)

    @jax.jit
    def prefill(params, tokens, cache):
        hidden, cache = M.forward(params, cfg, tokens, cache, jnp.int32(0))
        logits = M.lm_head(params, cfg, hidden[:, -1:, :])[:, 0, :]
        return jnp.argmax(logits, -1).astype(jnp.int32), cache

    def once():
        cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16,
                             stacked=not isinstance(params["layers"], (list, tuple)))
        tok, c = prefill(params, tokens, cache)
        _ = np.asarray(tok)

    print(f"{label}: compiling...", flush=True)
    once()
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        once()
    dt = (time.perf_counter() - t0) / n
    print(f"{label:10s}: {dt*1e3:7.2f} ms per prefill128+first-token "
          f"(incl ~30ms tunnel RTT)", flush=True)


def main():
    cfg = tinyllama_1_1b()
    _, (params, _, _, _) = ge.entry()

    q4 = unstack_layers(quantize_llama_params(params, "q4_0", fuse=True))
    bench("q4_pallas", q4, cfg)
    bench("q4_xla", q4, cfg, disable_pallas=True)

    dense = unstack_layers(dict(params, layers=fuse_llama_layers(params["layers"])))
    bench("bf16", dense, cfg)


if __name__ == "__main__":
    main()
