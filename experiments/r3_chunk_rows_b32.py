"""A/B the paged kernel's chunk size (target_rows in _chunk_blocks) at
batch 32: after the 2D-scale fix, paged int8 b32 = 11319 vs dense int8
14491 — is the residual gap grid-step/DMA granularity?"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

import tpu_llm.ops.flash_attention as FA

B = 32


def run(target_rows, cache="int8", steps=192):
    orig = FA._chunk_blocks
    FA._chunk_blocks = lambda bs, mb, target_rows=target_rows: \
        max(1, min(mb, target_rows // bs))
    try:
        from tpu_llm.config import tinyllama_1_1b
        from tpu_llm.runtime.bench_cli import synth_quant_llama
        from tpu_llm.runtime.paged_engine import PagedEngine
        from tpu_llm.runtime.batching import Request

        cfg = tinyllama_1_1b()
        params = synth_quant_llama(cfg)
        jax.block_until_ready(params["layers"][0]["wqkv"].q)
        dt = {"bf16": jnp.bfloat16, "int8": jnp.int8}[cache]
        eng = PagedEngine(params, cfg, batch=B, n_blocks=B * 17 + 8,
                          max_seq=1024, block_size=64, cache_dtype=dt)
        for i in range(B):
            eng.submit(Request(prompt=[7 + i % 50] * 128, max_new=840))
        for _ in range(40):
            eng.step()
        t0 = time.perf_counter()
        for _ in range(steps):
            eng.step()
        eng._collect()
        dt_s = time.perf_counter() - t0
        tok_s = B * steps / dt_s
        print(f"target_rows={target_rows} cache={cache}: {tok_s:.0f} tok/s",
              flush=True)
    finally:
        FA._chunk_blocks = orig


if __name__ == "__main__":
    for tr in (256, 512, 1024):
        run(tr)
