"""Device-side speculative decoding A/B (VERDICT r4 #3): the on-device
draft/verify/accept loop (engine._spec_scan_impl) vs the plain all-device
scan, single stream, TinyLlama q4_0 synth weights.

The r4 host-loop spec rows ran at ~30 tok/s (tunnel round trip per
verify); the device loop should MULTIPLY the ~1180 tok/s scan rate by the
acceptance on repetitive prompts and roughly match it on random ones
(each verify forward streams the same weight bytes as a plain step).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

import os
if not os.environ.get("TPU_LLM_NO_COMPILE_CACHE"):
    from tpu_llm.runtime.compile_cache import enable_compile_cache
    enable_compile_cache()

from tpu_llm.config import tinyllama_1_1b
from tpu_llm.runtime.bench_cli import synth_quant_llama
from tpu_llm.runtime.engine import Engine, ModelAdapter


def run(eng, prompt, n_new, spec_k):
    t0 = time.time()
    res = eng.generate(prompt, n_new=n_new, use_scan=True,
                       speculative_k=spec_k, add_bos=False)
    wall = time.time() - t0
    return res, wall


def main():
    cfg = tinyllama_1_1b()
    params = synth_quant_llama(cfg)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    adapter = ModelAdapter.llama(cfg, cache_dtype=jnp.bfloat16, bos_id=1)
    eng = Engine(params, adapter, max_seq=1024)

    rng = np.random.default_rng(0)
    pat = [int(t) for t in rng.integers(10, 2000, 8)]
    rep_prompt = (pat * 16)[:96]                    # strongly repetitive
    rnd_prompt = [int(t) for t in rng.integers(10, 30000, 96)]
    n_new = 512

    for label, prompt in (("repetitive", rep_prompt), ("random", rnd_prompt)):
        rows = {}
        for spec_k in (0, 4, 8):
            # warm (compile), then 2 timed runs, best
            run(eng, prompt, n_new, spec_k)
            best = None
            for _ in range(2):
                res, _ = run(eng, prompt, n_new, spec_k)
                best = max(best or 0.0, res.tokens_per_s)
            rows[spec_k] = (best, res.tokens[-8:])
            fwd, tok = eng.stats["spec_forwards"], eng.stats["spec_tokens"]
            eng.stats = {"spec_forwards": 0, "spec_tokens": 0}
            print(json.dumps({
                "prompt": label, "spec_k": spec_k,
                "tok_s": round(best, 1),
                "tokens_per_forward": round(tok / fwd, 3) if fwd else None,
            }), flush=True)
        # exactness: spec streams must equal the plain greedy stream
        for spec_k in (4, 8):
            assert rows[spec_k][1] == rows[0][1], (label, spec_k)
        print(json.dumps({
            "prompt": label,
            "speedup_k4": round(rows[4][0] / rows[0][0], 3),
            "speedup_k8": round(rows[8][0] / rows[0][0], 3),
        }), flush=True)


if __name__ == "__main__":
    main()
