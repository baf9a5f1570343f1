"""A/B: q6_k decode — int8 plane (1.25 B/w, r3 shipped, 456.7 tok/s) vs
the packed 6-bit layout (1.0 B/w, pack_q6_k): the roofline itself moves
578 -> 723 tok/s. Also re-checks q4_k with the mins->MXU kernel."""
import os, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import jax
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

from tpu_llm.config import tinyllama_1_1b
from tpu_llm.runtime.bench_cli import synth_quant_llama, _decode_tok_s

cfg = tinyllama_1_1b()

def row(kind, label, env=None):
    if env:
        os.environ[env] = "1"
    params = synth_quant_llama(cfg, kind=kind)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    tok_s = _decode_tok_s(params, cfg, 96, 1, 1024, 128)
    print(f"{label}: {tok_s:.1f} tok/s", flush=True)
    if env:
        del os.environ[env]
    return tok_s

if __name__ == "__main__":
    a = row("q6_k", "q6_k int8-plane (default)")
    b = row("q6_k", "q6_k packed 6-bit (TPU_LLM_Q6K_PACK)", env="TPU_LLM_Q6K_PACK")
    print(f"q6_k packed speedup: {b/a:.3f}x", flush=True)
