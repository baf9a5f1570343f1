"""A/B: q4_k decode with the affine mins applied on the VPU (broadcast
add over the (tk, tn) tile — the round-3 shipped path, 832.8 tok/s ~87%
of roofline) vs as MXU work ((per-block x sums) @ mins — 1/32 the MACs,
no full-tile add). VERDICT r3 item 3."""
import os, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import jax
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

from tpu_llm.config import tinyllama_1_1b
from tpu_llm.runtime.bench_cli import synth_quant_llama, _decode_tok_s

cfg = tinyllama_1_1b()

def row(kind, mode):
    if mode == "vpu":
        os.environ["TPU_LLM_MINS_VPU"] = "1"
    else:
        os.environ.pop("TPU_LLM_MINS_VPU", None)
    params = synth_quant_llama(cfg, kind=kind)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    tok_s = _decode_tok_s(params, cfg, 96, 1, 1024, 128)
    print(f"{kind} mins={mode}: {tok_s:.1f} tok/s", flush=True)
    return tok_s

if __name__ == "__main__":
    a = row("q4_k", "vpu")
    b = row("q4_k", "mxu")
    print(f"q4_k mins->MXU speedup: {b/a:.3f}x", flush=True)
    # q6_k has no mins plane; row for drift reference
    row("q6_k", "mxu")
