"""bf16 scale planes LOST on 7B deep-regime (150.3 -> 146.6) but the A/B
was confounded: halving scale bytes changes w2's tile 1024 -> 2816.
Re-run bf16 scales with the f32-choice tiles pinned (clamp tk<=1024 for
K=11264) to separate plane-bytes from tile-geometry effects."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import jax
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()
from tpu_llm.config import llama2_7b
from tpu_llm.runtime.bench_cli import synth_quant_llama, _decode_tok_s
from tpu_llm.quant import pallas_matmul as PM

cfg = llama2_7b()
params = synth_quant_llama(cfg)
jax.block_until_ready(params["layers"][0]["wqkv"].q)

orig = PM._pick_tiles
def clamped(K, N, *a, **kw):
    tk, tn = orig(K, N, *a, **kw)
    if K == 11264 and tk is not None and tk > 1024:
        tk = 1024
    return tk, tn
PM._pick_tiles = clamped

tok_s = _decode_tok_s(params, cfg, 128, 1, 1024, 128, pack_scales="bf16")
print(f"7b q4_0 scales=bf16 + w2 tk<=1024: {tok_s:.1f} tok/s", flush=True)
