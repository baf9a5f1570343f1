"""7B q4_0 scale-plane A/B on the SHIPPED deep-regime harness
(_decode_tok_s slope, positions 128..768): f32 vs bf16 vs f16-bit planes.
r3b found f16 wins shallow-fori but loses here; bf16 was never tried on
7B. f32 scales cap the roofline at ~195 tok/s (4.2 GB/token); 16-bit
planes move it to ~210."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import jax
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()
from tpu_llm.config import llama2_7b
from tpu_llm.runtime.bench_cli import synth_quant_llama, _decode_tok_s

cfg = llama2_7b()
params = synth_quant_llama(cfg)
jax.block_until_ready(params["layers"][0]["wqkv"].q)
for mode in (False, "bf16", "f16"):
    tok_s = _decode_tok_s(params, cfg, 128, 1, 1024, 128, pack_scales=mode)
    print(f"7b q4_0 scales={mode or 'f32'}: {tok_s:.1f} tok/s", flush=True)
