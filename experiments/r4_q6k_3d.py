"""A/B: q6_k int8 with repeated-2D scale multiply vs sublane-3D broadcast."""
import os, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import jax
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()
from tpu_llm.config import tinyllama_1_1b
from tpu_llm.runtime.bench_cli import synth_quant_llama, _decode_tok_s

cfg = tinyllama_1_1b()
for mode in ("2d", "3d"):
    if mode == "3d":
        os.environ["TPU_LLM_SCALE_3D"] = "1"
    else:
        os.environ.pop("TPU_LLM_SCALE_3D", None)
    params = synth_quant_llama(cfg, kind="q6_k")
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    print(f"q6_k int8 scale-{mode}: "
          f"{_decode_tok_s(params, cfg, 96, 1, 1024, 128):.1f} tok/s",
          flush=True)
