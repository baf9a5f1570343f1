"""q6_k with bf16 scale planes (1.25 -> 1.125 B/w): q8_0 lost 16% with
packed scales, but q6_k's per-16 plane is 2x denser so the byte saving
is bigger. One-shot A/B on the model decode harness."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import jax, jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()
from tpu_llm.config import tinyllama_1_1b
from tpu_llm.runtime.bench_cli import synth_quant_llama, _decode_tok_s
from tpu_llm.quant.qtensor import QTensor
import jax.tree_util as jtu

cfg = tinyllama_1_1b()
params = synth_quant_llama(cfg, kind="q6_k")
jax.block_until_ready(jtu.tree_leaves(params)[0])
print(f"q6_k f32 scales:  {_decode_tok_s(params, cfg, 96, 1, 1024, 128):.1f} tok/s", flush=True)

def to_bf16(x):
    if isinstance(x, QTensor):
        return QTensor(q=x.q, scales=x.scales.astype(jnp.bfloat16),
                       kind=x.kind, mins=x.mins)
    return x
params2 = jtu.tree_map(to_bf16, params,
                       is_leaf=lambda x: isinstance(x, QTensor))
print(f"q6_k bf16 scales: {_decode_tok_s(params2, cfg, 96, 1, 1024, 128):.1f} tok/s", flush=True)
