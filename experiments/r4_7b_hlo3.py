"""Map the per-step copy-start/copy-done pairs (trace: ~354us/step) to
their HLO shapes/operands in the 7B decode loop."""
import re, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import numpy as np, jax, jax.numpy as jnp
from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()
from tpu_llm.config import llama2_7b
from tpu_llm.models import llama as M
from tpu_llm.runtime.bench_cli import synth_quant_llama
from tpu_llm.quant.convert_params import unpack_params_int4

cfg = llama2_7b()
params = synth_quant_llama(cfg)
cache = M.init_cache(cfg, 1, 1024, dtype=jnp.bfloat16, stacked=False)
token = jnp.ones((1,), jnp.int32)

@jax.jit
def decode_n(params, token, cache, pos0):
    params = unpack_params_int4(params)
    def body(i, c):
        token, cache, pos = c
        logits, cache = M.decode_step(params, cfg, token, cache, pos)
        return (jnp.argmax(logits, -1).astype(jnp.int32), cache, pos + 1)
    return jax.lax.fori_loop(0, 16, body, (token, cache, pos0))

hlo = decode_n.lower(params, token, cache, jnp.int32(480)).compile().as_text()
lines = hlo.splitlines()
# find the while-loop BODY region (exclude entry): copy-start defs inside
import collections
shapes = collections.Counter()
for i, ln in enumerate(lines):
    m = re.search(r"%copy-start[\w\.]* = \(([^,]+),", ln)
    if m:
        # operand
        mo = re.search(r"copy-start[\w\.]*\((%[\w\.\-]+)", ln)
        shapes[(m.group(1), mo.group(1).split('.')[0] if mo else "?")] += 1
for (shape, opnd), n in shapes.most_common(20):
    print(f"copy-start x{n}: {shape}  operand {opnd}")
