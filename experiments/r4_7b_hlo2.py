"""Print HLO context for the bf16[1,1024,4096] plane copies in the 7B
decode loop body: who produces/consumes them and why they don't alias."""
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
shown = 0
for i, ln in enumerate(lines):
    if "copy(" in ln and "bf16[1,1024,4096]" in ln:
        print("----- copy at line", i)
        # find the operand name and its producer; and the copy's consumers
        m = re.search(r"(%\S+)\s*=\s*\S+\s+copy\((%[\w\.\-]+)", ln)
        print(ln.strip()[:300])
        if m:
            res, opnd = m.group(1), m.group(2)
            for j, l2 in enumerate(lines):
                if l2.strip().startswith(opnd + " = "):
                    print("  producer:", l2.strip()[:300])
            used = [l2.strip()[:260] for l2 in lines
                    if res + "," in l2 or res + ")" in l2]
            for u in used[:4]:
                print("  consumer:", u)
        shown += 1
        if shown >= 2:
            break
