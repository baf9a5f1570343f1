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
# locate the while body: lines between "%while_body" and its closing; crude:
# just print every copy-start line fully (dedup by shape+metadata op_name)
seen = {}
for ln in lines:
    if "copy-start" in ln and "= (" in ln:
        m = re.search(r"= \((\S+?)\{", ln)
        meta = re.search(r'op_name="([^"]*)"', ln)
        opnd = re.search(r"copy-start[\w\.]*\((%[\w\.\-]+)\)", ln)
        key = (m.group(1) if m else "?", meta.group(1) if meta else "-",
               (opnd.group(1)[:40] if opnd else "?"))
        seen[key] = seen.get(key, 0) + 1
for (shape, op_name, opnd), n in sorted(seen.items(), key=lambda kv: -kv[1]):
    print(f"x{n}  {shape:24s} op_name={op_name[:70]} operand={opnd}")
