"""Dump the optimized HLO of the 7B q4_0 decode scan body and count
copy/fusion ops with shapes — name the ~430us/step of data movement the
r3/r4 traces show (copy-done 354 + copy 73 us/step steady)."""
import collections, re, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import numpy as np
import jax
import jax.numpy as jnp
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

lowered = decode_n.lower(params, token, cache, jnp.int32(480))
compiled = lowered.compile()
hlo = compiled.as_text()
print("total HLO lines:", len(hlo.splitlines()))
# count copies by shape
pat = re.compile(r"=\s+(\S+)\[([\d,]*)\][^ ]*\s+copy\(")
counts = collections.Counter()
for m in pat.finditer(hlo):
    counts[(m.group(1), m.group(2))] += 1
for (dt, shape), n in counts.most_common(20):
    print(f"copy x{n}: {dt}[{shape}]")
# also dynamic-update-slice shapes
pat2 = re.compile(r"=\s+(\S+)\[([\d,]*)\][^ ]*\s+dynamic-update-slice\(")
c2 = collections.Counter()
for m in pat2.finditer(hlo):
    c2[(m.group(1), m.group(2))] += 1
for (dt, shape), n in c2.most_common(10):
    print(f"dus x{n}: {dt}[{shape}]")
