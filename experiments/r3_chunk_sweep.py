"""Dense flash decode chunk-size sweep: the kernel walks S/chunk grid
steps per row; r3_paged_trace measured dense b8 attention at 455us/step
vs a ~140us DMA floor, i.e. dominated by per-grid-step fixed cost. A
bigger chunk halves the steps at the same traffic (VMEM: 2 x chunk x
kvd x 2B x 2 buffers = 1MB at chunk=512)."""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax
import jax.numpy as jnp

from tpu_llm.runtime.compile_cache import enable_compile_cache
enable_compile_cache()

OUT = open("/tmp/r3_chunk.jsonl", "a")
T0 = time.time()


def emit(**row):
    row["t"] = round(time.time() - T0, 1)
    print(json.dumps(row), flush=True)
    OUT.write(json.dumps(row) + "\n")
    OUT.flush()


def main():
    from fast_params import synth_q4_llama
    from tpu_llm.models import llama as M
    import tpu_llm.ops.flash_attention as fa
    from tpu_llm.quant.convert_params import (fold_rope_interleave,
                                              unpack_params_int4)
    from tpu_llm.runtime.timing import slope_time_s

    params, cfg = synth_q4_llama(fused=True)
    params = M.unstack_layers(params)
    params, cfg = fold_rope_interleave(params, cfg)
    jax.block_until_ready(params["layers"][0]["wqkv"].q)
    emit(stage="params_ready")

    orig = fa.flash_decode_attention

    def make_dense(length, batch, chunk, defer=False):
        fa.flash_decode_attention = functools.partial(orig, chunk=chunk)
        cache = M.init_cache(cfg, batch, 1024, dtype=jnp.bfloat16,
                             stacked=False)
        token = jnp.ones((batch,), jnp.int32)

        @jax.jit
        def decode_n(params, token, cache, pos0):
            params = unpack_params_int4(params, pack_scales="bf16")

            def body(carry, _):
                token, cache, pos = carry
                logits, cache = M.decode_step(params, cfg, token, cache,
                                              pos, defer_kv=defer)
                token = jnp.argmax(logits, -1).astype(jnp.int32)
                return (token, cache, pos + 1), token

            (t_, c_, _), toks = jax.lax.scan(
                body, (token, cache, pos0), None, length=length)
            return toks, c_

        def run():
            toks, _ = decode_n(params, token, cache, jnp.int32(16))
            _ = np.asarray(toks[-1])

        return run

    try:
        for batch, chunk in ((8, 256), (8, 512), (8, 1024), (1, 512)):
            mk = functools.partial(make_dense, batch=batch, chunk=chunk)
            emit(metric=f"dense_b{batch}_chunk{chunk}",
                 tok_s=round(batch / slope_time_s(mk, 64, 320), 1))
    finally:
        fa.flash_decode_attention = orig

    emit(stage="DONE")


if __name__ == "__main__":
    main()
