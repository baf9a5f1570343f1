"""Mamba decode: stacked lax.scan layer loop vs unstacked python loop.

The llama decode path won ~28% by unstacking (scan dynamic-slices every
layer's params per step). Mamba-130M decode measures 1172 tok/s against
a ~2240 tok/s f32 HBM roofline (366 MB/token) — is the scan slice-copy
the gap? Also probes a bf16-weights variant (halves the bytes; not the
reference's f32 numerics — would ship as an opt-in dtype).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/experiments")
sys.path.insert(0, "/root/repo")
from slope_timer import time_scan_body  # noqa: E402

from tpu_llm.config import mamba_130m  # noqa: E402
from tpu_llm.models import mamba as M  # noqa: E402
from tpu_llm.runtime.bench_cli import _build_mamba  # noqa: E402


def unstack(params, L):
    out = dict(params)
    out["layers"] = [
        {k: v[i] for k, v in params["layers"].items()} for i in range(L)
    ]
    return out


def token_step_unstacked(params, cfg, emb_row, state):
    hidden = emb_row
    residual = jnp.zeros_like(emb_row)
    conv_new, ssm_new = [], []
    for i, lp in enumerate(params["layers"]):
        from tpu_llm.ops.norms import rmsnorm

        xb = rmsnorm(hidden + residual, lp["norm"], cfg.norm_eps)
        residual = hidden + residual
        hidden, c, s = M._mixer_step(
            cfg, lp, xb, state["conv"][i], state["ssm"][i]
        )
        conv_new.append(c)
        ssm_new.append(s)
    from tpu_llm.ops.norms import rmsnorm

    hidden = rmsnorm(hidden + residual, params["norm_f"], cfg.norm_eps)
    return hidden, {"conv": conv_new, "ssm": ssm_new}


def main():
    cfg = mamba_130m()
    params, _ = _build_mamba()
    batch = 1
    token = jnp.ones((batch,), jnp.int32)

    def run_stacked(c, params):
        tok, state = c
        emb = jnp.take(params["tok_emb"], tok[:, None], axis=0)
        hidden, state = M._token_step(params, cfg, emb[:, 0], state)
        logits = M.lm_head(params, cfg, hidden[:, None, :])[:, 0]
        return (jnp.argmax(logits, -1).astype(jnp.int32), state)

    state = M.init_state(cfg, batch)
    us = time_scan_body(run_stacked, (token, state), (params,))
    print(f"stacked   : {us:8.1f} us/step -> {1e6/us:7.1f} tok/s", flush=True)

    pu = unstack(params, cfg.n_layers)
    state_u = {
        "conv": [state["conv"][i] for i in range(cfg.n_layers)],
        "ssm": [state["ssm"][i] for i in range(cfg.n_layers)],
    }

    def run_unstacked(c, params):
        tok, state = c
        emb = jnp.take(params["tok_emb"], tok[:, None], axis=0)
        hidden, state = token_step_unstacked(params, cfg, emb[:, 0], state)
        logits = M.lm_head(params, cfg, hidden[:, None, :])[:, 0]
        return (jnp.argmax(logits, -1).astype(jnp.int32), state)

    us = time_scan_body(run_unstacked, (token, state_u), (pu,))
    print(f"unstacked : {us:8.1f} us/step -> {1e6/us:7.1f} tok/s", flush=True)

    pb = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, pu)

    def run_bf16(c, params):
        tok, state = c
        emb = jnp.take(params["tok_emb"], tok[:, None], axis=0)
        hidden, new_state = token_step_unstacked(params, cfg, emb[:, 0], state)
        new_state = jax.tree_util.tree_map(
            lambda n, o: n.astype(o.dtype), new_state, state)
        logits = M.lm_head(params, cfg, hidden[:, None, :])[:, 0]
        return (jnp.argmax(logits, -1).astype(jnp.int32), new_state)

    state_b = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), state_u)
    us = time_scan_body(run_bf16, (token, state_b), (pb,))
    print(f"bf16 unstk: {us:8.1f} us/step -> {1e6/us:7.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
