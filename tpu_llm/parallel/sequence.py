"""Sequence parallelism (SP) for prefill — Megatron-SP expressed as GSPMD
sharding constraints (SURVEY.md §2.3 SP row).

Between the tensor-parallel matmul regions, the residual stream carries no
"model"-sharded dimension — in plain TP the norms and elementwise ops run
replicated on every device. SP instead pins the residual stream to
P(data, model, None): activations are sharded along SEQUENCE over the TP
axis, so RMSNorm/residual adds do 1/n of the work per device, and XLA's
solver places the all-gather (entering a column-parallel matmul) and
reduce-scatter (leaving a row-parallel one) exactly where Megatron-LM puts
them by hand. No collective appears in model code — the constraint is the
whole mechanism.

Only meaningful for T > 1 (prefill); decode activations have no sequence
extent to shard, so the constraint is skipped for T == 1.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sp_constraint(mesh: Mesh, data_axis: str = "data", seq_axis: str = "model"):
    """Residual-stream constraint callable for llama.forward(act_constraint=...):
    shard (B, T, E) activations along T over the TP axis during prefill."""
    sharding = NamedSharding(mesh, P(data_axis, seq_axis, None))

    def constrain(x):
        if x.ndim == 3 and x.shape[1] > 1:
            return jax.lax.with_sharding_constraint(x, sharding)
        return x

    return constrain


def prefill_sequence_parallel(
    params,
    cfg,
    tokens: jax.Array,   # (B, T)
    cache,               # llama KV cache, sharded or not
    mesh: Mesh,
    data_axis: str = "data",
    seq_axis: str = "model",
) -> Tuple[jax.Array, dict]:
    """Jitted llama prefill with the SP residual-stream constraint applied.
    ``params`` should already be TP-sharded (llama_param_specs) for the
    constraint to buy anything; numerics are identical either way."""
    from tpu_llm.models import llama as M

    constrain = sp_constraint(mesh, data_axis, seq_axis)

    @jax.jit
    def fn(params, tokens, cache):
        return M.forward(
            params, cfg, tokens, cache, jnp.int32(0), act_constraint=constrain
        )

    return fn(params, tokens, cache)
