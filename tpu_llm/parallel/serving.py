"""Mesh sharding for the serving engines (SURVEY.md §7 step 5).

The batch engines are host loops around jitted device steps, so putting a
serving workload on a mesh needs no engine-code changes: place the params
and the KV state under NamedShardings once and GSPMD partitions every
jitted step (decode, prefill, verify) — the same mechanism the
single-stream ``--tp`` path and the paged-TP dryrun leg use. This module
is that placement step, plus the one real policy decision: under a mesh
the projections and attention must stay on XLA-partitionable ops (the
Pallas kernels are single-device programs), so ``shard_engine`` turns the
Pallas paths off for the process.

The reference has no serving stack at all (single-stream CLI,
llama2.f90:319-428); multi-chip serving is a capability the TPU design
adds on top.
"""

from __future__ import annotations

import os
from typing import Any

from jax.sharding import Mesh

from tpu_llm.config import LlamaConfig
from tpu_llm.parallel.sharding import (
    llama_cache_spec,
    llama_paged_state_spec,
    llama_param_specs,
    shard_pytree,
    unstack_param_specs,
)


def shard_engine(eng: Any, cfg: LlamaConfig, mesh: Mesh) -> Any:
    """Place a BatchEngine/PagedEngine's params and KV state on ``mesh``.

    Call right after construction, before the first step (the jitted
    bodies compile against the placed shardings on first call). Batch
    rows ride the "data" axis (dense cache) and attention heads / ffn
    columns the "model" axis; the paged pools shard their Hkv*D axis.
    """
    tp = mesh.shape.get("model", 1)
    if tp > 1 and cfg.n_kv_heads % tp:
        raise ValueError(
            f"tp={tp} must divide n_kv_heads={cfg.n_kv_heads} (the KV "
            f"cache shards whole kv heads; use Ulysses/CP for wider "
            f"degrees)")
    dp = mesh.shape.get("data", 1)
    if dp > 1 and eng.batch % dp:
        raise ValueError(f"dp={dp} must divide engine batch={eng.batch}")

    # Pallas kernels don't partition under GSPMD; route projections and
    # attention to the XLA paths for this process.
    os.environ["TPU_LLM_DISABLE_PALLAS"] = "1"

    params = eng.params
    specs = llama_param_specs(cfg, params=params)
    unstacked = isinstance(params.get("layers"), (list, tuple))
    if unstacked:
        specs = unstack_param_specs(specs, len(params["layers"]))
    eng.params = shard_pytree(params, specs, mesh)

    state = eng.state
    if isinstance(state, dict) and "table" in state:
        # PagedEngine pools
        spec = llama_paged_state_spec(
            len(params["layers"]), quantized=bool(getattr(eng, "quantized", False))
        )
    elif isinstance(state, dict) and "k" in state:
        from tpu_llm.ops.kv_cache import QuantKV

        quant = isinstance(state["k"], QuantKV)
        if isinstance(state["k"], (list, tuple)):
            raise NotImplementedError(
                "mesh serving needs a stacked KV cache "
                "(ModelAdapter.llama(stacked=True))")
        spec = llama_cache_spec(quant=quant)
    else:
        raise NotImplementedError(
            "mesh serving supports llama-family KV states only")
    eng.state = shard_pytree(state, spec, mesh)
    if getattr(eng, "_draft", None) is not None:
        raise NotImplementedError(
            "two-model speculation under a serving mesh is not wired "
            "(the draft state would need its own placement)")
    eng.mesh = mesh
    return eng
