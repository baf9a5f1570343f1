"""Quantize loaded parameter pytrees to packed QTensors (weight-only).

Used by benchmarks and by converters when the source checkpoint is f32/f16
but serving should run Q4_0/Q8_0 (the reference's four_bit_dev capability:
quantize offline, decode from packed blocks).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from tpu_llm.quant.qtensor import QTensor, quantize_tensor

LLAMA_PROJ_KEYS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")


def _quantize_stacked(w, kind: str) -> QTensor:
    """(L, K, N) dense -> stacked QTensor."""
    w = np.asarray(w, np.float32)
    qts = [quantize_tensor(w[l], kind) for l in range(w.shape[0])]
    return QTensor(
        q=jnp.stack([q.q for q in qts]),
        scales=jnp.stack([q.scales for q in qts]),
        kind=kind,
    )


def quantize_llama_params(
    params: Dict,
    kind: str = "q4_0",
    layer_keys: Sequence[str] = LLAMA_PROJ_KEYS,
    quantize_cls: bool = True,
) -> Dict:
    """Replace projection weights with packed QTensors. Norms and the
    embedding stay dense (tiny, and gathers want dense rows)."""
    out = dict(params)
    out["layers"] = dict(params["layers"])
    for key in layer_keys:
        if key in out["layers"] and not isinstance(out["layers"][key], QTensor):
            out["layers"][key] = _quantize_stacked(out["layers"][key], kind)
    if quantize_cls and params.get("wcls") is not None:
        if not isinstance(params["wcls"], QTensor):
            out["wcls"] = quantize_tensor(np.asarray(params["wcls"], np.float32), kind)
    return out
