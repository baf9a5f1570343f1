"""LoRA adapter loading (llama.cpp GGUF adapter format).

Adapters exported by ``convert_lora_to_gguf.py`` are GGUF files with
``general.type = "adapter"``, ``adapter.type = "lora"``,
``adapter.lora.alpha``, and per-base-tensor pairs
``<name>.lora_a`` / ``<name>.lora_b``. The merged delta for a base
weight is ``(B @ A) * alpha / r`` with A: (r, in), B: (out, r) in numpy
(reversed-ggml) shapes — the mul_mat chain ``B @ (A @ x)`` collapsed.

Merging happens at LOAD TIME against the UNFUSED stacked params (the
reference's model surface has no adapters; this is ecosystem parity with
``llama.cpp --lora``). Dense weights take the delta exactly; packed
QTensors are dequantized, merged, and requantized to the same kind — the
standard merge-into-quantized tradeoff, reported loudly.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax.numpy as jnp

# GGUF base-tensor name -> stacked params location ("layers", key) or a
# top-level key; mirrors models/llama._LAYER_TENSORS + specials.
_LAYER_KEYS = {
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_output.weight": "wo",
    "ffn_gate.weight": "w1",
    "ffn_up.weight": "w3",
    "ffn_down.weight": "w2",
}
_TOP_KEYS = {
    "output.weight": "wcls",
    "token_embd.weight": "tok_emb",
}


def read_lora(path: str) -> Tuple[Dict[str, np.ndarray], float]:
    """Parse an adapter GGUF -> ({base_tensor_name: delta (out, in)},
    alpha-scaled)."""
    from tpu_llm.io.gguf import GGUFFile

    g = GGUFFile(path)
    gtype = g.metadata.get("general.type")
    atype = g.metadata.get("adapter.type")
    if gtype not in (None, "adapter") or atype not in (None, "lora"):
        raise ValueError(
            f"{path}: not a LoRA adapter GGUF "
            f"(general.type={gtype!r}, adapter.type={atype!r})")
    alpha = float(g.metadata.get("adapter.lora.alpha", 0.0))
    pairs: Dict[str, Dict[str, np.ndarray]] = {}
    for name in g.tensors:
        for suffix in (".lora_a", ".lora_b"):
            if name.endswith(suffix):
                base = name[: -len(suffix)]
                pairs.setdefault(base, {})[suffix[1:]] = g.dequantized(
                    name, np.float32)
    deltas: Dict[str, np.ndarray] = {}
    for base, ab in pairs.items():
        if "lora_a" not in ab or "lora_b" not in ab:
            raise ValueError(f"{path}: incomplete LoRA pair for {base!r}")
        a, b = ab["lora_a"], ab["lora_b"]     # (r, in), (out, r)
        r = a.shape[0]
        if b.shape[-1] != r:
            raise ValueError(
                f"{path}: rank mismatch for {base!r}: A {a.shape} B {b.shape}")
        scale = (alpha / r) if alpha > 0 else 1.0
        deltas[base] = (b @ a) * scale        # (out, in)
    if not deltas:
        raise ValueError(f"{path}: no .lora_a/.lora_b tensor pairs")
    return deltas, alpha


def apply_lora(params: Dict, path: str, verbose: bool = False) -> Dict:
    """Merge a LoRA adapter into UNFUSED stacked llama params in place of
    the originals (returns a new params dict; unmatched adapter tensors
    raise — silently dropping trained deltas would be a correctness
    trap)."""
    from tpu_llm.quant.qtensor import QTensor, dequantize, quantize_tensor

    deltas, alpha = read_lora(path)
    layers = params["layers"]
    if isinstance(layers, (list, tuple)):
        raise ValueError("apply_lora needs stacked params (apply before "
                         "unstack_layers)")
    if "wqkv" in layers:
        raise ValueError("apply_lora needs unfused params (load with "
                         "fuse=False, fuse after merging)")
    new_layers = dict(layers)
    out = dict(params)

    def merge(w, delta_t):
        # delta arrives (out, in); our weights are x@W-oriented (in, out)
        if isinstance(w, QTensor):
            dense = np.asarray(dequantize(w, jnp.float32))
            merged = dense + delta_t
            return quantize_tensor(merged.astype(np.float32), w.kind)
        return (jnp.asarray(w, jnp.float32)
                + jnp.asarray(delta_t)).astype(w.dtype)

    applied = 0
    for base, delta in deltas.items():
        delta_t = np.ascontiguousarray(delta.T)          # (in, out)
        if base in _TOP_KEYS:
            key = _TOP_KEYS[base]
            if out.get(key) is None:
                raise ValueError(f"adapter targets {base!r} but the model "
                                 f"has no such tensor")
            out[key] = merge(out[key], delta_t)
            applied += 1
            continue
        if not base.startswith("blk."):
            raise ValueError(f"unsupported LoRA target {base!r}")
        _, idx, rest = base.split(".", 2)
        key = _LAYER_KEYS.get(rest)
        if key is None or key not in new_layers:
            raise ValueError(f"unsupported LoRA target {base!r}")
        i = int(idx)
        stacked = new_layers[key]
        if isinstance(stacked, QTensor):
            from tpu_llm.quant.qtensor import qmap

            merged_i = merge(qmap(lambda p: p[i], stacked), delta_t)
            new_layers[key] = qmap(
                lambda p, m: p.at[i].set(m), stacked, merged_i)
        else:
            merged_i = merge(stacked[i], delta_t)
            new_layers[key] = stacked.at[i].set(merged_i)
        applied += 1
    out["layers"] = new_layers
    if verbose:
        import sys

        print(f"lora: merged {applied} tensors (alpha={alpha})",
              file=sys.stderr)
    return out
