"""Mamba packed checkpoint format (the reference's ssm/ path).

Layout (pinned by reader ``ssm/mamba.f90:172-325``, writer
``ssm/savemodel.py:44-102``):

  header: 7 x i32 — d_model, 0, n_layer, 0, 0, vocab_size, 0
  then f32 tensors, each group storing all layers consecutively
  (torch row-major bytes == the Fortran column-major reads):
    token_embedding (vocab, d_model)
    D          L x (d_inner,)
    in_proj    L x (2*d_inner, d_model)
    conv1d     L x (d_inner, d_conv)         # torch (d_inner, 1, d_conv)
    conv1d_b   L x (d_inner,)
    x_proj     L x (dt_rank + 2*d_state, d_inner)
    dt_proj    L x (d_inner, dt_rank)
    dt_proj_b  L x (d_inner,)
    A_log      L x (d_inner, d_state)
    out_proj   L x (d_model, d_inner)
    norm       L x (d_model,)
    norm_f     (d_model,)
    lm_head    (vocab, d_model)

Derived dims: d_inner = 2*d_model, dt_rank = ceil(d_model/16); constants
d_conv=4, d_state=16 (ssm/mamba.f90:106-109,177-179).
"""

from __future__ import annotations

import struct
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from tpu_llm.config import MambaConfig


def read_packed(path: str) -> Tuple[Dict, MambaConfig]:
    with open(path, "rb") as f:
        d_model, _, n_layers, _, _, vocab, _ = struct.unpack("<7i", f.read(28))
        cfg = MambaConfig(d_model=d_model, n_layers=n_layers, vocab_size=vocab)
        di, ds, dr, dc = cfg.d_inner, cfg.d_state, cfg.dt_rank_, cfg.d_conv

        def rd(*shape):
            n = int(np.prod(shape))
            a = np.fromfile(f, dtype=np.float32, count=n)
            if a.size != n:
                raise EOFError(f"{path}: truncated reading {shape}")
            return a.reshape(shape)

        def rd_layers(*shape):
            return np.stack([rd(*shape) for _ in range(n_layers)])

        tok_emb = rd(vocab, d_model)
        D = rd_layers(di)
        in_proj = rd_layers(2 * di, d_model)
        conv_w = rd_layers(di, dc)
        conv_b = rd_layers(di)
        x_proj = rd_layers(dr + 2 * ds, di)
        dt_proj = rd_layers(di, dr)
        dt_bias = rd_layers(di)
        A_log = rd_layers(di, ds)
        out_proj = rd_layers(d_model, di)
        norm = rd_layers(d_model)
        norm_f = rd(d_model)
        wcls = rd(vocab, d_model)
        extra = f.read(4)
        if extra:
            raise ValueError(f"{path}: did not reach EOF, check weights")

    t = lambda a: jnp.asarray(np.ascontiguousarray(a.transpose(0, 2, 1)))
    params = {
        "tok_emb": jnp.asarray(tok_emb),
        "norm_f": jnp.asarray(norm_f),
        "wcls": jnp.asarray(wcls.T.copy()),
        "layers": {
            "d": jnp.asarray(D),
            "in_proj": t(in_proj),                       # (L, d_model, 2*d_inner)
            "conv_w": t(conv_w),                         # (L, d_conv, d_inner)
            "conv_b": jnp.asarray(conv_b),
            "x_proj": t(x_proj),                         # (L, d_inner, dr+2ds)
            "dt_proj": t(dt_proj),                       # (L, dt_rank, d_inner)
            "dt_bias": jnp.asarray(dt_bias),
            "A_log": t(A_log),                           # (L, d_state, d_inner)
            "out_proj": t(out_proj),                     # (L, d_inner, d_model)
            "norm": jnp.asarray(norm),
        },
    }
    return params, cfg


def write_packed(path: str, arrays: Dict[str, np.ndarray], cfg: MambaConfig):
    """Write the packed format from numpy arrays in TORCH orientation
    (the shapes listed in the module docstring)."""
    with open(path, "wb") as f:
        f.write(struct.pack(
            "<7i", cfg.d_model, 0, cfg.n_layers, 0, 0, cfg.vocab_size, 0
        ))

        def wr(a):
            f.write(np.ascontiguousarray(a, dtype=np.float32).tobytes())

        wr(arrays["tok_emb"])
        for key in ("D", "in_proj", "conv_w", "conv_b", "x_proj",
                    "dt_proj", "dt_bias", "A_log", "out_proj", "norm"):
            for l in range(cfg.n_layers):
                wr(arrays[key][l])
        wr(arrays["norm_f"])
        wr(arrays["wcls"])


def convert_hf_mamba(model_dir: str, out_path: str, verbose: bool = False) -> MambaConfig:
    """HF Mamba (pytorch_model.bin + config.json) -> packed format — the
    reference's ssm/savemodel.py converter, reimplemented."""
    import json
    import os

    import torch

    with open(os.path.join(model_dir, "config.json")) as fh:
        hf = json.load(fh)
    sd = torch.load(
        os.path.join(model_dir, "pytorch_model.bin"),
        map_location="cpu", weights_only=True,
    )
    sd = {k: v.float().numpy() for k, v in sd.items()}

    emb = sd["backbone.embedding.weight"]
    n_layers = hf["n_layer"] if "n_layer" in hf else hf["num_hidden_layers"]
    cfg = MambaConfig(
        d_model=hf["d_model"] if "d_model" in hf else hf["hidden_size"],
        n_layers=n_layers,
        vocab_size=emb.shape[0],  # real vocab from the embedding (savemodel.py:43)
    )
    pre = "backbone.layers"
    g = lambda l, name: sd[f"{pre}.{l}.{name}"]
    arrays = {
        "tok_emb": emb,
        "norm_f": sd["backbone.norm_f.weight"],
        "wcls": sd.get("lm_head.weight", emb),  # tied when absent
        "D": np.stack([g(l, "mixer.D") for l in range(n_layers)]),
        "in_proj": np.stack([g(l, "mixer.in_proj.weight") for l in range(n_layers)]),
        "conv_w": np.stack(
            [g(l, "mixer.conv1d.weight").reshape(cfg.d_inner, cfg.d_conv)
             for l in range(n_layers)]
        ),
        "conv_b": np.stack([g(l, "mixer.conv1d.bias") for l in range(n_layers)]),
        "x_proj": np.stack([g(l, "mixer.x_proj.weight") for l in range(n_layers)]),
        "dt_proj": np.stack([g(l, "mixer.dt_proj.weight") for l in range(n_layers)]),
        "dt_bias": np.stack([g(l, "mixer.dt_proj.bias") for l in range(n_layers)]),
        "A_log": np.stack([g(l, "mixer.A_log") for l in range(n_layers)]),
        "out_proj": np.stack([g(l, "mixer.out_proj.weight") for l in range(n_layers)]),
        "norm": np.stack([g(l, "norm.weight") for l in range(n_layers)]),
    }
    write_packed(out_path, arrays, cfg)
    if verbose:
        print(f"wrote {out_path}: {cfg}")
    return cfg
