"""Device-mesh construction.

The reference is strictly single-core (``README.md:21``); scaling here is
pure JAX SPMD: a named ``Mesh`` with a ``data`` axis (independent decode
streams / batch) and a ``model`` axis (tensor parallelism over ICI), per
SURVEY.md §2.3. Multi-host initialization goes through
``jax.distributed.initialize`` before building the mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    model: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh. ``model`` defaults to all remaining
    devices. model-axis devices are placed innermost (adjacent device ids)
    so TP collectives ride the fastest ICI links."""
    devs = list(devices if devices is not None else jax.devices())
    if model is None:
        model = len(devs) // data
    if data * model > len(devs):
        raise ValueError(f"mesh {data}x{model} exceeds {len(devs)} devices")
    grid = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)
