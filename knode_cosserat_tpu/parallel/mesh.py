"""Device-mesh construction and sharding helpers.

The reference is single-process, single-device science code whose only
scale-out is "2 training subprocesses at a time" (physics_multitrain.py:
152-157). Here, scale-out is a jax.sharding.Mesh over ICI:

  axes: ("data", "model")
    data  — batch axis: trajectories / grid experiments (DP). Gradients are
            reduced with psum over ICI by XLA.
    model — tensor-parallel axis for the KNODE MLP hidden dimension (TP).
            Size 1 for the reference-sized net; the axis exists so larger
            hybrid models shard without code changes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_params_tp", "P"]


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("data", "model") mesh. data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, "
                         f"have {n}")
    dev = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading axis over "data", replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_tp(mesh: Mesh, params):
    """Tensor-parallel placement for the 2-layer KNODE MLP: the hidden
    dimension shards over "model" (layer-0 output rows, layer-1 input cols);
    everything else replicates. XLA inserts the layer-1 psum."""
    n = len(params)
    shardings = []
    for i, layer in enumerate(params):
        if i == 0:
            s = {"w": NamedSharding(mesh, P("model", None)),
                 "b": NamedSharding(mesh, P("model"))}
        elif i == n - 1:
            s = {"w": NamedSharding(mesh, P(None, "model")),
                 "b": NamedSharding(mesh, P())}
        else:
            s = {"w": NamedSharding(mesh, P()), "b": NamedSharding(mesh, P())}
        shardings.append(s)
    return tuple(shardings)
