"""Device-mesh construction and sharding helpers.

The reference is single-process, single-device science code whose only
scale-out is "2 training subprocesses at a time" (physics_multitrain.py:
152-157). Here, scale-out is a jax.sharding.Mesh over ICI:

  axes: ("data", "seq", "model")
    data  — batch axis: trajectories / grid experiments (DP). Gradients are
            reduced with psum over ICI by XLA.
    seq   — sequence-parallel axis: the rollout TIME dimension of the
            teacher-forced loss shards too (the y_prev shift becomes a
            halo exchange XLA inserts as a collective-permute). This is the
            rebuild's "context parallelism": useful when trajectories are
            few but long (the realworld track: 2-4 trajectories x 1200
            steps, prepare.py/train_segment.py).
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


def make_mesh(data: int = -1, model: int = 1, seq: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("data", "seq", "model") mesh. data=-1 uses all remaining
    devices. seq=1/model=1 axes still exist (size 1) so sharding specs are
    uniform across mesh shapes."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % (model * seq):
            raise ValueError(f"{n} devices not divisible by "
                             f"model*seq={model * seq}")
        data = n // (model * seq)
    if data * model * seq > n:
        raise ValueError(f"mesh {data}x{seq}x{model} needs "
                         f"{data * model * seq} devices, have {n}")
    dev = np.asarray(devices[: data * seq * model]).reshape(data, seq, model)
    return Mesh(dev, axis_names=("data", "seq", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1,
                  seq_axis: Optional[int] = None) -> NamedSharding:
    """Shard the leading axis over "data" (and optionally axis ``seq_axis``
    over "seq"), replicate the rest."""
    spec = ["data"] + [None] * (ndim - 1)
    if seq_axis is not None and "seq" in mesh.axis_names:
        spec[seq_axis] = "seq"
    return NamedSharding(mesh, P(*spec))


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
