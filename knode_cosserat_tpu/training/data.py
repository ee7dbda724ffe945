"""Training-data generation (sim track).

Parity port of forward_datas / compute_validation_reference
(physics_train.py:81-134): trajectories come from rolling out the UNMODIFIED
reference rod through the solver on the requested control schedules; the
KNODE net attached to a *modified* rod is then trained to close the gap.
Gaussian noise is optionally added to both trajectories and controls
(physics_train.py:126-127) — here from a JAX PRNG key instead of torch's
global generator.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..controls import calc_controls
from ..core.params import RodParams
from ..core.stepper import simulate

__all__ = ["make_training_data", "make_validation_reference", "TrajSpec",
           "parse_traj_specs"]

TrajSpec = Tuple[str, float]  # e.g. ("sine", 0.5)


def parse_traj_specs(tokens: Sequence[str]) -> List[TrajSpec]:
    """Parse the reference CLI trajectory syntax: first half types, second
    half args ("sine sine 0.5 1.0" -> [("sine", .5), ("sine", 1.)]) —
    physics_train.py:52-58."""
    tokens = list(tokens)
    half = len(tokens) // 2
    types, args = tokens[:half], tokens[half:]
    if len(types) != len(args):
        raise ValueError("Different number of control types and args")
    return [(t, float(a)) for t, a in zip(types, args)]


def make_training_data(
    reference_rod: RodParams,
    specs: Sequence[TrajSpec],
    train_len: int = 30,
    noise_traj: float = 0.0,
    noise_controls: float = 0.0,
    key: Optional[jax.Array] = None,
):
    """Returns (trajs, controls): (n_traj, T, N, 25) and (n_traj, T, 4).

    Trajectories are reference-rod rollouts (traj[:, :, :25] of the solver
    record — training never sees the recorded history channels,
    physics_train.py:116)."""
    trajs, ctls = [], []
    for kind, arg in specs:
        c = calc_controls(kind, arg, float(reference_rod.del_t), train_len)
        t = np.asarray(simulate(reference_rod, c))[:, :, :25]
        trajs.append(t)
        ctls.append(c)
    trajs = jnp.asarray(np.stack(trajs))
    ctls = jnp.asarray(np.stack(ctls))
    if key is not None and (noise_traj or noise_controls):
        k1, k2 = jax.random.split(key)
        trajs = trajs + noise_traj * jax.random.normal(k1, trajs.shape,
                                                       trajs.dtype)
        ctls = ctls + noise_controls * jax.random.normal(k2, ctls.shape,
                                                         ctls.dtype)
    return trajs, ctls


def make_validation_reference(
    reference_rod: RodParams,
    validation: TrajSpec = ("sine", 1.25),
    eval_len: int = 100,
):
    """Validation rollout of the reference rod (physics_train.py:89-94).
    Returns (controls (T,4), traj (T,N,25))."""
    kind, arg = validation
    c = calc_controls(kind, arg, float(reference_rod.del_t), eval_len)
    t = np.asarray(simulate(reference_rod, c))[:, :, :25]
    return c, t
