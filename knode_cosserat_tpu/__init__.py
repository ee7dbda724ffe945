"""knode_cosserat_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
dynamic Cosserat-rod simulation and KNODE (Knowledge-based Neural ODE)
hybrid-model training on tendon-driven continuum soft robots.

Ground-up rebuild of the capabilities of hsiehScalAR/KNODE-Cosserat
(reference mounted at /root/reference; arXiv 2408.07776), re-architected
TPU-first:

  - one differentiable physics core (core/) replaces the reference's three
    copies of the rod ODE (numpy / torch scalar / torch batched);
  - rollouts are lax.scan + on-device Newton shooting, vmappable into large
    batches, instead of per-step scipy.optimize.fsolve;
  - training is a single jitted optax step over all timesteps/keypoints at
    once (the reference's `--fast` path becomes the only path);
  - experiment grids (data x mod x seed) shard over a jax device Mesh
    (parallel/) instead of subprocess fan-out;
  - the fused hybrid RHS is available as a Pallas TPU kernel (ops/).
"""

__version__ = "0.1.0"

from . import controls
from .core.params import (RodParams, make_rod, derive, experimental_rod,
                          original_rod, apply_mod, MODS)
from .core.rhs import rhs
from .core.stepper import simulate, simulate_scan, initial_state, SimOutput
from .core.fast_rollout import make_fast_rollout, make_fast_step
from .controls import calc_controls
from .control import MPCController, make_planner
