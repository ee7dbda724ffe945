"""Mechanical energy budgets of a rod trajectory — a validation subsystem
the reference does not have (SURVEY.md section 4: its only physics checks
are residual-at-a-known-root ``__main__`` blocks).

For the tendon-driven Cosserat rod (state conventions cosserat_ode.py:
114-130; 25-state rows [p, h, n, m, q, w | v, u]):

  elastic   E_e = 1/2 integral (v - v*)^T Kse (v - v*) + u^T Kbt u  ds
  kinetic   E_k = 1/2 integral rho A |q|^2 + w^T (rho J) w          ds
            (q, w are LOCAL-frame velocities; the rotation drops out of
            the quadratic forms)
  potential E_p = - integral rho A g . p                            ds

Integrals use trapezoidal weights over the N nodes. With tendons slack
(zero tension) the only non-conservative terms are the material damping
(Bse/Bbt) and square-law air drag (C), both strictly dissipative — so
total mechanical energy must decrease monotonically on an unforced
rollout. tests/test_energy.py pins exactly that on the full BDF-2 +
shooting stack: an end-to-end physical-correctness check no
golden-trajectory test provides.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .params import RodParams

__all__ = ["rod_energies", "energy_summary"]


def _trapezoid_weights(N: int, dtype) -> jnp.ndarray:
    w = jnp.ones((N,), dtype)
    return w.at[0].set(0.5).at[-1].set(0.5)


def rod_energies(p: RodParams, traj: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Energy time series of a trajectory.

    Args:
      traj: (T, N, >=25) state-last rollout rows (SimOutput.traj works
        directly; extra history channels are ignored).
    Returns:
      dict of (T,) arrays: elastic, kinetic, potential, total
      (total = elastic + kinetic + potential).
    """
    traj = jnp.asarray(traj)
    if traj.ndim != 3 or traj.shape[-1] < 25:
        raise ValueError(f"traj must be (T, N, >=25), got {traj.shape}")
    dtype = p.dtype
    x = traj[..., :25].astype(dtype)
    ppos = x[..., 0:3]
    q = x[..., 13:16]
    w = x[..., 16:19]
    v = x[..., 19:22]
    u = x[..., 22:25]

    wts = _trapezoid_weights(x.shape[1], dtype) * p.ds

    dv = v - p.vstar
    elastic = 0.5 * jnp.einsum("n,tni,ij,tnj->t", wts, dv, p.Kse, dv)
    elastic = elastic + 0.5 * jnp.einsum(
        "n,tni,ij,tnj->t", wts, u, p.Kbt, u)
    kinetic = 0.5 * p.rhoA * jnp.einsum("n,tni,tni->t", wts, q, q)
    kinetic = kinetic + 0.5 * jnp.einsum("n,tni,ij,tnj->t", wts, w,
                                         p.rhoJ, w)
    potential = -p.rhoA * jnp.einsum("n,tni,i->t", wts, ppos, p.g)
    return {
        "elastic": elastic,
        "kinetic": kinetic,
        "potential": potential,
        "total": elastic + kinetic + potential,
    }


def energy_summary(p: RodParams, traj: jnp.ndarray) -> str:
    """One-line human summary (CLI `simulate --energy`)."""
    e = rod_energies(p, traj)
    tot = e["total"]
    return (f"energy [J]: elastic {float(e['elastic'][-1]):.3e}, "
            f"kinetic {float(e['kinetic'][-1]):.3e}, "
            f"potential {float(e['potential'][-1]):.3e}; "
            f"total {float(tot[0]):.3e} -> {float(tot[-1]):.3e}")
