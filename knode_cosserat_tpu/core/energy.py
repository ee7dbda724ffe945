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

__all__ = ["rod_energies", "assembly_energies", "energy_summary"]


def _trapezoid_weights(N: int, dtype) -> jnp.ndarray:
    w = jnp.ones((N,), dtype)
    return w.at[0].set(0.5).at[-1].set(0.5)


def _rod_energy_terms(p: RodParams, x: jnp.ndarray):
    """(elastic, kinetic, potential) (T,) arrays for x (T, N, 25).
    vmap-compatible over a leading rod axis of (p, x)."""
    ppos = x[..., 0:3]
    q = x[..., 13:16]
    w = x[..., 16:19]
    v = x[..., 19:22]
    u = x[..., 22:25]

    wts = _trapezoid_weights(x.shape[1], x.dtype) * p.ds

    dv = v - p.vstar
    elastic = 0.5 * jnp.einsum("n,tni,ij,tnj->t", wts, dv, p.Kse, dv)
    elastic = elastic + 0.5 * jnp.einsum(
        "n,tni,ij,tnj->t", wts, u, p.Kbt, u)
    kinetic = 0.5 * p.rhoA * jnp.einsum("n,tni,tni->t", wts, q, q)
    kinetic = kinetic + 0.5 * jnp.einsum("n,tni,ij,tnj->t", wts, w,
                                         p.rhoJ, w)
    potential = -p.rhoA * jnp.einsum("n,tni,i->t", wts, ppos, p.g)
    return elastic, kinetic, potential


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
    x = traj[..., :25].astype(p.dtype)
    elastic, kinetic, potential = _rod_energy_terms(p, x)
    return {
        "elastic": elastic,
        "kinetic": kinetic,
        "potential": potential,
        "total": elastic + kinetic + potential,
    }


def assembly_energies(asm, traj: jnp.ndarray,
                      plate_pose: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Energy time series of a coupled-assembly rollout
    (core/assembly.simulate_assembly output).

    Rod budgets vmap the single-rod terms over the M stacked rods; the
    plate's velocities are reconstructed with the SAME BDF-2 backward
    differences the coupled solver uses internally (exact for t >= 2;
    t < 2 uses rest / first-order), so the dissipation identity holds to
    solver precision, not finite-difference precision.

    Args:
      traj: (T, M, N, >=25); plate_pose: (T, 7) [p, h].
    Returns:
      dict of (T,) arrays: elastic, kinetic, potential, total (assembly-
      wide sums) plus plate_kinetic / plate_potential for introspection.
    """
    import jax

    from .assembly import _body_angular_velocity

    traj = jnp.asarray(traj)
    plate_pose = jnp.asarray(plate_pose)
    if traj.ndim != 4 or traj.shape[-1] < 25:
        raise ValueError(f"traj must be (T, M, N, >=25), got {traj.shape}")
    if getattr(asm.plate, "has_contact", False):
        # the smoothed penalty k*softplus(-beta*gap)/beta stores energy
        # whose antiderivative is a dilogarithm — not counted here, so the
        # dissipation identity would be silently wrong during contact
        raise ValueError(
            "assembly_energies does not support contact assemblies: the "
            "smoothed plane-contact springs store energy this budget "
            "does not count (non-elementary potential). Evaluate the "
            "contact-free system, or a far plane before contact.")
    rods = asm.rods
    dtype = jnp.asarray(rods.del_t).dtype
    x = jnp.moveaxis(traj[..., :25], 1, 0).astype(dtype)   # (M, T, N, 25)
    el, ki, po = jax.vmap(_rod_energy_terms)(rods, x)      # (M, T) each
    elastic, kinetic, potential = el.sum(0), ki.sum(0), po.sum(0)

    # plate kinematics via the solver's BDF-2 combination
    c0 = jnp.asarray(rods.c0).reshape(-1)[0]
    c1 = jnp.asarray(rods.c1).reshape(-1)[0]
    c2 = jnp.asarray(rods.c2).reshape(-1)[0]
    del_t = jnp.asarray(rods.del_t).reshape(-1)[0]
    pp = plate_pose[:, 0:3].astype(dtype)
    hp = plate_pose[:, 3:7].astype(dtype)

    def bdf2_rate(a):
        r = c0 * a[2:] + c1 * a[1:-1] + c2 * a[:-2]
        r1 = ((a[1] - a[0]) / del_t)[None]
        r0 = jnp.zeros_like(a[:1])
        return jnp.concatenate([r0, r1, r], axis=0)

    vp = bdf2_rate(pp)                                     # (T, 3)
    hdot = bdf2_rate(hp)                                   # (T, 4)
    wb = jax.vmap(_body_angular_velocity)(hp, hdot)        # (T, 3)

    m = jnp.asarray(asm.plate.mass, dtype)
    inertia = jnp.asarray(asm.plate.inertia, dtype)
    g = jnp.asarray(asm.plate.g, dtype)
    plate_kin = (0.5 * m * jnp.einsum("ti,ti->t", vp, vp)
                 + 0.5 * jnp.einsum("ti,ij,tj->t", wb, inertia, wb))
    plate_pot = -m * jnp.einsum("ti,i->t", pp, g)
    kinetic = kinetic + plate_kin
    potential = potential + plate_pot
    return {
        "elastic": elastic,
        "kinetic": kinetic,
        "potential": potential,
        "plate_kinetic": plate_kin,
        "plate_potential": plate_pot,
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
