"""Reference-solver emulation: the rollout driven by scipy's MINPACK
``fsolve`` (Powell hybrid trust region) on the host.

The product rollouts (core/stepper.simulate_scan, the mega kernel) use the
on-device damped-Newton/LM solver — faster and jittable, converging to the
same roots to solver tolerance. Studies that need the REFERENCE'S exact
solver behavior (knode.py:85-94 calls scipy.optimize.fsolve with default
xtol=1.49e-8 and a warm start at the previous step's G, then falls back to
L-BFGS-B when fsolve reports non-convergence) can use this mode: it runs
the very same MINPACK algorithm over this package's f64 residual, so any
solver-path divergence (step acceptance, trust-region behavior, fallback
triggering) reproduces bit-for-bit up to residual round-off.

Deliberately host-bound and slow (one fsolve per time step, like the
reference) — a validation oracle, not a production path.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .params import RodParams
from .spatial import integrate_euler, integrate_rk4, tip_residual
from .stepper import initial_state

__all__ = ["simulate_fsolve"]


def simulate_fsolve(
    p: RodParams,
    controls,
    nn_fn: Optional[Callable] = None,
    nn_history: bool = False,
    method: str = "euler",
    reference_layout: bool = False,
    lbfgsb_fallback: bool = True,
):
    """Rollout with scipy.optimize.fsolve as the shooting solver — the
    reference's exact solver stack (knode.py:55-102), including the
    [:-1]-drop / frozen-tip-z / [y, z, yh, zh] record quirks and the
    L-BFGS-B rescue on fsolve non-convergence (knode.py:91-94).

    Requires float64 rod params (MINPACK is double precision).
    Returns the (T, N, 50) trajectory (or (T, 50, N) with
    reference_layout=True).
    """
    from scipy.optimize import fsolve, minimize

    if jnp.dtype(p.dtype) != jnp.float64:
        raise ValueError("simulate_fsolve requires a float64 rod "
                         "(MINPACK hybrd is double precision)")
    controls = np.asarray(controls, np.float64)
    T = controls.shape[0]
    y0, z0 = initial_state(p)
    y = np.asarray(y0)
    z = np.asarray(z0)
    y_prev, z_prev = y.copy(), z.copy()
    z_tip = z[-1].copy()
    G = np.zeros(6)
    dirs = np.asarray(p.tendon_dirs, np.float64)

    if method == "euler":
        @jax.jit
        def _residual(G, yh, zh, tf):
            return tip_residual(
                p, integrate_euler(p, G, yh, zh, tf, nn_fn, nn_history)[0])

        @jax.jit
        def _integrate(G, yh, zh, tf):
            return integrate_euler(p, G, yh, zh, tf, nn_fn, nn_history)
    elif method == "rk4":
        @jax.jit
        def _residual(G, yh, zh, tf):
            yh_int = 0.5 * (yh[:-1] + yh[1:])
            zh_int = 0.5 * (zh[:-1] + zh[1:])
            return tip_residual(
                p, integrate_rk4(p, G, yh, zh, yh_int, zh_int, tf, nn_fn,
                                 nn_history)[0])

        @jax.jit
        def _integrate(G, yh, zh, tf):
            yh_int = 0.5 * (yh[:-1] + yh[1:])
            zh_int = 0.5 * (zh[:-1] + zh[1:])
            return integrate_rk4(p, G, yh, zh, yh_int, zh_int, tf, nn_fn,
                                 nn_history)
    else:
        raise ValueError(f"unknown method {method!r}")

    records = [np.concatenate([y, z, y, z], axis=-1)]
    for t in range(T - 1):
        yh = np.asarray(p.c1) * y + np.asarray(p.c2) * y_prev
        zh = np.asarray(p.c1) * z + np.asarray(p.c2) * z_prev
        tf = controls[t] @ dirs

        def res(Gx):
            return np.asarray(_residual(jnp.asarray(Gx), yh, zh, tf))

        G_new, _, ier, _ = fsolve(res, G, full_output=True)
        if ier != 1 and lbfgsb_fallback:
            # knode.py:91-94: minimize ||r||^2 with L-BFGS-B from the
            # fsolve result when MINPACK gives up
            out = minimize(lambda Gx: float(np.sum(res(Gx) ** 2)), G_new,
                           method="L-BFGS-B")
            G_new = out.x
        y_new, z_body = _integrate(jnp.asarray(G_new), yh, zh, tf)
        y_new = np.asarray(y_new)
        z_new = np.concatenate([np.asarray(z_body), z_tip[None]], axis=0)
        records.append(np.concatenate([y_new, z_new, yh, zh], axis=-1))
        y_prev, z_prev = y, z
        y, z, G = y_new, z_new, G_new

    traj = np.stack(records, axis=0)
    if reference_layout:
        traj = np.swapaxes(traj, 1, 2)
    return traj
