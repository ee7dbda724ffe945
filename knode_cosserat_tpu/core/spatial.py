"""Spatial (arc-length) integration of the rod, base -> tip.

``lax.scan`` over nodes replaces the reference's Python loops
(getResidualEuler cosserat_ode.py:188-213, getResidualRK4 :215-255).
The sequential spatial recurrence is only N-1 steps (N ~ 10-40); everything
around it (time batch, shooting Jacobian columns, experiment grid) is
vectorized, so the scan body itself is evaluated on large batches.

Also provides the fully-parallel teacher-forced "next segment" evaluation
(getNextSegmentEuler cosserat_ode_torch.py:370-399 /
parallelGetNextSegmentEuler :401-437): spatial states are NOT chained there,
so it is a pure broadcast over nodes — the natural TPU formulation.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple
import jax.numpy as jnp
from jax import lax

from .params import RodParams
from .rhs import rhs

__all__ = [
    "base_state",
    "integrate_euler",
    "integrate_rk4",
    "tip_residual",
    "residual_euler",
    "residual_rk4",
    "next_segment_euler",
]


def base_state(p: RodParams, G: jnp.ndarray) -> jnp.ndarray:
    """Base boundary node y[0] = [p0, h0, n0(G), m0(G), q0, w0]
    (cosserat_ode.py:194)."""
    return jnp.concatenate([p.p0, p.h0, G[0:3], G[3:6], p.q0, p.w0])


def integrate_euler(
    p: RodParams,
    G: jnp.ndarray,
    yh: jnp.ndarray,
    zh: jnp.ndarray,
    tendon_forces: jnp.ndarray,
    nn_fn: Optional[Callable] = None,
    nn_history: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Explicit-Euler spatial sweep (cosserat_ode.py:197-201).

    Args:
      G: (6,) guessed base reaction [n0, m0].
      yh: (N, 19) BDF-2 history per node; zh: (N, 6).
    Returns:
      y: (N, 19) integrated rod state; z: (N-1, 6) strains at nodes 0..N-2
      (the reference never writes z at the tip node — knode_cosserat quirk,
      see stepper.simulate).
    """
    y0 = base_state(p, G)

    def step(yj, inp):
        yhj, zhj = inp
        dy, zj = rhs(p, yj, yhj, zhj, tendon_forces, nn_fn, nn_history)
        y_next = yj + p.ds * dy
        return y_next, (y_next, zj)

    _, (y_rest, z) = lax.scan(step, y0, (yh[:-1], zh[:-1]))
    y = jnp.concatenate([y0[None], y_rest], axis=0)
    return y, z


def integrate_rk4(
    p: RodParams,
    G: jnp.ndarray,
    yh: jnp.ndarray,
    zh: jnp.ndarray,
    yh_int: jnp.ndarray,
    zh_int: jnp.ndarray,
    tendon_forces: jnp.ndarray,
    nn_fn: Optional[Callable] = None,
    nn_history: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """4th-order Runge-Kutta spatial sweep (cosserat_ode.py:222-242) with
    linearly-interpolated history midpoints yh_int/zh_int (knode.py:80-81).

    yh_int/zh_int: (N-1, ...) midpoints between consecutive nodes.
    """
    y0 = base_state(p, G)

    def step(yj, inp):
        yhj, yhj1, yhm, zhj, zhj1, zhm = inp
        k1, zj = rhs(p, yj, yhj, zhj, tendon_forces, nn_fn, nn_history)
        k2, _ = rhs(p, yj + k1 * (p.ds / 2), yhm, zhm, tendon_forces, nn_fn, nn_history)
        k3, _ = rhs(p, yj + k2 * (p.ds / 2), yhm, zhm, tendon_forces, nn_fn, nn_history)
        k4, _ = rhs(p, yj + k3 * p.ds, yhj1, zhj1, tendon_forces, nn_fn, nn_history)
        y_next = yj + p.ds * (k1 + 2 * (k2 + k3) + k4) / 6
        return y_next, (y_next, zj)

    inputs = (yh[:-1], yh[1:], yh_int, zh[:-1], zh[1:], zh_int)
    _, (y_rest, z) = lax.scan(step, y0, inputs)
    y = jnp.concatenate([y0[None], y_rest], axis=0)
    return y, z


def tip_residual(p: RodParams, y: jnp.ndarray) -> jnp.ndarray:
    """Cantilever tip boundary mismatch [F_tip - nL, M_tip - mL]
    (cosserat_ode.py:204-211)."""
    nL = y[-1, 7:10]
    mL = y[-1, 10:13]
    return jnp.concatenate([p.F_tip - nL, p.M_tip - mL])


def residual_euler(p, G, yh, zh, tendon_forces, nn_fn=None, nn_history=False):
    """fsolve-style vector residual of the Euler sweep (cosserat_ode.py:188-213)."""
    y, _ = integrate_euler(p, G, yh, zh, tendon_forces, nn_fn, nn_history)
    return tip_residual(p, y)


def residual_rk4(p, G, yh, zh, yh_int, zh_int, tendon_forces,
                 nn_fn=None, nn_history=False):
    """Vector residual of the RK4 sweep (cosserat_ode.py:215-255)."""
    y, _ = integrate_rk4(p, G, yh, zh, yh_int, zh_int, tendon_forces,
                         nn_fn, nn_history)
    return tip_residual(p, y)


def next_segment_euler(
    p: RodParams,
    y_next_truth: jnp.ndarray,
    yh: jnp.ndarray,
    zh: jnp.ndarray,
    tendon_forces: jnp.ndarray,
    nn_fn: Optional[Callable] = None,
    nn_history: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher-forced one-Euler-step per node — the training hot path.

    Matches getNextSegmentEuler (cosserat_ode_torch.py:370-399): the rod
    state is the ground-truth NEXT step (the implicit BDF-2 evaluation
    point), history terms come from the current step, and spatial states are
    deliberately NOT chained (comment at cosserat_ode_torch.py:391), so the
    whole thing is a single broadcast RHS evaluation over every node (and any
    leading batch axes) — what the reference needed bmm gymnastics for
    (parallelGetNextSegmentEuler, cosserat_ode_torch.py:401-437).

    Args:
      y_next_truth: (..., M, 19) truth next-state at the evaluated nodes.
      yh/zh: (..., M, 19)/(..., M, 6) current-step history at those nodes.
      tendon_forces: (..., 3) broadcastable to the node axis.
    Returns:
      y_grown: (..., M, 19) = y + ds * ODE(y); z_new: (..., M, 6).
    """
    tf = jnp.asarray(tendon_forces)
    if tf.ndim > 1 and tf.shape[:-1] == y_next_truth.shape[:-2]:
        # per-(batch) forces shared across the node axis -> insert it
        tf = tf[..., None, :]
    # else: (3,) constant or already aligned with y's batch shape
    dy, z_new = rhs(p, y_next_truth, yh, zh, tf, nn_fn, nn_history)
    return y_next_truth + p.ds * dy, z_new
