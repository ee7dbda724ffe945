"""BDF-2 time stepping: the closed-loop rollout ``simulate``.

TPU-native rewrite of the reference rollout driver (knode.py:55-102, with
byte-identical copies at prepare.py:124-171 and an unrolled variant in
realworld/simulate.py:63-92): a single ``lax.scan`` over control steps, each
step performing the warm-started Newton shooting solve on device. Batches of
rollouts (different control profiles / seeds / rods) are obtained with
``jax.vmap(simulate_scan, ...)`` — no Python loop, no scipy, no host sync.

Faithfully replicated reference quirks (pinned by parity tests):
  * trajectory[0] is the initial straight rod recorded as [y, z, y, z];
    the final control step's result is dropped (knode.py:68,102 — the
    ``[:-1]``), so len(traj) == len(controls).
  * z at the tip node is NEVER written by the spatial sweep
    (cosserat_ode.py:198-201 writes z[:, j] only for j < N-1), so it stays
    at its initial value [0,0,1,0,0,0] for the whole rollout.
  * history midpoints for RK4 are linear interpolations (knode.py:80-81).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .params import RodParams
from .shooting import NewtonStats, newton_solve
from .spatial import integrate_euler, integrate_rk4, tip_residual

__all__ = ["initial_state", "simulate", "simulate_scan", "SimOutput"]


@partial(jax.jit,
         static_argnames=("nn_fn", "nn_history", "method", "max_iter"))
def _simulate_jit(p, controls, nn_fn, nn_history, method, tol, max_iter):
    return simulate_scan(p, controls, nn_fn=nn_fn, nn_history=nn_history,
                         method=method, tol=tol, max_iter=max_iter)


class SimOutput(NamedTuple):
    """Rollout output.

    traj: (T, N, 50) with last axis = [y(19), z(6), yh(19), zh(6)] —
      the reference's trajectory contract (knode.py:96) in state-last layout.
    G: (T, 6) solved base reactions (traj[t] corresponds to G[t] for t>=1).
    newton_iters / residuals: per-step solver stats (T,).
    lm_retries: per-step count of Levenberg-Marquardt stall-escalation
      iterations (0 everywhere on a healthy rollout).
    """
    traj: jnp.ndarray
    G: jnp.ndarray
    newton_iters: jnp.ndarray
    residuals: jnp.ndarray
    lm_retries: jnp.ndarray = None


def initial_state(p: RodParams):
    """Straight-rod initial condition (knode.py:58-64): z positions linearly
    spaced, identity quaternion, v = e_z, everything else zero."""
    N = p.N
    dtype = p.dtype
    zpos = jnp.linspace(jnp.zeros((), dtype), p.L, N)
    y = jnp.zeros((N, 19), dtype)
    y = y.at[:, 2].set(zpos)
    y = y.at[:, 3].set(1.0)
    z = jnp.zeros((N, 6), dtype)
    z = z.at[:, 2].set(1.0)
    return y, z


def simulate_scan(
    p: RodParams,
    controls: jnp.ndarray,
    nn_fn: Optional[Callable] = None,
    nn_history: bool = False,
    method: str = "euler",
    tol: Optional[float] = None,
    max_iter: int = 50,
    differentiable: bool = False,
    remat: bool = False,
    extrapolate: bool = True,
    initial: Optional[tuple] = None,
) -> SimOutput:
    """Jit-compatible rollout over a (T, 4) tension schedule.

    initial: optional (y0 (N, 19), z0 (N, 6)) starting state instead of
    the at-rest straight rod — e.g. the first frame of an observed
    window (sysid's rollout objective) or a handed-over carry. The BDF-2
    history seeds from the state itself (y_prev = y0), exact for an
    at-rest start and first-step-approximate otherwise (same quirk as
    the reference's rollout start, knode.py:58-77).

    Per step (knode.py:70-100): BDF-2 history yh = c1*y + c2*y_prev, Newton
    shooting solve for G warm-started from the previous step, then one final
    spatial sweep at the solved G to produce the recorded state.

    Output traj has T entries: index 0 = initial condition, index t>=1 =
    state after controls[t-1]; controls[T-1] is consumed by the reference but
    its result dropped, so we simply do not integrate it.

    differentiable=True solves the shooting problem through lax.custom_root,
    so gradients of the ROLLOUT w.r.t. rod parameters / NN weights flow via
    the implicit function theorem (the reference can only differentiate the
    teacher-forced one-step path). remat=True checkpoints each time step
    (jax.checkpoint) so long differentiable rollouts trade recompute for
    activation memory — the rebuild's "long context" lever (SURVEY.md
    section 5).
    """
    if tol is None:
        # sum(r^2) < 1e-16 is unreachable in f32 — it would silently turn
        # every Newton solve into max_iter iterations; pick by dtype
        tol = 1e-16 if jnp.dtype(p.dtype) == jnp.float64 else 1e-10
    if initial is None:
        y0, z0 = initial_state(p)
    else:
        y0 = jnp.asarray(initial[0], p.dtype)
        z0 = jnp.asarray(initial[1], p.dtype)
    dtype = y0.dtype
    G0 = jnp.zeros(6, dtype)
    z_tip = z0[-1]  # frozen forever (see module docstring)

    def step(carry, tensions):
        y, z, y_prev, z_prev, G, G_prev = carry
        yh = p.c1 * y + p.c2 * y_prev
        zh = p.c1 * z + p.c2 * z_prev
        # Newton warm start: the solved base reaction from the previous
        # step (reference fsolve warm start, knode.py:85-89), optionally
        # linearly extrapolated across time (G varies smoothly under
        # smooth controls, so 2G - G_prev starts closer to the new root)
        G_guess = 2.0 * G - G_prev if extrapolate else G
        tf = jnp.einsum("t,tc->c", jnp.asarray(tensions, dtype),
                        jnp.asarray(p.tendon_dirs, dtype),
                        precision=jax.lax.Precision.HIGHEST)

        if method == "euler":
            def res(Gx):
                yi, _ = integrate_euler(p, Gx, yh, zh, tf, nn_fn, nn_history)
                return tip_residual(p, yi)
            integrate = lambda Gx: integrate_euler(p, Gx, yh, zh, tf, nn_fn,
                                                   nn_history)
        elif method == "rk4":
            yh_int = 0.5 * (yh[:-1] + yh[1:])
            zh_int = 0.5 * (zh[:-1] + zh[1:])
            def res(Gx):
                yi, _ = integrate_rk4(p, Gx, yh, zh, yh_int, zh_int, tf,
                                      nn_fn, nn_history)
                return tip_residual(p, yi)
            integrate = lambda Gx: integrate_rk4(p, Gx, yh, zh, yh_int,
                                                 zh_int, tf, nn_fn,
                                                 nn_history)
        else:
            raise ValueError(f"unknown method {method!r}")

        if differentiable:
            from .shooting import implicit_root
            G_new = implicit_root(res, G_guess, tol=tol, max_iter=max_iter)
            r = res(jax.lax.stop_gradient(G_new))
            r2 = jnp.sum(r * r)
            # custom_root hides the iteration count; converged is derived
            # from the actual residual so a stalled solve reports honestly
            # (iterations stays 0 = unavailable under the implicit path)
            stats = NewtonStats(jnp.array(0, jnp.int32), jnp.sqrt(r2),
                                r2 <= tol, jnp.array(0, jnp.int32))
        else:
            G_new, stats = newton_solve(res, G_guess, tol=tol,
                                        max_iter=max_iter)
        y_new, z_body = integrate(G_new)

        z_new = jnp.concatenate([z_body, z_tip[None]], axis=0)
        record = jnp.concatenate([y_new, z_new, yh, zh], axis=-1)  # (N, 50)
        new_carry = (y_new, z_new, y, z, G_new, G)
        return new_carry, (record, G_new, stats.iterations,
                           stats.residual_norm, stats.lm_retries)

    T = controls.shape[0]
    carry0 = (y0, z0, y0, z0, G0, G0)
    body = jax.checkpoint(step) if remat else step
    # Integrate T-1 steps; the reference's T-th step is computed then dropped.
    _, (records, Gs, iters, res, lm) = lax.scan(body, carry0,
                                                controls[: T - 1])

    rec0 = jnp.concatenate([y0, z0, y0, z0], axis=-1)[None]
    traj = jnp.concatenate([rec0, records], axis=0)
    Gs = jnp.concatenate([G0[None], Gs], axis=0)
    iters = jnp.concatenate([jnp.zeros(1, iters.dtype), iters])
    res = jnp.concatenate([jnp.zeros(1, res.dtype), res])
    lm = jnp.concatenate([jnp.zeros(1, lm.dtype), lm])
    return SimOutput(traj, Gs, iters, res, lm)


def simulate(
    p: RodParams,
    controls,
    nn_fn: Optional[Callable] = None,
    nn_history: bool = False,
    method: str = "euler",
    tol: Optional[float] = None,
    max_iter: int = 50,
    reference_layout: bool = False,
):
    """Convenience wrapper: jit-compiles the scan rollout and returns the
    trajectory array, matching the reference ``simulate(robot, ctl)``
    contract (knode.py:55-102).

    reference_layout=True returns (T, 50, N) like the reference; the default
    is the TPU-native (T, N, 50).
    """
    controls = jnp.asarray(controls)
    out = _simulate_jit(p, controls, nn_fn, nn_history, method, tol, max_iter)
    traj = out.traj
    if reference_layout:
        traj = jnp.swapaxes(traj, 1, 2)
    return traj
