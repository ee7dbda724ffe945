"""Shooting-method boundary solve for the base reaction G = [n0, m0].

Replaces ``scipy.optimize.fsolve`` / ``minimize(L-BFGS-B)`` in the reference
rollout (knode.py:85-94) with a jittable damped-Newton solver:

  - the 6x6 Jacobian comes from ``jax.jacfwd`` of the spatial sweep
    (6 forward-mode columns, batched by XLA),
  - a backtracking line search guards cold starts,
  - ``lax.while_loop`` keeps iteration data-dependent but fully on device,
  - the whole solve vmaps over batches of rods/timesteps, and
  - ``implicit_root`` wraps it in ``lax.custom_root`` so training can
    differentiate through the *solved* step via the implicit function
    theorem instead of unrolling Newton iterations.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.linalg import solve_small, solve_spd_small

__all__ = ["newton_solve", "implicit_root", "NewtonStats"]


class NewtonStats(NamedTuple):
    """Solver statistics. All four fields are always arrays so stacked /
    scanned NewtonStats have a uniform pytree structure (no int-vs-array
    leaf mismatch when mixing constructed and default instances)."""
    iterations: jnp.ndarray
    residual_norm: jnp.ndarray
    converged: jnp.ndarray
    lm_retries: jnp.ndarray


def newton_solve(
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    G0: jnp.ndarray,
    tol: float = 1e-12,
    max_iter: int = 50,
    max_backtracks: int = 6,
    damping: float = 0.0,
    lm_lambda0: float = 1e-4,
    lm_growth: float = 10.0,
    lm_decay: float = 0.0,
    max_escalations: int = 8,
):
    """Solve residual_fn(G) = 0 by damped Newton with a vectorized
    backtracking line search and Levenberg-Marquardt stall escalation.

    TPU-first detail: all step-size candidates (alpha = 1, 1/2, ... ,
    1/2^max_backtracks) are evaluated in ONE vmapped residual sweep — the
    spatial integration vectorizes over candidates exactly like it does over
    batch, so the line search costs about one residual evaluation instead of
    max_backtracks sequential ones.

    Stall recovery (the jittable replacement for the reference's
    scipy L-BFGS-B fallback, knode.py:91-94): when no candidate step
    improves the residual, the iterate is NOT advanced; instead the next
    iteration solves with (J + lambda*D), D = diag(max(|J_ii|, 1)) —
    classic LM with Marquardt scaling — and lambda escalates by
    ``lm_growth`` per consecutive failure. A successful step resets
    lambda to ``lm_decay * lambda`` (default 0 = straight back to pure
    Newton). Only after ``max_escalations`` consecutive failures is the
    solve declared stalled.

    Args:
      residual_fn: (6,) -> (6,), e.g. a closure over spatial.residual_euler.
      G0: warm-start guess (the previous timestep's solution, knode.py:88).
      tol: stop when sum(r^2) < tol (fsolve's default xtol is 1.49e-8 on the
        step; we converge the residual itself much tighter so trajectories
        agree with the reference to solver precision).
      damping: optional constant Tikhonov term lambda*I always added to J;
        0 = pure Newton (the LM escalation above is adaptive and separate).

    Returns:
      (G, NewtonStats) — stats.lm_retries counts escalation iterations.
    """
    dtype = G0.dtype
    eye = jnp.eye(G0.shape[-1], dtype=dtype)
    alphas = (0.5 ** jnp.arange(max_backtracks + 1)).astype(dtype)
    lam0 = jnp.asarray(lm_lambda0, dtype)

    def sq(r):
        return jnp.sum(r * r)

    def cond(state):
        G, r, r2, it, lam, fails, retries = state
        return (r2 > tol) & (it < max_iter) & (fails <= max_escalations)

    def body(state):
        # the residual vector r at G is carried from the previous line
        # search — each iteration costs exactly two sequential sweeps
        # (Jacobian + candidate batch), nothing else
        G, r, r2, it, lam, fails, retries = state
        J = jax.jacfwd(residual_fn)(G)
        if damping:
            J = J + damping * eye
        # adaptive LM term (zero until a stall escalates it)
        D = jnp.maximum(jnp.abs(jnp.diagonal(J)), 1.0)
        J = J + lam * D * eye
        # 6x6 solve (explicit pivoted elimination — TPU has no f64 LU);
        # fall back to a damped least-squares step if singular.
        dG = solve_small(J, -r)
        dG = jnp.where(jnp.all(jnp.isfinite(dG)), dG,
                       solve_spd_small(J, -r, damping=1e-8))

        # One batched sweep over every candidate step size; pick the largest
        # alpha that reduces the squared residual.
        G_cand = G[None, :] + alphas[:, None] * dG[None, :]
        r_cand = jax.vmap(residual_fn)(G_cand)
        r2_cand = jnp.sum(r_cand * r_cand, axis=-1)
        improves = r2_cand < r2
        idx = jnp.argmax(improves)          # first (largest-alpha) improver
        found = jnp.any(improves)
        pick = jnp.where(found, idx, 0)
        # on failure: hold position, escalate lambda, try again
        G_new = jnp.where(found, G_cand[pick], G)
        r_new = jnp.where(found, r_cand[pick], r)
        r2_new = jnp.where(found, r2_cand[pick], r2)
        lam_new = jnp.where(found, lm_decay * lam,
                            jnp.maximum(lam * lm_growth, lam0))
        fails = jnp.where(found, 0, fails + 1)
        retries = retries + jnp.where(found, 0, 1).astype(jnp.int32)
        return (G_new, r_new, r2_new, it + 1, lam_new.astype(dtype),
                fails, retries)

    r0 = residual_fn(G0)
    state0 = (G0, r0, sq(r0), jnp.array(0, jnp.int32),
              jnp.zeros((), dtype), jnp.array(0, jnp.int32),
              jnp.array(0, jnp.int32))
    G, r, r2, it, lam, fails, retries = lax.while_loop(cond, body, state0)
    return G, NewtonStats(it, jnp.sqrt(r2), r2 <= tol, retries)


def implicit_root(
    residual_fn: Callable,
    G0: jnp.ndarray,
    tol: float = 1e-12,
    max_iter: int = 50,
):
    """Differentiable shooting solve: gradients flow through the implicit
    function theorem (lax.custom_root), not the Newton iterations.

    ``residual_fn`` may close over differentiable parameters (rod params, NN
    weights); d(root)/d(params) = -J^{-1} dr/d(params) is handled by JAX.
    """
    def solve(f, x0):
        G, _ = newton_solve(f, x0, tol=tol, max_iter=max_iter)
        return G

    def tangent_solve(g, y):
        # g is linear; evaluate its Jacobian at a y-independent point so the
        # elimination in solve_small stays transposable (linear in y).
        J = jax.jacobian(g)(jnp.zeros_like(y))
        return solve_small(J, y)

    return lax.custom_root(residual_fn, G0, solve, tangent_solve)
