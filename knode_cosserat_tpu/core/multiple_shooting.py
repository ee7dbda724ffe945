"""Parallel-in-space Newton: multiple shooting over rod segments.

The spatial sweep (core/spatial.integrate_euler — reference
cosserat_ode.py:188-213) is a sequential recurrence over N-1 nodes: its
wall time on TPU is latency x N, not FLOPs, because each step is a tiny
stencil. For fine rods (N >> 100, e.g. convergence studies or long
catheters) that serial chain dominates the whole simulator.

Multiple shooting breaks the chain (SURVEY.md §5's "parallel-in-space
Newton formulation"): split the rod into S segments of m = (N-1)/S
steps, promote the S-1 interior segment-start states to unknowns, and
solve for

    X = [ G (6),  y_seg1 (19), ..., y_seg(S-1) (19) ]

with the residual stacking (a) state continuity at every interior
boundary and (b) the tip force/moment boundary condition. All S segment
sweeps run as ONE vmapped scan of length m — sequential depth drops
S-fold while the extra work rides the TPU's idle vector lanes. The
converged solution satisfies the SAME discrete equations as single
shooting (continuity is closed to solver tolerance), so trajectories
match core/stepper.simulate_scan to Newton precision — pinned by
tests/test_multiple_shooting.py.

The segment axis is embarrassingly parallel (the vmapped sweep has no
cross-segment dependency until the cheap residual stack), so on a device
mesh it shards over the "seq" axis like any batch dimension: pass
``mesh=`` and the per-segment arrays (histories, starts — and through
them the sweeps and per-segment Jacobians, the FLOPs of every Newton
iteration) are pinned to the mesh axis with sharding constraints; the
SPMD partitioner inserts the all-gathers for the tiny cross-segment
algebra (19x19 prefix + 6x6 solve). No hand-rolled halo exchange is
needed because the coupling variables (X) are small and replicated —
the TPU-correct layout for this problem shape.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.linalg import solve_small
from .params import RodParams
from .rhs import rhs
from .shooting import NewtonStats
from .spatial import base_state
from .stepper import SimOutput, initial_state

__all__ = ["ms_solve_step", "simulate_scan_ms"]


def _seg_sharder(mesh, axis: str):
    """-> callable pinning an array's leading (segment) axis onto ``axis``
    of ``mesh`` via with_sharding_constraint — the XLA-native way to spread
    the per-segment sweeps/Jacobians over devices (the partitioner inserts
    the all-gathers for the tiny cross-segment algebra). No-op without a
    mesh."""
    if mesh is None:
        return lambda a: a
    from jax.sharding import NamedSharding, PartitionSpec as P

    def shard(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

    return shard


def _segment_sweeps(p: RodParams, starts, yh_segs, zh_segs, tf, nn_fn,
                    nn_history):
    """All S segment sweeps at once: starts (S, 19), yh_segs (S, m, 19),
    zh_segs (S, m, 6) -> (y_nodes (S, m, 19), z (S, m, 6), ends (S, 19)).
    One scan of length m over a width-S batch (vs one scan of length S*m)."""

    def sweep(y_start, yh_seg, zh_seg):
        def step(yj, inp):
            yhj, zhj = inp
            dy, zj = rhs(p, yj, yhj, zhj, tf, nn_fn, nn_history)
            y_next = yj + p.ds * dy
            return y_next, (y_next, zj)

        y_end, (ys, zs) = lax.scan(step, y_start, (yh_seg, zh_seg))
        return ys, zs, y_end

    return jax.vmap(sweep)(starts, yh_segs, zh_segs)


def _ms_residual(p: RodParams, X, yh_segs, zh_segs, tf, S, nn_fn,
                 nn_history):
    """Stacked residual: [continuity (19*(S-1)), tip force/moment (6)]."""
    G = X[:6]
    Yb = X[6:].reshape(S - 1, 19)
    starts = jnp.concatenate([base_state(p, G)[None], Yb], axis=0)
    _, _, ends = _segment_sweeps(p, starts, yh_segs, zh_segs, tf, nn_fn,
                                 nn_history)
    cont = (ends[:-1] - Yb).reshape(-1)
    tip = jnp.concatenate([p.F_tip - ends[-1, 7:10],
                           p.M_tip - ends[-1, 10:13]])
    return jnp.concatenate([cont, tip])


def _newton_loop(residual_fn, direction_fn, X0, tol, max_iter,
                 max_backtracks=6, lm_lambda0=1e-4, lm_growth=30.0,
                 max_escalations=4):
    """Shared damped-Newton driver: vmapped backtracking line search + LM
    stall escalation, used by BOTH multiple-shooting solvers and the
    assembly solver (one copy of the loop, three direction producers).

    ``direction_fn(X, r, lam) -> dX`` supplies the (LM-damped) Newton
    direction; this loop owns everything else — the backtracking search
    over 0.5^k steps, the lam/fails escalation ladder (stall -> lam *=
    lm_growth, success -> lam = 0), the non-finite fallback to steepest
    descent (-r), and the NewtonStats semantics."""
    dtype = X0.dtype
    alphas = (0.5 ** jnp.arange(max_backtracks + 1)).astype(dtype)
    lam0 = jnp.asarray(lm_lambda0, dtype)

    def cond(state):
        X, r, r2, it, lam, fails, retries = state
        return (r2 > tol) & (it < max_iter) & (fails <= max_escalations)

    def body(state):
        X, r, r2, it, lam, fails, retries = state
        dX = direction_fn(X, r, lam)
        dX = jnp.where(jnp.all(jnp.isfinite(dX)), dX, -r)

        X_cand = X[None, :] + alphas[:, None] * dX[None, :]
        r_cand = jax.vmap(residual_fn)(X_cand)
        r2_cand = jnp.sum(r_cand * r_cand, axis=-1)
        improves = r2_cand < r2
        idx = jnp.argmax(improves)
        found = jnp.any(improves)
        pick = jnp.where(found, idx, 0)
        X_new = jnp.where(found, X_cand[pick], X)
        r_new = jnp.where(found, r_cand[pick], r)
        r2_new = jnp.where(found, r2_cand[pick], r2)
        lam_new = jnp.where(found, 0.0, jnp.maximum(lam * lm_growth, lam0))
        fails = jnp.where(found, 0, fails + 1)
        retries = retries + jnp.where(found, 0, 1).astype(jnp.int32)
        return (X_new, r_new, r2_new, it + 1, lam_new.astype(dtype),
                fails, retries)

    r0 = residual_fn(X0)
    state0 = (X0, r0, jnp.sum(r0 * r0), jnp.array(0, jnp.int32),
              jnp.zeros((), dtype), jnp.array(0, jnp.int32),
              jnp.array(0, jnp.int32))
    X, r, r2, it, lam, fails, retries = lax.while_loop(cond, body, state0)
    return X, NewtonStats(it, jnp.sqrt(r2), r2 <= tol, retries)


def _lm_damped_solve(J, r, lam, eye):
    """LM-damped LU solve of J dX = -r with Marquardt diagonal scaling."""
    D = jnp.maximum(jnp.abs(jnp.diagonal(J)), 1.0)
    return jnp.linalg.solve(J + lam * D * eye, -r)


def _newton_dense(residual_fn, X0, tol, max_iter, **kw):
    """Damped Newton with vmapped line search and LM stall escalation for
    the (6 + 19*(S-1))-dim multiple-shooting system. Same algorithm as
    core/shooting.newton_solve, but the linear solve is jnp.linalg.solve
    (LU) — solve_small's unrolled elimination is built for 6x6, not ~139^2."""
    eye = jnp.eye(X0.shape[-1], dtype=X0.dtype)

    def direction(X, r, lam):
        return _lm_damped_solve(jax.jacfwd(residual_fn)(X), r, lam, eye)

    return _newton_loop(residual_fn, direction, X0, tol, max_iter, **kw)


def _structured_direction(p: RodParams, X, lam, yh_segs, zh_segs, tf, S,
                          nn_fn, nn_history, shard=lambda a: a):
    """Newton direction exploiting the block-BIDIAGONAL Jacobian.

    Row structure of _ms_residual's Jacobian:
      cont_i = e_i(s_i) - Yb_i   ->  [A_i on s_i,  -I on Yb_i]
      tip    = t - C e_S(s_S)    ->  [-C A_S on s_S]
    with s_1 = base_state(G) (constant selector B wrt G) and s_i = Yb_{i-1}.
    Forward elimination turns the solve into an affine-map prefix scan of
    19x19 blocks plus ONE 6x6 reduced solve: dYb_i = M_i dG + v_i with
    (M_i, v_i) = (A_i M_{i-1}, A_i v_{i-1} + r_i). Only the per-segment
    19-tangent jacobians A_i are assembled (vmapped jacfwd) — vs the dense
    path's (6 + 19(S-1)) tangents through every sweep. LM damping scales
    the -I diagonal blocks by (1+lam) and damps the reduced 6x6 system —
    same stall-escape role as the dense LM (step shrinks toward zero as
    lam grows), composed with the identical line search.
    """
    dtype = X.dtype
    G = X[:6]
    Yb = X[6:].reshape(S - 1, 19)
    starts = shard(jnp.concatenate([base_state(p, G)[None], Yb], axis=0))

    def end_one(s, yh_seg, zh_seg):
        def step(yj, inp):
            yhj, zhj = inp
            dy, _ = rhs(p, yj, yhj, zhj, tf, nn_fn, nn_history)
            return yj + p.ds * dy, None

        y_end, _ = lax.scan(step, s, (yh_seg, zh_seg))
        return y_end, y_end

    A, e = jax.vmap(
        lambda s, yh_seg, zh_seg: jax.jacfwd(
            lambda ss: end_one(ss, yh_seg, zh_seg), has_aux=True)(s)
    )(starts, yh_segs, zh_segs)                 # (S, 19, 19), (S, 19)

    r_cont = e[:-1] - Yb                        # (S-1, 19)
    r_tip = jnp.concatenate([p.F_tip - e[-1, 7:10], p.M_tip - e[-1, 10:13]])

    B = jnp.zeros((19, 6), dtype).at[7:13, :].set(jnp.eye(6, dtype=dtype))
    scale = 1.0 / (1.0 + lam)

    if S - 1 >= 32:
        # log-depth prefix of the affine maps x -> scale*(A_i x + r_i):
        # measured faster than the sequential chain from ~32 segments up
        # (N=321, S=160: 1018 vs 895 steps/s on v5e)
        Ap = scale * A[:-1]
        bp = scale * r_cont

        def comb(x, y):
            Ax, bx = x
            Ay, by = y
            return (jnp.einsum("sij,sjk->sik", Ay, Ax),
                    jnp.einsum("sij,sj->si", Ay, bx) + by)

        P, vs = lax.associative_scan(comb, (Ap, bp))
        Ms = jnp.einsum("sij,jk->sik", P, B)
        M_last, v_last = Ms[-1], vs[-1]
    else:
        def chain(carry, inp):
            M, v = carry
            Ai, ri = inp
            out = (scale * (Ai @ M), scale * (Ai @ v + ri))
            return out, out

        init = (B, jnp.zeros(19, dtype))
        (M_last, v_last), (Ms, vs) = lax.scan(chain, init,
                                              (A[:-1], r_cont))

    CA = A[-1, 7:13, :]                         # (6, 19)
    K = CA @ M_last                             # (6, 6)
    rhs6 = r_tip - CA @ v_last
    D = jnp.maximum(jnp.abs(jnp.diagonal(K)), 1.0)
    dG = solve_small(K + lam * D * jnp.eye(6, dtype=dtype), rhs6)
    dYb = jnp.einsum("sij,j->si", Ms, dG) + vs  # (S-1, 19)
    return jnp.concatenate([dG, dYb.reshape(-1)])


def _newton_structured(p, residual_fn, X0, yh_segs, zh_segs, tf, S, nn_fn,
                       nn_history, tol, max_iter, shard=lambda a: a, **kw):
    """The shared _newton_loop with the direction from
    _structured_direction (block-bidiagonal elimination)."""
    def direction(X, r, lam):
        return _structured_direction(p, X, lam, yh_segs, zh_segs, tf, S,
                                     nn_fn, nn_history, shard)

    return _newton_loop(residual_fn, direction, X0, tol, max_iter, **kw)


def ms_solve_step(p: RodParams, yh, zh, tf, X0, n_segments: int,
                  nn_fn=None, nn_history: bool = False,
                  tol: float = 1e-10, max_iter: int = 50,
                  solver: str = "structured", mesh=None,
                  seq_axis: str = "seq"):
    """Solve one BDF-2 step by multiple shooting.

    Args:
      yh/zh: (N, 19)/(N, 6) BDF-2 history; tf: (3,) tendon force.
      X0: (6 + 19*(S-1),) warm start — [G_guess, boundary states].
      solver: "structured" exploits the block-bidiagonal Jacobian (one
        vmapped 19-tangent jacfwd per segment + a 6x6 reduced solve);
        "dense" materializes the full (6+19(S-1))^2 Jacobian. Identical
        converged roots; structured is the fast path for fine rods.
    Returns (y (N, 19), z_body (N-1, 6), X_solved, stats)."""
    S = int(n_segments)
    m = (p.N - 1) // S
    if m * S != p.N - 1:
        raise ValueError(f"n_segments={S} must divide N-1={p.N - 1}")
    shard = _seg_sharder(mesh, seq_axis)
    yh_segs = shard(yh[:-1].reshape(S, m, 19))
    zh_segs = shard(zh[:-1].reshape(S, m, 6))
    res = partial(_ms_residual, p, yh_segs=yh_segs, zh_segs=zh_segs, tf=tf,
                  S=S, nn_fn=nn_fn, nn_history=nn_history)
    if solver == "structured":
        X, stats = _newton_structured(p, res, X0, yh_segs, zh_segs, tf, S,
                                      nn_fn, nn_history, tol=tol,
                                      max_iter=max_iter, shard=shard)
    elif solver == "dense":
        X, stats = _newton_dense(res, X0, tol=tol, max_iter=max_iter)
    else:
        raise ValueError(f"unknown solver {solver!r}")

    # reconstruct the full rod state from the solved unknowns
    G = X[:6]
    Yb = X[6:].reshape(S - 1, 19)
    starts = jnp.concatenate([base_state(p, G)[None], Yb], axis=0)
    ys, zs, _ = _segment_sweeps(p, starts, yh_segs, zh_segs, tf, nn_fn,
                                nn_history)
    y = jnp.concatenate([starts[0][None], ys.reshape(p.N - 1, 19)], axis=0)
    z_body = zs.reshape(p.N - 1, 6)
    return y, z_body, X, stats


def simulate_scan_ms(
    p: RodParams,
    controls: jnp.ndarray,
    n_segments: int,
    nn_fn: Optional[Callable] = None,
    nn_history: bool = False,
    tol: Optional[float] = None,
    max_iter: int = 50,
    solver: str = "structured",
    mesh=None,
    seq_axis: str = "seq",
) -> SimOutput:
    """Rollout with the parallel-in-space solver — the drop-in analogue of
    core/stepper.simulate_scan (same trajectory contract and quirks: [:-1]
    drop, frozen tip z, [y, z, yh, zh] records) for fine rods.

    Warm starts: G extrapolates across time (2G - G_prev) like the
    sequential path; the boundary-state unknowns start at the CURRENT
    node states (the previous converged step), which is the natural
    multiple-shooting warm start — one or two Newton iterations per step
    in steady state."""
    if tol is None:
        tol = 1e-16 if jnp.dtype(p.dtype) == jnp.float64 else 1e-10
    S = int(n_segments)
    m = (p.N - 1) // S
    if m * S != p.N - 1:
        raise ValueError(f"n_segments={S} must divide N-1={p.N - 1}")
    bidx = (jnp.arange(1, S) * m)          # interior boundary node indices

    y0, z0 = initial_state(p)
    dtype = y0.dtype
    G0 = jnp.zeros(6, dtype)
    z_tip = z0[-1]

    def step(carry, tensions):
        y, z, y_prev, z_prev, G, G_prev = carry
        yh = p.c1 * y + p.c2 * y_prev
        zh = p.c1 * z + p.c2 * z_prev
        tf = jnp.einsum("t,tc->c", jnp.asarray(tensions, dtype),
                        jnp.asarray(p.tendon_dirs, dtype),
                        precision=jax.lax.Precision.HIGHEST)
        X0 = jnp.concatenate([2.0 * G - G_prev, y[bidx].reshape(-1)])
        y_new, z_body, X, stats = ms_solve_step(
            p, yh, zh, tf, X0, S, nn_fn, nn_history, tol, max_iter,
            solver=solver, mesh=mesh, seq_axis=seq_axis)
        G_new = X[:6]
        z_new = jnp.concatenate([z_body, z_tip[None]], axis=0)
        record = jnp.concatenate([y_new, z_new, yh, zh], axis=-1)
        new_carry = (y_new, z_new, y, z, G_new, G)
        return new_carry, (record, G_new, stats.iterations,
                           stats.residual_norm, stats.lm_retries)

    T = controls.shape[0]
    carry0 = (y0, z0, y0, z0, G0, G0)
    _, (records, Gs, iters, res, lm) = lax.scan(step, carry0,
                                                controls[: T - 1])

    rec0 = jnp.concatenate([y0, z0, y0, z0], axis=-1)[None]
    traj = jnp.concatenate([rec0, records], axis=0)
    Gs = jnp.concatenate([G0[None], Gs], axis=0)
    iters = jnp.concatenate([jnp.zeros(1, iters.dtype), iters])
    res = jnp.concatenate([jnp.zeros(1, res.dtype), res])
    lm = jnp.concatenate([jnp.zeros(1, lm.dtype), lm])
    return SimOutput(traj, Gs, iters, res, lm)
