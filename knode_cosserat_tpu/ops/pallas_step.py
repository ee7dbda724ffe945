"""Pallas TPU mega-kernel: one ENTIRE BDF-2 shooting step per launch.

The fused rollout (core/fast_rollout.py + ops/pallas_sweep.py) still pays
per-Newton-phase overhead: every iteration launches a Jacobian-probe sweep
kernel and a line-search sweep kernel with XLA glue (6x6 solve, candidate
selection) between them — ~6 launches plus dozens of tiny (R, 6) ops per
time step. This kernel moves the whole damped-Newton shooting solve
(knode.py:85-94's fsolve call, re-derived as in core/fast_rollout.py)
inside ONE pallas_call:

  r0 = sweep(G)
  while any(active) and it < max_iter:          # in-kernel while_loop
      J  = FD Jacobian + lam*diag (LM)           # 6 in-kernel sweeps
      dG = solve(J, -r)                          # lane-wise pivoted GE
      backtracking line search over alphas       # n_alphas in-kernel sweeps
      improving lanes advance (lam=0); stalling lanes HOLD and escalate
      lam (Levenberg-Marquardt, newton_solve's recovery semantics)
  final sweep records the full rod

Layout matches pallas_sweep.py: state-major — components on sublanes,
the rod batch on LANES — so every 3-vector op is a full-width VPU op and
the MLP is an MXU matmul per node. Node history slabs are padded to
_YR/_ZR rows so in-kernel ``pl.ds`` slices stay 8-row aligned, and the
spatial loop is a ``fori_loop`` (compiled once, any N).

The 6x6 solve per lane: rows are (1, TB) vectors; partial pivoting is
bubble-max — for column k, lane-wise swap row k with any row below it
that has a larger |A[:, k]| (whole-row jnp.where swaps keep every lane's
permutation consistent). Elimination/back-substitution are plain VPU ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import RodParams
from ..models.mlp import MLPSpec
from .pallas_sweep import _YR, _ZR, make_rhs_rows

__all__ = ["make_step_kernel"]

# Levenberg-Marquardt stall-escalation constants. Same RECOVERY semantics
# as core.shooting.newton_solve but a steeper, shorter ladder (4 x30 steps
# spanning lam 1e-4..2.7 instead of 8 x10): lanes that stall AT the f32
# residual floor exhaust the budget in 4 iterations instead of 8 — the
# vmapped while_loop is governed by the slowest lane, and floor-stalls pay
# the full probe+line-search cost per escalation (measured ~25% of mega
# rollout throughput at the 8-step ladder).
_LM_LAMBDA0 = 1e-4
_LM_GROWTH = 30.0
_MAX_ESCALATIONS = 4


def make_step_kernel(p: RodParams, spec: MLPSpec | None = None,
                     block_b: int = 256, tol: float = 1e-10,
                     max_iter: int = 30, n_alphas: int = 7,
                     interpret: bool = False, method: str = "euler"):
    """Build fn(G (B,6), yh (B,N,19), zh (B,N,6), tf (B,3), nn_params|None)
    -> (G_new (B,6), y (B,N,19), z (B,N-1,6), r2 (B,), iters (B,)).

    Semantics match core/fast_rollout._build_step with fd_order=1 and
    jacobian_refresh=1: damped Newton with backtracking alphas 0.5**k,
    first-improving-alpha selection, and per-lane Levenberg-Marquardt
    stall escalation (hold position, damp the solve, retry — the same
    recovery as core.shooting.newton_solve).

    method: "euler" (reference spatial order) or "rk4"
    (cosserat_ode.py:222-242 with linear history midpoints, knode.py:80-81).
    """
    if method not in ("euler", "rk4"):
        raise ValueError(method)
    N = p.N
    f = lambda v: float(np.asarray(v))
    dtype = p.dtype
    eps0 = 1e-8 if dtype == jnp.float64 else 3e-4   # fd_order=1 step
    p0 = tuple(float(x) for x in np.asarray(p.p0))
    h0 = tuple(float(x) for x in np.asarray(p.h0))
    q0 = tuple(float(x) for x in np.asarray(p.q0))
    w0 = tuple(float(x) for x in np.asarray(p.w0))
    F_tip = tuple(float(x) for x in np.asarray(p.F_tip))
    M_tip = tuple(float(x) for x in np.asarray(p.M_tip))
    ds = f(p.ds)
    use_nn = spec is not None
    n_layers = len(spec.dims) - 1 if use_nn else 0
    rhs_rows = make_rhs_rows(p, spec)   # the ONE shared physics body



    def base_rows(G6, TB):
        const_row = lambda c: jnp.full((1, TB), c, dtype)
        return ([const_row(p0[i]) for i in range(3)]
                + [const_row(h0[i]) for i in range(4)]
                + G6
                + [const_row(q0[i]) for i in range(3)]
                + [const_row(w0[i]) for i in range(3)])

    def solve6(J, b):
        """Lane-wise solve of the 6x6 systems: J is a list of 6 rows, each
        a list of 6 (1, TB) lane-vectors (J[i][k] = dr_i/dG_k); b is a list
        of 6 (1, TB) vectors. Gaussian elimination with lane-wise bubble-max
        partial pivoting. Returns x (list of 6 rows). Non-finite or
        zero-pivot lanes produce garbage here; the caller masks dG by
        isfinite (matching core/fast_rollout._build_step)."""
        A = [[J[i][k] for k in range(6)] for i in range(6)]
        b = list(b)
        for k in range(6):
            # bubble-max pivot: after this, row k holds the max |A[:, k]|
            for j in range(k + 1, 6):
                better = jnp.abs(A[j][k]) > jnp.abs(A[k][k])
                for c in range(6):
                    ak, aj = A[k][c], A[j][c]
                    A[k][c] = jnp.where(better, aj, ak)
                    A[j][c] = jnp.where(better, ak, aj)
                bk, bj = b[k], b[j]
                b[k] = jnp.where(better, bj, bk)
                b[j] = jnp.where(better, bk, bj)
            inv_p = 1.0 / A[k][k]
            for j in range(k + 1, 6):
                factor = A[j][k] * inv_p
                for c in range(k, 6):
                    A[j][c] = A[j][c] - factor * A[k][c]
                b[j] = b[j] - factor * b[k]
        x = [None] * 6
        for k in range(5, -1, -1):
            rhs = b[k]
            for c in range(k + 1, 6):
                rhs = rhs - A[k][c] * x[c]
            x[k] = rhs / A[k][k]
        return x

    def make_kernel(B_live: int):
        """Kernel specialized on the LIVE batch size: lanes >= B_live are
        zero padding and start pre-stalled, so they never cold-start a
        Newton solve nor gate the while_loop for the real lanes."""
        return lambda *refs: kernel_body(B_live, *refs)

    def kernel_body(B_live, *refs):
        G_ref, yh_ref, zh_ref, tf_ref, *rest = refs
        if use_nn:
            w_refs = tuple(rest[:2 * n_layers])
            rest = rest[2 * n_layers:]
        else:
            w_refs = None
        Gout_ref, y_ref, z_ref, r2_ref, it_ref = rest

        TB = G_ref.shape[1]
        tf = [tf_ref[i:i + 1, :] for i in range(3)]
        lane = (jax.lax.broadcasted_iota(jnp.int32, (1, TB), 1)
                + pl.program_id(0) * TB)
        pad_lane = lane >= B_live

        def node_update(j, y):
            """One spatial step at node j from the (19, TB) state: returns
            (y_next (19, TB), z rows at node j)."""
            # slice the padded slabs down to the live rows: the shared
            # rhs_rows (and its 53-input history concat) expects exactly
            # (19, TB) / (6, TB)
            yh_j = yh_ref[pl.ds(j * _YR, _YR), :][0:19, :]
            zh_j = zh_ref[pl.ds(j * _ZR, _ZR), :][0:6, :]
            rows = [y[i:i + 1, :] for i in range(19)]
            if method == "euler":
                dy, z = rhs_rows(rows, yh_j, zh_j, tf, w_refs)
                y_new = [rows[i] + ds * dy[i] for i in range(19)]
            else:
                yh_j1 = yh_ref[pl.ds((j + 1) * _YR, _YR), :][0:19, :]
                zh_j1 = zh_ref[pl.ds((j + 1) * _ZR, _ZR), :][0:6, :]
                yh_m = 0.5 * (yh_j + yh_j1)   # linear history midpoints
                zh_m = 0.5 * (zh_j + zh_j1)   # (knode.py:80-81)
                k1, z = rhs_rows(rows, yh_j, zh_j, tf, w_refs)
                y2 = [rows[i] + (ds / 2) * k1[i] for i in range(19)]
                k2, _ = rhs_rows(y2, yh_m, zh_m, tf, w_refs)
                y3 = [rows[i] + (ds / 2) * k2[i] for i in range(19)]
                k3, _ = rhs_rows(y3, yh_m, zh_m, tf, w_refs)
                y4 = [rows[i] + ds * k3[i] for i in range(19)]
                k4, _ = rhs_rows(y4, yh_j1, zh_j1, tf, w_refs)
                y_new = [rows[i] + (ds / 6.0) * (k1[i] + 2 * (k2[i] + k3[i])
                                                 + k4[i]) for i in range(19)]
            return jnp.concatenate(y_new, axis=0), z

        def sweep_res(G6):
            """Base->tip sweep from base reaction rows G6 (list of 6
            (1, TB)); returns the 6 tip-residual rows as one (6, TB)."""
            y0 = jnp.concatenate(base_rows(G6, TB), axis=0)  # (19, TB)

            def body(j, y):
                y_new, _ = node_update(j, y)
                return y_new

            yN = jax.lax.fori_loop(0, N - 1, body, y0)
            res = [F_tip[i] - yN[7 + i:8 + i, :] for i in range(3)] + \
                  [M_tip[i] - yN[10 + i:11 + i, :] for i in range(3)]
            return jnp.concatenate(res, axis=0)             # (6, TB)

        G = G_ref[0:6, :]                                    # (6, TB)
        r = sweep_res([G[i:i + 1, :] for i in range(6)])
        r2 = jnp.sum(r * r, axis=0, keepdims=True)           # (1, TB)
        # fail counter carried as f32 (1 per consecutive stalled
        # iteration): Mosaic cannot legalize i1 vectors through scf.while
        # yields. Padding lanes start beyond the escalation budget.
        fails_f = jnp.where(pad_lane, float(_MAX_ESCALATIONS + 1),
                            0.0).astype(dtype)
        lam = jnp.zeros((1, TB), dtype)
        it = jnp.zeros((), jnp.int32)

        def cond(state):
            G, r, r2, fails_f, lam, it = state
            active = (r2 > tol) & (fails_f <= _MAX_ESCALATIONS)
            return jnp.any(active) & (it < max_iter)

        def newton_body(state):
            G, r, r2, fails_f, lam, it = state
            active = (r2 > tol) & (fails_f <= _MAX_ESCALATIONS)

            # --- forward-difference Jacobian: 6 probe sweeps ----------
            # J[i][k] = (r(G + h_k e_k)_i - r_i) / h_k
            J = [[None] * 6 for _ in range(6)]
            for k in range(6):
                h_k = eps0 * (1.0 + jnp.abs(G[k:k + 1, :]))   # (1, TB)
                Gp = [G[i:i + 1, :] + (h_k if i == k else 0.0)
                      for i in range(6)]
                r_p = sweep_res(Gp)
                for i in range(6):
                    J[i][k] = (r_p[i:i + 1, :] - r[i:i + 1, :]) / h_k
            # Levenberg-Marquardt term with Marquardt scaling — zero on
            # healthy lanes, escalated after line-search failures (the
            # in-kernel twin of core.shooting.newton_solve's recovery)
            for i in range(6):
                J[i][i] = J[i][i] + lam * jnp.maximum(jnp.abs(J[i][i]),
                                                      1.0)

            dG = solve6(J, [-r[i:i + 1, :] for i in range(6)])
            fin = jnp.ones((1, TB), jnp.bool_)
            for i in range(6):
                fin = fin & jnp.isfinite(dG[i])
            dG = [jnp.where(fin, dG[i], 0.0) for i in range(6)]

            # --- backtracking line search: first improving alpha ------
            # fori (not an unrolled python loop) keeps the sweep body
            # inlined only once here — compile time stays flat in
            # n_alphas; found mask carried as f32 (i1 yield restriction)
            def ls_body(k, ls):
                (G_best, r_best, r2_best, found_f) = ls
                a = jnp.exp2(-k.astype(dtype))               # 0.5**k
                Gc = [G[i:i + 1, :] + a * dG[i] for i in range(6)]
                Gc_cat = jnp.concatenate(Gc, axis=0)
                r_c = sweep_res(Gc)
                r2_c = jnp.sum(r_c * r_c, axis=0, keepdims=True)
                improves = (r2_c < r2) & (found_f < 0.5)
                take = improves & active
                G_best = jnp.where(take, Gc_cat, G_best)
                r_best = jnp.where(take, r_c, r_best)
                r2_best = jnp.where(take, r2_c, r2_best)
                found_f = jnp.maximum(found_f,
                                      jnp.where(improves, 1.0, 0.0))
                return (G_best, r_best, r2_best, found_f)

            (G_best, r_best, r2_best, found_f) = jax.lax.fori_loop(
                0, n_alphas, ls_body,
                (G, r, r2, jnp.zeros((1, TB), dtype)))

            # no improving alpha: HOLD position and escalate lambda (the
            # next iteration solves with a damped, better-conditioned
            # system); a successful step resets to pure Newton. Matches
            # newton_solve (core/shooting.py:90-125) semantics.
            no_improve = active & (found_f < 0.5)
            lam = jnp.where(no_improve,
                            jnp.maximum(lam * _LM_GROWTH, _LM_LAMBDA0),
                            0.0).astype(dtype)
            fails_f = jnp.where(no_improve, fails_f + 1.0,
                                jnp.where(active, 0.0, fails_f))
            return (G_best, r_best, r2_best, fails_f, lam, it + 1)

        G, r, r2, fails_f, lam, it = jax.lax.while_loop(
            cond, newton_body, (G, r, r2, fails_f, lam, it))

        # --- final recording sweep at the solved G --------------------
        G6 = [G[i:i + 1, :] for i in range(6)]
        y0 = jnp.concatenate(base_rows(G6, TB), axis=0)
        pad_y = jnp.zeros((_YR - 19, TB), dtype)
        y_ref[pl.ds(0, _YR), :] = jnp.concatenate([y0, pad_y], axis=0)

        def rec_body(j, y):
            y_new, z = node_update(j, y)
            y_ref[pl.ds((j + 1) * _YR, _YR), :] = jnp.concatenate(
                [y_new, pad_y], axis=0)
            z_ref[pl.ds(j * _ZR, _ZR), :] = jnp.concatenate(
                z + [jnp.zeros((_ZR - 6, TB), dtype)], axis=0)
            return y_new

        jax.lax.fori_loop(0, N - 1, rec_body, y0)
        Gout_ref[:] = G
        r2_ref[:] = r2
        it_ref[:] = jnp.full((1, TB), it, jnp.int32)

    def step(G, yh, zh, tf, nn_params=None):
        B = G.shape[0]
        dt = G.dtype
        TB = block_b
        Bp = ((B + TB - 1) // TB) * TB

        Gt = jnp.pad(G, ((0, Bp - B), (0, 0))).T              # (6, Bp)
        yhtp = jnp.pad(yh, ((0, Bp - B), (0, 0), (0, _YR - 19))
                       ).reshape(Bp, N * _YR).T               # (N*_YR, Bp)
        zhtp = jnp.pad(zh, ((0, Bp - B), (0, 0), (0, _ZR - 6))
                       ).reshape(Bp, N * _ZR).T
        tft = jnp.pad(tf, ((0, Bp - B), (0, 0))).T            # (3, Bp)
        vmem = pltpu.VMEM
        bspec = lambda rows: pl.BlockSpec((rows, TB), lambda i: (0, i),
                                          memory_space=vmem)
        in_specs = [bspec(6), bspec(N * _YR), bspec(N * _ZR), bspec(3)]
        args = [Gt, yhtp, zhtp, tft]
        if use_nn:
            for l in range(n_layers):
                w = nn_params[l]["w"]
                b = nn_params[l]["b"][:, None]
                for a in (w, b):
                    args.append(a)
                    in_specs.append(pl.BlockSpec(
                        a.shape, lambda i: (0, 0), memory_space=vmem))

        out_shape = [jax.ShapeDtypeStruct((6, Bp), dt),
                     jax.ShapeDtypeStruct((N * _YR, Bp), dt),
                     jax.ShapeDtypeStruct(((N - 1) * _ZR, Bp), dt),
                     jax.ShapeDtypeStruct((1, Bp), dt),
                     jax.ShapeDtypeStruct((1, Bp), jnp.int32)]
        out_specs = [bspec(6), bspec(N * _YR), bspec((N - 1) * _ZR),
                     bspec(1), bspec(1)]

        outs = pl.pallas_call(
            make_kernel(B),
            grid=(Bp // TB,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
        G_new = outs[0].T[:B]
        y_out = outs[1].T[:B].reshape(B, N, _YR)[:, :, :19]
        z_out = outs[2].T[:B].reshape(B, N - 1, _ZR)[:, :, :6]
        r2 = outs[3].T[:B, 0]
        iters = outs[4].T[:B, 0]
        return G_new, y_out, z_out, r2, iters

    return step
