"""Pallas TPU mega-kernel: one ENTIRE coupled-assembly BDF-2 step per launch.

The XLA assembly step (core/assembly.assembly_solve_step) is latency-bound
at small batch: every damped-Newton iteration dispatches M rod sweeps, a
(6M+7)-tangent jacfwd, a dense LU solve and line-search glue as separate
fused-op launches — measured ~600 us/step for M=3, N=10 on one chip
(bench `assembly_steps_per_sec_3rods` ~1.6k). This kernel runs the WHOLE
damped-Newton solve of the coupled system in ONE pallas_call, using the
TPU's 128 lanes as the parallel axis the single-assembly problem otherwise
wastes:

  unknowns  X = [G_1..G_M (6 each), p_plate (3), h_plate (4)]  (U = 6M+7)

  per Newton iteration (two full-lane residual passes, zero launches):
    lane 0       : base residual r(X)
    lanes 1..U   : +h probes r(X + h_k e_k)   } CENTRAL-difference
    lanes U+1..2U: -h probes r(X - h_k e_k)   } Jacobian columns (O(h^2)
                   truncation — f32 forward differences are too crude for
                   the ill-conditioned arrowhead; measured 13x worse G
                   accuracy vs the f64 truth) land DIRECTLY in the
                   (U, lanes) tile layout after one pltpu.roll
    ------------  pivoted Gauss-Jordan on the (U, TB) tile (row swaps and
                   eliminations are full-width VPU ops; pivots/indices are
                   masked lane/sublane reductions)
    lanes 0..6   : backtracking candidates r(X + 0.5^lane dX) — first
                   (largest-alpha) improver wins, exactly like
                   core/multiple_shooting._newton_loop
    stall        : hold X, escalate Levenberg-Marquardt lambda (x30 ladder,
                   4 escalations), non-finite dX falls back to -r — the
                   same recovery semantics as _newton_loop.

A residual pass evaluates ALL lanes at once: each rod's spatial sweep
(ops/pallas_sweep.make_rhs_rows — the one shared physics body) integrates
base->tip with lane-private G_i, then the plate algebra
(core/assembly._residual_algebra re-derived on (1, TB) lane-rows) closes
the coupled residual. So the FD Jacobian costs ONE sweep pass instead of
6M+7 sequential tangents, and the line search another — the assembly twin
of ops/pallas_step.py.

Scope (v1): no contact plane and no KNODE residual (the bench/MPC-planning
configuration); one assembly per launch — the latency regime. Batched
planning workloads keep the vmapped XLA path (crossover measured in
docs/BENCHMARKS.md). Not differentiable; training/MPC gradients use the
XLA path's custom_root.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweep import _YR, _ZR, _cross as _cross_rows, make_rhs_rows

__all__ = ["make_assembly_step_kernel"]

# _newton_loop's ladder (core/multiple_shooting.py:105-118)
_LM_LAMBDA0 = 1e-4
_LM_GROWTH = 30.0
_MAX_ESCALATIONS = 4
_N_ALPHAS = 7           # max_backtracks=6 -> alphas 0.5^0..0.5^6


def _f3(v):
    return tuple(float(x) for x in np.asarray(v))


def _c33(v):
    m = np.asarray(v, np.float64)
    return tuple(tuple(float(x) for x in row) for row in m)


def _quat_mul_rows(a, b):
    """Hamilton product on lists of 4 (1, TB) rows (assembly._quat_mul)."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return [aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw]


def make_assembly_step_kernel(asm, tol: float = 1e-10, max_iter: int = 50,
                              interpret: bool = False, block_b: int = 128):
    """Build the fused coupled-step solver for a concrete assembly.

    Returns fn(X0 (U,), yh (M,N,19), zh (M,N,6), tf (M,3), pph (3),
    vph (3), hph (4), wbh (3)) -> (X (U,), y (M,N,19), z (M,N-1,6),
    r2 (), iters ()) — the fused equivalent of
    core/assembly.assembly_solve_step (solver="dense", FD Jacobian).

    All assembly parameters are BAKED as kernel constants (per-rod physics
    closures via make_rhs_rows), so a new kernel must be built per assembly
    — simulate_assembly(fused=True) builds it once outside its scan.
    """
    if asm.plate.has_contact:
        raise NotImplementedError(
            "fused assembly step does not support contact planes yet; "
            "use the XLA path (fused=False)")
    M = int(asm.M)
    rods = asm.rods
    N = int(rods.N)
    dtype = jnp.dtype(asm.dtype)
    U = 6 * M + 7
    TB = block_b
    if 2 * U + 1 > TB:
        raise ValueError(f"2(6M+7)+1 = {2 * U + 1} probe lanes exceed the "
                         f"{TB}-lane tile; the fused step supports M <= "
                         f"{(TB - 15) // 12}")
    eps0 = 1e-8 if dtype == jnp.float64 else 3e-4

    # ---- baked per-rod constants + physics closures -----------------
    # pull to numpy BEFORE slicing: the builder may run inside a user jit
    # (asm rides the closure), where slicing a concrete constant would
    # stage it into a tracer np.asarray cannot read back
    rods_np = jax.tree.map(np.asarray, rods)
    rod_list = [jax.tree.map(lambda x: x[i], rods_np) for i in range(M)]
    rhs_i = [make_rhs_rows(r) for r in rod_list]
    p0_i = [_f3(r.p0) for r in rod_list]
    h0_i = [_f3(r.h0) for r in rod_list]
    q0_i = [_f3(r.q0) for r in rod_list]
    w0_i = [_f3(r.w0) for r in rod_list]
    ds_i = [float(np.asarray(r.ds)) for r in rod_list]

    plate = asm.plate
    mass = float(np.asarray(plate.mass))
    inertia = _c33(plate.inertia)
    g3 = _f3(plate.g)
    offs_np = np.asarray(plate.attach_offsets)
    aquats_np = np.asarray(plate.attach_quats)
    offs = [_f3(offs_np[m]) for m in range(M)]
    aquats = [_f3(aquats_np[m]) for m in range(M)]
    c0 = float(np.asarray(rods.c0)[0])

    def kernel(X0_ref, yh_ref, zh_ref, tf_ref, ph_ref,
               X_ref, y_ref, z_ref, r2_ref, it_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, TB), 1)
        lanes_f = lanes.astype(dtype)
        subs = jax.lax.broadcasted_iota(jnp.int32, (U, 1), 0)
        subs_f = subs.astype(dtype)
        # lane k+1 probes unknown k by +h, lane k+1+U by -h (the Jacobian's
        # column-on-lane layout; central difference)
        probe_mask = (lanes == subs + 1).astype(dtype)        # (U, TB)
        neg_mask = (lanes == subs + 1 + U).astype(dtype)      # (U, TB)
        lane0 = (lanes == 0).astype(dtype)                    # (1, TB)

        tf_rows = [[tf_ref[3 * i + c:3 * i + c + 1, :] for c in range(3)]
                   for i in range(M)]
        pph = [ph_ref[c:c + 1, :] for c in range(3)]
        vph = [ph_ref[3 + c:4 + c, :] for c in range(3)]
        hph = [ph_ref[6 + c:7 + c, :] for c in range(4)]
        wbh = [ph_ref[10 + c:11 + c, :] for c in range(3)]

        def sweep_rod(i, G6):
            """Rod i base->tip on every lane; returns tip rows [0:13]."""
            const = lambda c: jnp.full((1, TB), c, dtype)
            y0 = jnp.concatenate(
                [const(p0_i[i][c]) for c in range(3)]
                + [const(h0_i[i][c]) for c in range(4)] + G6
                + [const(q0_i[i][c]) for c in range(3)]
                + [const(w0_i[i][c]) for c in range(3)], axis=0)

            def body(j, y):
                yh_j = yh_ref[pl.ds(i * N * _YR + j * _YR, _YR), :][0:19, :]
                zh_j = zh_ref[pl.ds(i * N * _ZR + j * _ZR, _ZR), :][0:6, :]
                rows = [y[r:r + 1, :] for r in range(19)]
                dy, _ = rhs_i[i](rows, yh_j, zh_j, tf_rows[i], None)
                return jnp.concatenate(
                    [rows[r] + ds_i[i] * dy[r] for r in range(19)], axis=0)

            yN = jax.lax.fori_loop(0, N - 1, body, y0)
            return [yN[r:r + 1, :] for r in range(13)]

        def residual_tile(X):
            """Coupled residual rows (U, TB), each lane at its own X
            (core/assembly._residual_algebra re-derived on lane-rows)."""
            tips = [sweep_rod(i, [X[6 * i + k:6 * i + k + 1, :]
                                  for k in range(6)]) for i in range(M)]
            pp = [X[6 * M + c:6 * M + c + 1, :] for c in range(3)]
            hp = [X[6 * M + 3 + c:6 * M + 4 + c, :] for c in range(4)]

            # plate rotation (same non-unit-safe form as quat_to_rotmat)
            h1, h2, h3, h4 = hp
            hh = h1 * h1 + h2 * h2 + h3 * h3 + h4 * h4
            s = 2.0 / hh
            R = [[1.0 + s * (-h3 * h3 - h4 * h4), s * (h2 * h3 - h4 * h1),
                  s * (h2 * h4 + h3 * h1)],
                 [s * (h2 * h3 + h4 * h1), 1.0 + s * (-h2 * h2 - h4 * h4),
                  s * (h3 * h4 - h2 * h1)],
                 [s * (h2 * h4 - h3 * h1), s * (h3 * h4 + h2 * h1),
                  1.0 + s * (-h2 * h2 - h3 * h3)]]
            R_ = lambda x: [R[r][0] * x[0] + R[r][1] * x[1] + R[r][2] * x[2]
                            for r in range(3)]
            Rt_ = lambda x: [R[0][r] * x[0] + R[1][r] * x[1] + R[2][r] * x[2]
                             for r in range(3)]

            res_pos, res_ori = [], []
            att_w_all, n_tips, m_tips = [], [], []
            for m in range(M):
                off = offs[m]
                att_w = [R[r][0] * off[0] + R[r][1] * off[1]
                         + R[r][2] * off[2] for r in range(3)]
                att_w_all.append(att_w)
                t = tips[m]
                res_pos += [t[c] - (pp[c] + att_w[c]) for c in range(3)]
                # tip orientation vs plate * attach_quat
                ht = t[3:7]
                inv = jax.lax.rsqrt(ht[0] * ht[0] + ht[1] * ht[1]
                                    + ht[2] * ht[2] + ht[3] * ht[3])
                htn = [ht[c] * inv for c in range(4)]
                aq = aquats[m]
                htar = _quat_mul_rows(hp, [jnp.full((1, TB), aq[c], dtype)
                                           for c in range(4)])
                htar_c = [htar[0], -htar[1], -htar[2], -htar[3]]
                rel = _quat_mul_rows(htar_c, htn)
                res_ori += rel[1:4]
                n_tips.append(t[7:10])
                m_tips.append(t[10:13])

            # plate BDF-2 kinematics
            vp = [c0 * pp[c] + pph[c] for c in range(3)]
            ap = [c0 * vp[c] + vph[c] for c in range(3)]
            hdot = [c0 * hp[c] + hph[c] for c in range(4)]
            hp_c = [hp[0], -hp[1], -hp[2], -hp[3]]
            wb = [2.0 * v for v in _quat_mul_rows(hp_c, hdot)[1:4]]
            wbdot = [c0 * wb[c] + wbh[c] for c in range(3)]

            sum_n = [sum(n_tips[m][c] for m in range(M)) for c in range(3)]
            res_f = [mass * (ap[c] - g3[c]) + sum_n[c] for c in range(3)]

            torque_w = [jnp.zeros((1, TB), dtype) for _ in range(3)]
            for m in range(M):
                neg_n = [-n_tips[m][c] for c in range(3)]
                cr = _cross_rows(att_w_all[m], neg_n)
                torque_w = [torque_w[c] + cr[c] - m_tips[m][c]
                            for c in range(3)]
            I_ = lambda x: [inertia[r][0] * x[0] + inertia[r][1] * x[1]
                            + inertia[r][2] * x[2] for r in range(3)]
            Jw = I_(wb)
            Iwd = I_(wbdot)
            wxJw = _cross_rows(wb, Jw)
            Rt_tq = Rt_(torque_w)
            res_m = [Iwd[c] + wxJw[c] - Rt_tq[c] for c in range(3)]

            res_norm = h1 * h1 + h2 * h2 + h3 * h3 + h4 * h4 - 1.0
            return jnp.concatenate(res_pos + res_ori + res_f + res_m
                                   + [res_norm], axis=0)       # (U, TB)

        def solve_tile(A, b_col):
            """Pivoted Gauss-Jordan of A t = b with columns on lanes 1..U:
            A[:, k+1] holds column k. Row swaps/eliminations are (U, TB)
            VPU ops; pivot values and row indices come from masked lane /
            sublane reductions. Returns t as a (U, 1) column."""
            for k in range(U):
                cmask = (lanes == k + 1).astype(dtype)        # (1, TB)
                col = jnp.sum(A * cmask, axis=1, keepdims=True)
                cand = jnp.where(subs >= k, jnp.abs(col), -1.0)
                mx = jnp.max(cand, axis=0, keepdims=True)     # (1, 1)
                is_max = (cand == mx) & (subs >= k)
                imax = jnp.min(jnp.where(is_max, subs_f, float(U)),
                               axis=0, keepdims=True)         # (1, 1)
                rk = (subs_f == float(k)).astype(dtype)       # (U, 1)
                ri = (subs_f == imax).astype(dtype)           # (U, 1)
                row_k = jnp.sum(A * rk, axis=0, keepdims=True)  # (1, TB)
                row_i = jnp.sum(A * ri, axis=0, keepdims=True)
                A = A + ri * (row_k - row_i) + rk * (row_i - row_k)
                bk = jnp.sum(b_col * rk, axis=0, keepdims=True)
                bi = jnp.sum(b_col * ri, axis=0, keepdims=True)
                b_col = b_col + ri * (bk - bi) + rk * (bi - bk)
                # post-swap: row k = old row imax (row_i), b[k] = bi
                pivot = jnp.sum(row_i * cmask, axis=1, keepdims=True)
                col_new = jnp.sum(A * cmask, axis=1, keepdims=True)
                factors = col_new / pivot * (1.0 - rk)        # (U, 1)
                A = A - factors * row_i
                b_col = b_col - factors * bi
            diag = jnp.sum(A * probe_mask, axis=1, keepdims=True)
            return b_col / diag

        X = X0_ref[0:U, :]                                    # (U, TB)

        def cond(state):
            X, r2, lam, fails, it = state
            return (r2 > tol) & (fails <= _MAX_ESCALATIONS) & (it < max_iter)

        def newton_body(state):
            X, r2, lam, fails, it = state
            x_col = jnp.sum(X * lane0, axis=1, keepdims=True)  # (U, 1)
            h_col = eps0 * (1.0 + jnp.abs(x_col))
            # one pass: base residual on lane 0, +-h probes on 1..2U
            Rt = residual_tile(X + h_col * (probe_mask - neg_mask))
            r_col = jnp.sum(Rt * lane0, axis=1, keepdims=True)
            # central difference: align the -h block (lanes U+1..2U) onto
            # the +h block (lanes 1..U) with one lane roll
            Rt_neg = pltpu.roll(Rt, shift=TB - U, axis=1)  # lane+U -> lane
            live = (lanes >= 1) & (lanes <= U)
            A = jnp.where(live, Rt - Rt_neg, 0.0)   # = J * 2h columns
            # LM with Marquardt scaling in probe-difference space:
            # J+lam*max(|Jii|,1) <=> A_ii += lam*max(|A_ii|, 2h_i)
            adiag = jnp.sum(A * probe_mask, axis=1, keepdims=True)
            A = A + (lam * jnp.maximum(jnp.abs(adiag),
                                       2.0 * h_col)) * probe_mask
            t_col = solve_tile(A, -r_col)
            dX = 2.0 * h_col * t_col                           # (U, 1)
            fin = jnp.all(jnp.isfinite(dX))
            dX = jnp.where(fin, dX, -r_col)    # _newton_loop's fallback

            # line search on lanes: alpha_l = 0.5^l for l < n_alphas
            alpha = jnp.where(lanes < _N_ALPHAS,
                              jnp.exp2(-lanes_f), 0.0)         # (1, TB)
            Rc = residual_tile(X + alpha * dX)
            r2_l = jnp.sum(Rc * Rc, axis=0, keepdims=True)     # (1, TB)
            improves = (r2_l < r2) & (lanes < _N_ALPHAS)
            found = jnp.any(improves)
            idx = jnp.min(jnp.where(improves, lanes_f,
                                    float(_N_ALPHAS)))         # scalar
            a_pick = jnp.exp2(-idx)
            r2_pick = jnp.sum(jnp.where(lanes_f == idx, r2_l, 0.0))
            X = jnp.where(found, X + a_pick * dX, X)
            r2 = jnp.where(found, r2_pick, r2)
            lam = jnp.where(found, 0.0,
                            jnp.maximum(lam * _LM_GROWTH, _LM_LAMBDA0))
            fails = jnp.where(found, 0, fails + 1)
            return (X, r2, lam, fails, it + 1)

        r0 = residual_tile(X)
        r2_0 = jnp.sum(jnp.sum(r0 * r0, axis=0, keepdims=True) * lane0)
        X, r2, lam, fails, it = jax.lax.while_loop(
            cond, newton_body,
            (X, r2_0, jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32)))

        # ---- recording sweeps at the solved X ------------------------
        pad_y = jnp.zeros((_YR - 19, TB), dtype)
        pad_z = jnp.zeros((_ZR - 6, TB), dtype)
        for i in range(M):
            const = lambda c: jnp.full((1, TB), c, dtype)
            y0 = jnp.concatenate(
                [const(p0_i[i][c]) for c in range(3)]
                + [const(h0_i[i][c]) for c in range(4)]
                + [X[6 * i + k:6 * i + k + 1, :] for k in range(6)]
                + [const(q0_i[i][c]) for c in range(3)]
                + [const(w0_i[i][c]) for c in range(3)], axis=0)
            y_ref[pl.ds(i * N * _YR, _YR), :] = jnp.concatenate(
                [y0, pad_y], axis=0)

            def rec_body(j, y, i=i):
                yh_j = yh_ref[pl.ds(i * N * _YR + j * _YR, _YR), :][0:19, :]
                zh_j = zh_ref[pl.ds(i * N * _ZR + j * _ZR, _ZR), :][0:6, :]
                rows = [y[r:r + 1, :] for r in range(19)]
                dy, z = rhs_i[i](rows, yh_j, zh_j, tf_rows[i], None)
                y_new = jnp.concatenate(
                    [rows[r] + ds_i[i] * dy[r] for r in range(19)], axis=0)
                y_ref[pl.ds(i * N * _YR + (j + 1) * _YR, _YR), :] = \
                    jnp.concatenate([y_new, pad_y], axis=0)
                z_ref[pl.ds(i * (N - 1) * _ZR + j * _ZR, _ZR), :] = \
                    jnp.concatenate(z + [pad_z], axis=0)
                return y_new

            jax.lax.fori_loop(0, N - 1, rec_body, y0)

        X_ref[:] = X
        r2_ref[:] = jnp.full((1, TB), r2, dtype)
        it_ref[:] = jnp.full((1, TB), it, jnp.int32)

    def step(X0, yh, zh, tf, pph, vph, hph, wbh):
        """X0 (U,), yh (M,N,19), zh (M,N,6), tf (M,3), plate histories
        -> (X (U,), y (M,N,19), z (M,N-1,6), r2 (), iters ())."""
        X0t = jnp.broadcast_to(X0[:, None], (U, TB))
        yht = jnp.broadcast_to(
            jnp.pad(yh, ((0, 0), (0, 0), (0, _YR - 19))
                    ).reshape(M * N * _YR)[:, None], (M * N * _YR, TB))
        zht = jnp.broadcast_to(
            jnp.pad(zh, ((0, 0), (0, 0), (0, _ZR - 6))
                    ).reshape(M * N * _ZR)[:, None], (M * N * _ZR, TB))
        tft = jnp.broadcast_to(tf.reshape(3 * M)[:, None], (3 * M, TB))
        ph = jnp.concatenate([pph, vph, hph, wbh])[:, None]
        pht = jnp.broadcast_to(ph, (13, TB))

        vmem = pltpu.VMEM
        spec = pl.BlockSpec(memory_space=vmem)
        outs = pl.pallas_call(
            kernel,
            in_specs=[spec] * 5,
            out_specs=[spec] * 5,
            out_shape=[
                jax.ShapeDtypeStruct((U, TB), dtype),
                jax.ShapeDtypeStruct((M * N * _YR, TB), dtype),
                jax.ShapeDtypeStruct((M * (N - 1) * _ZR, TB), dtype),
                jax.ShapeDtypeStruct((1, TB), dtype),
                jax.ShapeDtypeStruct((1, TB), jnp.int32),
            ],
            interpret=interpret,
        )(X0t, yht, zht, tft, pht)
        X = outs[0][:, 0]
        y = outs[1][:, 0].reshape(M, N, _YR)[:, :, :19]
        z = outs[2][:, 0].reshape(M, N - 1, _ZR)[:, :, :6]
        return X, y, z, outs[3][0, 0], outs[4][0, 0]

    return step
