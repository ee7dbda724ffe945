"""Explicit halo-exchange spatial sharding for very fine rods.

``simulate_scan_ms(mesh=...)`` (core/multiple_shooting.py) shards its
segment axis via GSPMD sharding constraints: correct, and the right
first answer — but the partitioner keeps the solver's small algebra
replicated, which means every Newton iteration all-gathers the full
per-segment Jacobian stack (S x 19 x 19) and every device redundantly
runs the S-long affine prefix. Fine at S ~ 10^1..10^2; at the SURVEY
§5 endgame — spatial sharding for N in the tens of thousands (the
sequential recurrence being parallelized: reference
cosserat_ode.py:198-201) — the wire and memory cost must not scale
with S. This module is that design, written as explicit SPMD
(``jax.shard_map``) with hand-placed collectives:

  * unknowns: each device OWNS the 19-dim start states of its S/D local
    segments; only G (6 numbers) is replicated;
  * continuity residual: one ``ppermute`` per evaluation — device d+1's
    first start state travels one hop LEFT (the halo);
  * BDF-2 history: one ``ppermute`` per TIME STEP — the last swept node
    state travels one hop RIGHT (the halo that carries the spatial
    recurrence across the device boundary);
  * Newton direction (same block-bidiagonal elimination as
    multiple_shooting._structured_direction): the affine-map prefix runs
    as a DISTRIBUTED scan — local prefix per device, ``all_gather`` of
    the D per-device TOTAL operators (19x19 + 19 each, independent of
    S), redundant exclusive compose over D, local application — plus a
    replicated damped 6x6 reduced solve;
  * sweeps, 19-tangent jacfwds, and line-search candidate sweeps are
    pure device-local compute.

Per Newton iteration the interconnect carries O(D * 19^2) floats no
matter how fine the rod; per time step one extra 19-float halo hop.
Parity: same discrete equations, same damped-Newton/LM semantics as
solver="structured", so trajectories match to solver tolerance
(tests/test_spatial_halo.py pins it on the 8-virtual-device CPU mesh).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..core.params import RodParams
from ..core.rhs import rhs
from ..core.shooting import NewtonStats
from ..core.spatial import base_state
from ..core.stepper import SimOutput, initial_state
from ..ops.linalg import solve_small

__all__ = ["simulate_scan_ms_halo"]


def _send_right(x, axis: str, D: int):
    """Device d -> d+1 (device 0 receives zeros)."""
    return lax.ppermute(x, axis, [(d, d + 1) for d in range(D - 1)])


def _send_left(x, axis: str, D: int):
    """Device d -> d-1 (device D-1 receives zeros)."""
    return lax.ppermute(x, axis, [(d, d - 1) for d in range(1, D)])


def simulate_scan_ms_halo(
    p: RodParams,
    controls: jnp.ndarray,
    n_segments: int,
    mesh,
    nn_fn: Optional[Callable] = None,
    nn_history: bool = False,
    tol: Optional[float] = None,
    max_iter: int = 50,
    seq_axis: str = "seq",
    max_backtracks: int = 6,
    lm_lambda0: float = 1e-4,
    lm_growth: float = 30.0,
    max_escalations: int = 4,
) -> SimOutput:
    """Drop-in analogue of ``simulate_scan_ms(solver="structured")`` whose
    segment axis is explicitly sharded over ``mesh[seq_axis]`` with
    halo-exchange collectives (module docstring). Same trajectory contract
    and quirks as core/stepper.simulate_scan ([:-1] drop, frozen tip z,
    [y, z, yh, zh] records; reference knode.py:96-100)."""
    if tol is None:
        tol = 1e-16 if jnp.dtype(p.dtype) == jnp.float64 else 1e-10
    S = int(n_segments)
    m = (int(p.N) - 1) // S
    if m * S != int(p.N) - 1:
        raise ValueError(f"n_segments={S} must divide N-1={int(p.N) - 1}")
    D = int(mesh.shape[seq_axis])
    if S % D:
        raise ValueError(f"n_segments={S} must divide over the "
                         f"{seq_axis}={D} mesh axis")
    Sd = S // D
    dtype = jnp.dtype(p.dtype)
    T = int(controls.shape[0])
    alphas = (0.5 ** jnp.arange(max_backtracks + 1)).astype(dtype)
    eye6 = jnp.eye(6, dtype=dtype)
    eye19 = jnp.eye(19, dtype=dtype)
    # dYb/dG selector: starts[0] = base_state(G) places G at rows 7:13
    # (core/spatial.base_state; reference cosserat_ode.py:194)
    B = jnp.zeros((19, 6), dtype).at[7:13, :].set(eye6)

    def sweep(start, yh_seg, zh_seg, tf):
        """One local segment sweep: emits swept outputs (m, 19), input-node
        strains (m, 6), and the end state."""
        def step(yj, inp):
            yhj, zhj = inp
            dy, zj = rhs(p, yj, yhj, zhj, tf, nn_fn, nn_history)
            y_next = yj + p.ds * dy
            return y_next, (y_next, zj)

        y_end, (ys, zs) = lax.scan(step, start, (yh_seg, zh_seg))
        return ys, zs, y_end

    def end_only(start, yh_seg, zh_seg, tf):
        def step(yj, inp):
            yhj, zhj = inp
            dy, _ = rhs(p, yj, yhj, zhj, tf, nn_fn, nn_history)
            return yj + p.ds * dy, None

        y_end, _ = lax.scan(step, start, (yh_seg, zh_seg))
        return y_end, y_end

    def rollout_local(ctl):
        """The WHOLE rollout, per-device view: local arrays carry the
        device's Sd segments; replicated scalars (G, base row, stats) are
        identical on every device."""
        didx = lax.axis_index(seq_axis)
        is_first = didx == 0
        is_last = didx == D - 1
        not_last = (~is_last).astype(dtype)

        def fix_first(G, St):
            """Device 0's first start is DERIVED from G, not free."""
            row0 = jnp.where(is_first, base_state(p, G), St[0])
            return St.at[0].set(row0)

        def cont_rows(St_fixed, ends):
            """Local continuity residual rows (one per local boundary);
            the cross-device boundary comes in via the LEFT halo; the last
            device's final row is the tip (masked to zero here)."""
            nxt = _send_left(St_fixed[..., 0, :], seq_axis, D)
            row_last = (ends[..., -1, :] - nxt) * not_last
            return jnp.concatenate(
                [ends[..., :-1, :] - St_fixed[..., 1:, :],
                 row_last[..., None, :]], axis=-2)

        def tip_of(ends_last):
            return jnp.concatenate([p.F_tip - ends_last[..., 7:10],
                                    p.M_tip - ends_last[..., 10:13]],
                                   axis=-1)

        def resid(G, St, yh_l, zh_l, tf):
            St_f = fix_first(G, St)
            ends = jax.vmap(lambda s, a, b: end_only(s, a, b, tf)[0])(
                St_f, yh_l, zh_l)
            cont = cont_rows(St_f, ends)
            tip_loc = jnp.where(is_last, tip_of(ends[-1]), jnp.zeros(6, dtype))
            r2 = lax.psum(jnp.sum(cont * cont) + jnp.sum(tip_loc * tip_loc),
                          seq_axis)
            return r2, cont, lax.psum(tip_loc, seq_axis)

        def direction(G, St, lam, yh_l, zh_l, tf):
            """Distributed block-bidiagonal elimination (module docstring);
            algebra identical to multiple_shooting._structured_direction."""
            St_f = fix_first(G, St)
            A, ends = jax.vmap(lambda s, a, b: jax.jacfwd(
                lambda ss: end_only(ss, a, b, tf), has_aux=True)(s))(
                St_f, yh_l, zh_l)                     # (Sd,19,19), (Sd,19)
            cont = cont_rows(St_f, ends)
            tip_loc = jnp.where(is_last, tip_of(ends[-1]),
                                jnp.zeros(6, dtype))
            r_tip = lax.psum(tip_loc, seq_axis)
            r2 = lax.psum(jnp.sum(cont * cont) + jnp.sum(tip_loc * tip_loc),
                          seq_axis)

            scale = 1.0 / (1.0 + lam)
            ops_T = scale * A                          # (Sd, 19, 19)
            ops_t = scale * cont                       # (Sd, 19)
            # the last device's final map is the TIP, not a continuity
            # boundary: make it the identity so local prefixes compose
            # cleanly (and Sd == 1 degenerates correctly)
            ops_T = ops_T.at[-1].set(
                jnp.where(is_last, eye19, ops_T[-1]))
            ops_t = ops_t.at[-1].set(
                jnp.where(is_last, jnp.zeros(19, dtype), ops_t[-1]))

            def comb(a, b):    # apply b AFTER a: b ∘ a
                return (b[0] @ a[0], b[0] @ a[1] + b[1])

            # local inclusive prefix of the affine operators
            def chain(carry, op):
                out = comb(carry, op)
                return out, out

            _, (Tp, tp) = lax.scan(chain, (eye19, jnp.zeros(19, dtype)),
                                   (ops_T, ops_t))
            # distributed scan: gather D device-TOTAL operators (not the
            # S segment Jacobians), compose the exclusive prefix
            # redundantly, pick own incoming operator
            T_all = lax.all_gather(Tp[-1], seq_axis)   # (D, 19, 19)
            t_all = lax.all_gather(tp[-1], seq_axis)   # (D, 19)

            def excl(carry, op):
                return comb(carry, op), carry

            (_, _), (T_ex, t_ex) = lax.scan(excl,
                                            (eye19, jnp.zeros(19, dtype)),
                                            (T_all, t_all))
            Tin = T_ex[didx]
            tin = t_ex[didx]
            # global prefixes at local boundaries: P_local ∘ incoming
            Tg = jnp.einsum("sij,jk->sik", Tp, Tin)
            tg = jnp.einsum("sij,j->si", Tp, tin) + tp

            # reduced 6x6 tip system (replicated): M_last at boundary S-2
            # = last device's Tg[-1] (its final map is identity)
            M_last = lax.psum(jnp.where(is_last, Tg[-1] @ B,
                                        jnp.zeros((19, 6), dtype)), seq_axis)
            v_last = lax.psum(jnp.where(is_last, tg[-1],
                                        jnp.zeros(19, dtype)), seq_axis)
            CA = lax.psum(jnp.where(is_last, A[-1, 7:13, :],
                                    jnp.zeros((6, 19), dtype)), seq_axis)
            K = CA @ M_last
            rhs6 = r_tip - CA @ v_last
            Dd = jnp.maximum(jnp.abs(jnp.diagonal(K)), 1.0)
            dG = solve_small(K + lam * Dd * eye6, rhs6)

            # local start updates: row j (= global start d*Sd + j) uses the
            # global prefix at boundary d*Sd + j - 1 — the incoming
            # operator for j = 0, the local prefixes shifted by one after
            Mrows = jnp.concatenate(
                [(Tin @ B)[None], jnp.einsum("sij,jk->sik", Tg[:-1], B)],
                axis=0)                                # (Sd, 19, 6)
            vrows = jnp.concatenate([tin[None], tg[:-1]], axis=0)
            dSt = jnp.einsum("sij,j->si", Mrows, dG) + vrows
            # steepest-descent fallback when the solve went non-finite
            # (mirrors _newton_loop's dX = -r): -cont shifted one row right
            # across the device boundary (RIGHT halo)
            prev_cont = _send_right(cont[-1], seq_axis, D)
            fb = -jnp.concatenate([prev_cont[None], cont[:-1]], axis=0)
            bad = lax.psum(jnp.sum(~jnp.isfinite(dSt)), seq_axis) \
                + jnp.sum(~jnp.isfinite(dG))
            dG = jnp.where(bad == 0, dG, -r_tip)
            dSt = jnp.where(bad == 0, dSt, fb)
            # device 0 row 0 is derived from G — never moves independently
            dSt = dSt.at[0].set(dSt[0] * jnp.where(is_first, 0.0, 1.0))
            return dG, dSt, r2, cont, r_tip

        def newton(G0, St0, yh_l, zh_l, tf):
            r2_0, _, _ = resid(G0, St0, yh_l, zh_l, tf)

            def cond(state):
                _, _, r2, it, lam, fails, _ = state
                return (r2 > tol) & (it < max_iter) & \
                    (fails <= max_escalations)

            def body(state):
                G, St, r2, it, lam, fails, retries = state
                dG, dSt, r2_here, _, _ = direction(G, St, lam, yh_l, zh_l,
                                                   tf)
                # vmapped backtracking line search: candidate sweeps are
                # device-local; ONE batched halo + ONE psum scores all
                # candidates
                G_c = G[None] + alphas[:, None] * dG[None]
                St_c = St[None] + alphas[:, None, None] * dSt[None]
                St_cf = jax.vmap(fix_first)(G_c, St_c)
                ends_c = jax.vmap(lambda St1: jax.vmap(
                    lambda s, a, b: end_only(s, a, b, tf)[0])(
                    St1, yh_l, zh_l))(St_cf)          # (K, Sd, 19)
                cont_c = cont_rows(St_cf, ends_c)     # (K, Sd, 19)
                tip_c = jnp.where(is_last, tip_of(ends_c[:, -1]),
                                  jnp.zeros((alphas.shape[0], 6), dtype))
                r2_c = lax.psum(
                    jnp.sum(cont_c * cont_c, axis=(1, 2))
                    + jnp.sum(tip_c * tip_c, axis=1), seq_axis)
                improves = r2_c < r2
                idx = jnp.argmax(improves)
                found = jnp.any(improves)
                pick = jnp.where(found, idx, 0)
                a = alphas[pick]
                G_new = jnp.where(found, G + a * dG, G)
                St_new = jnp.where(found, St + a * dSt, St)
                r2_new = jnp.where(found, r2_c[pick], r2)
                lam_new = jnp.where(found, 0.0,
                                    jnp.maximum(lam * lm_growth,
                                                jnp.asarray(lm_lambda0,
                                                            dtype)))
                fails = jnp.where(found, 0, fails + 1)
                retries = retries + jnp.where(found, 0, 1).astype(jnp.int32)
                return (G_new, St_new, r2_new, it + 1,
                        lam_new.astype(dtype), fails, retries)

            state0 = (G0, St0, r2_0, jnp.array(0, jnp.int32),
                      jnp.zeros((), dtype), jnp.array(0, jnp.int32),
                      jnp.array(0, jnp.int32))
            G, St, r2, it, lam, fails, retries = lax.while_loop(
                cond, body, state0)
            return G, St, NewtonStats(it, jnp.sqrt(r2), r2 <= tol, retries)

        # ---- initial local state ------------------------------------
        y0_full, z0_full = initial_state(p)            # (N, 19), (N, 6)
        g0 = didx * (Sd * m)                           # first owned node - 1
        y_loc0 = lax.dynamic_slice_in_dim(y0_full, g0 + 1, Sd * m, 0)
        z_loc0 = lax.dynamic_slice_in_dim(z0_full, g0, Sd * m, 0)
        y_base0 = y0_full[0]
        z_tip = z0_full[-1]
        G0 = jnp.zeros(6, dtype)

        def step(carry, tensions):
            (y_loc, z_loc, y_prev, z_prev, y_base, y_base_prev, G,
             G_prev) = carry
            tf = jnp.einsum("t,tc->c", jnp.asarray(tensions, dtype),
                            jnp.asarray(p.tendon_dirs, dtype),
                            precision=jax.lax.Precision.HIGHEST)
            # RIGHT halo: the last swept node (current + previous step)
            # seeds the next device's history and warm start
            halo = _send_right(jnp.stack([y_loc[-1], y_prev[-1]]),
                               seq_axis, D)
            halo_y = jnp.where(is_first, y_base, halo[0])
            halo_y_prev = jnp.where(is_first, y_base_prev, halo[1])
            # per-segment BDF-2 history over sweep-INPUT nodes
            # [g0 .. g0 + Sd*m - 1]: left-halo node + own nodes minus last
            y_in = jnp.concatenate([halo_y[None], y_loc[:-1]], axis=0)
            y_in_prev = jnp.concatenate([halo_y_prev[None], y_prev[:-1]],
                                        axis=0)
            yh_l = (p.c1 * y_in + p.c2 * y_in_prev).reshape(Sd, m, 19)
            zh_flat = p.c1 * z_loc + p.c2 * z_prev
            zh_l = zh_flat.reshape(Sd, m, 6)

            # warm start: G extrapolates (2G - G_prev, stepper parity);
            # starts = current states at the boundary nodes
            G_ws = 2.0 * G - G_prev
            St_ws = jnp.concatenate(
                [halo_y[None], y_loc[m - 1:Sd * m - 1:m]], axis=0)
            G_new, St, stats = newton(G_ws, St_ws, yh_l, zh_l, tf)

            St_f = fix_first(G_new, St)
            ys, zs, _ = jax.vmap(lambda s, a, b: sweep(s, a, b, tf))(
                St_f, yh_l, zh_l)
            y_new = ys.reshape(Sd * m, 19)
            z_new_in = zs.reshape(Sd * m, 6)     # strains at INPUT nodes

            # record rows (reference layout [y, z, yh, zh], knode.py:96-100)
            # for the device's own nodes g0+1 .. g0+Sd*m; z at own node
            # n comes from the NEXT device's first input strain (LEFT halo)
            # — the tip node's z stays frozen (stepper quirk parity)
            z_halo = _send_left(z_new_in[0], seq_axis, D)
            z_rows = jnp.concatenate(
                [z_new_in[1:],
                 jnp.where(is_last, z_tip, z_halo)[None]], axis=0)
            yh_rows = p.c1 * y_loc + p.c2 * y_prev
            zh_prev_halo = _send_left(zh_flat[0], seq_axis, D)
            zh_rows = jnp.concatenate(
                [zh_flat[1:],
                 jnp.where(is_last, p.c1 * z_tip + p.c2 * z_tip,
                           zh_prev_halo)[None]], axis=0)
            rec_local = jnp.concatenate([y_new, z_rows, yh_rows, zh_rows],
                                        axis=-1)       # (Sd*m, 50)

            # node-0 row is computed on device 0, replicated by psum
            y_base_new = base_state(p, G_new)
            rec0 = jnp.concatenate([
                y_base_new, z_new_in[0],
                p.c1 * y_base + p.c2 * y_base_prev,
                zh_flat[0]])
            rec0 = lax.psum(jnp.where(is_first, rec0, jnp.zeros(50, dtype)),
                            seq_axis)

            new_carry = (y_new, z_new_in, y_loc, z_loc, y_base_new, y_base,
                         G_new, G)
            return new_carry, (rec_local, rec0, G_new, stats.iterations,
                               stats.residual_norm, stats.lm_retries)

        carry0 = (y_loc0, z_loc0, y_loc0, z_loc0, y_base0, y_base0, G0, G0)
        _, (recs, rec0s, Gs, iters, res, lm) = lax.scan(
            step, carry0, ctl[: T - 1])
        return recs, rec0s, Gs, iters, res, lm

    sharded = jax.shard_map(
        rollout_local, mesh=mesh,
        in_specs=P(),
        out_specs=(P(None, seq_axis, None), P(), P(), P(), P(), P()),
        check_vma=False)

    controls = jnp.asarray(controls, dtype)
    recs, rec0s, Gs, iters, res, lm = sharded(controls)

    y0_full, z0_full = initial_state(p)
    rec_t0 = jnp.concatenate([y0_full, z0_full, y0_full, z0_full],
                             axis=-1)[None]            # (1, N, 50)
    body = jnp.concatenate([rec0s[:, None, :], recs], axis=1)  # (T-1, N, 50)
    traj = jnp.concatenate([rec_t0, body], axis=0)
    G0 = jnp.zeros((1, 6), dtype)
    return SimOutput(
        traj,
        jnp.concatenate([G0, Gs], axis=0),
        jnp.concatenate([jnp.zeros(1, iters.dtype), iters]),
        jnp.concatenate([jnp.zeros(1, res.dtype), res]),
        jnp.concatenate([jnp.zeros(1, lm.dtype), lm]),
    )
