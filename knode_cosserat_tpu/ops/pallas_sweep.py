"""Pallas TPU kernel: the ENTIRE spatial sweep in one kernel.

The XLA rollout's cost is dominated by kernel-launch overhead: each spatial
Euler sweep is an N-1-step lax.scan of dozens of tiny fused ops, and every
Newton iteration runs two such sweeps (Jacobian + line-search candidates).
This kernel runs the whole base->tip integration (cosserat_ode.py:188-213)
inside one pallas_call: state lives in VMEM laid out state-major —
components on sublanes, the batch on LANES — so every 3-vector operation is
a full-width VPU op, and the optional KNODE MLP is an MXU matmul per node.

Batch semantics: B = (rods x G-variants). The shooting driver
(core/fast_rollout.py) expands each rod's Newton probes (finite-difference
Jacobian columns + line-search candidates) into the batch, so one kernel
launch per Newton phase replaces thousands of tiny ops.

Two lowering modes:
  * static unroll — every node's RHS is inlined (best for small N Euler);
    compile time grows with N x RK4 stages.
  * grid pipeline — the node loop IS the pallas grid's inner dimension:
    grid (batch_blocks, N-1), the integrated state carried across grid
    steps in a VMEM scratch buffer, per-node history blocks streamed in by
    the BlockSpec index maps. The kernel body is compiled ONCE regardless
    of N, so N=80 RK4 compiles as fast as N=10 Euler.

MLP support: any layer count (spec.dims) and both input variants — 28
([y, z, tf]) and the 53-input history net ([y, yh, z, zh, tf],
cosserat_ode.py:171-175).

Outputs: tip residual (B, 6), plus (optionally) the full integrated rod
y (B, N, 19) and strains z (B, N-1, 6) for the recording sweep.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import RodParams
from ..models.mlp import MLPSpec

__all__ = ["make_sweep_kernel"]


def _c3(M):
    M = np.asarray(M, np.float64)
    return tuple(tuple(float(x) for x in row) for row in M)


def _matvec3(M, x):
    out = []
    for i in range(3):
        acc = None
        for j in range(3):
            c = M[i][j]
            if c == 0.0:
                continue
            t = c * x[j]
            acc = t if acc is None else acc + t
        out.append(acc if acc is not None else jnp.zeros_like(x[0]))
    return out


def _cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


# padded per-node slab heights for the grid-pipelined lowering: Mosaic
# requires streamed block second-minor dims divisible by 8 (19 state rows
# -> 24, 6 strain rows -> 8); kernels slice back to the live rows
_YR = 24
_ZR = 8


def _activation_rows(name):
    """Elementwise activation on a (rows, TB) tile. Explicit formulas —
    Mosaic lacks expm1 (and these match the reference numpy shim exactly,
    cosserat_ode.py:92-94)."""
    if name == "elu":
        return lambda a: jnp.where(a > 0, a, jnp.exp(a) - 1.0)
    if name == "tanh":
        return jnp.tanh
    if name == "relu":
        return lambda a: jnp.maximum(a, 0.0)
    if name == "softplus":
        return lambda a: jnp.log1p(jnp.exp(-jnp.abs(a))) + jnp.maximum(a, 0.0)
    raise ValueError(name)


def make_rhs_rows(p: RodParams, spec: MLPSpec | None = None):
    """Factory for the in-kernel per-node RHS on (1, TB) lane-rows.

    Shared by the sweep kernel (this module) and the mega step kernel
    (ops/pallas_step.py) so the physics lives in exactly ONE place.
    Returns rhs_rows(y, yh_j, zh_j, tf, w_refs) -> (dy rows(19), z rows(6))
    with y a list of 19 (1, TB) rows, yh_j (19, TB), zh_j (6, TB), tf a
    list of 3 rows (mirrors cosserat_ode.py:114-186)."""
    f = lambda v: float(np.asarray(v))
    Kse_inv = _c3(p.Kse_c0Bse_inv)
    Kbt_inv = _c3(p.Kbt_c0Bbt_inv)
    Bse = _c3(p.Bse)
    Bbt = _c3(p.Bbt)
    rhoJ = _c3(p.rhoJ)
    v_rest = tuple(float(x) for x in np.asarray(p.v_rest))
    rhoAg = tuple(float(x) for x in np.asarray(p.rhoAg))
    Cdrag = tuple(float(x) for x in np.asarray(p.C))
    c0 = f(p.c0)
    rhoA = f(p.rhoA)
    use_nn = spec is not None
    n_layers = len(spec.dims) - 1 if use_nn else 0
    act = _activation_rows(spec.activation) if use_nn else None

    def rhs_rows(y, yh_j, zh_j, tf, w_refs):
        h = y[3:7]
        n = y[7:10]
        m = y[10:13]
        q = y[13:16]
        w = y[16:19]
        vh = [zh_j[i:i + 1, :] for i in range(3)]
        uh = [zh_j[i:i + 1, :] for i in range(3, 6)]

        h1, h2, h3, h4 = h
        hh = h1 * h1 + h2 * h2 + h3 * h3 + h4 * h4
        s = 2.0 / hh
        R = [[1.0 + s * (-h3 * h3 - h4 * h4), s * (h2 * h3 - h4 * h1),
              s * (h2 * h4 + h3 * h1)],
             [s * (h2 * h3 + h4 * h1), 1.0 + s * (-h2 * h2 - h4 * h4),
              s * (h3 * h4 - h2 * h1)],
             [s * (h2 * h4 - h3 * h1), s * (h3 * h4 + h2 * h1),
              1.0 + s * (-h2 * h2 - h3 * h3)]]
        Rt_ = lambda x: [R[0][i] * x[0] + R[1][i] * x[1] + R[2][i] * x[2]
                         for i in range(3)]
        R_ = lambda x: [R[i][0] * x[0] + R[i][1] * x[1] + R[i][2] * x[2]
                        for i in range(3)]

        Rtn = Rt_(n)
        Bse_vh = _matvec3(Bse, vh)
        v = _matvec3(Kse_inv, [Rtn[i] - Bse_vh[i] for i in range(3)])
        v = [v[i] + v_rest[i] for i in range(3)]
        Rtm = Rt_(m)
        Bbt_uh = _matvec3(Bbt, uh)
        u = _matvec3(Kbt_inv, [Rtm[i] - Bbt_uh[i] for i in range(3)])

        vt = [c0 * v[i] + vh[i] for i in range(3)]
        ut = [c0 * u[i] + uh[i] for i in range(3)]
        qt = [c0 * q[i] + yh_j[13 + i:14 + i, :] for i in range(3)]
        wt = [c0 * w[i] + yh_j[16 + i:17 + i, :] for i in range(3)]

        drag = [Cdrag[i] * q[i] * jnp.abs(q[i]) for i in range(3)]
        Rdrag = R_(drag)
        fb = [rhoAg[i] - Rdrag[i] + tf[i] for i in range(3)]

        ps = R_(v)
        wxq = _cross(w, q)
        ns = [rhoA * x - fb[i]
              for i, x in enumerate(R_([wxq[i] + qt[i] for i in range(3)]))]
        rJw = _matvec3(rhoJ, w)
        rJwt = _matvec3(rhoJ, wt)
        wxrJw = _cross(w, rJw)
        Rm = R_([wxrJw[i] + rJwt[i] for i in range(3)])
        psxn = _cross(ps, n)
        ms = [Rm[i] - psxn[i] for i in range(3)]
        uxq = _cross(u, q)
        wxv = _cross(w, v)
        qs = [vt[i] - uxq[i] + wxv[i] for i in range(3)]
        uxw = _cross(u, w)
        ws = [ut[i] - uxw[i] for i in range(3)]
        u1, u2, u3 = u
        hs = [0.5 * (-u1 * h2 - u2 * h3 - u3 * h4),
              0.5 * (u1 * h1 + u3 * h3 - u2 * h4),
              0.5 * (u2 * h1 - u3 * h2 + u1 * h4),
              0.5 * (u3 * h1 + u2 * h2 - u1 * h3)]

        dy = ps + hs + ns + ms + qs + ws
        z = v + u

        if use_nn:
            # input layout per cosserat_ode.py:171-175:
            # [y, z, tf] (28) or [y, yh, z, zh, tf] (53) with history
            if spec.history:
                parts = y + [yh_j] + z + [zh_j] + tf
            else:
                parts = y + z + tf
            x = jnp.concatenate(parts, axis=0)
            for l in range(n_layers):
                w_ref, b_ref = w_refs[2 * l], w_refs[2 * l + 1]
                x = jnp.dot(w_ref[:], x,
                            preferred_element_type=x.dtype) + b_ref[:]
                if l < n_layers - 1:
                    x = act(x)
            dy = [dy[i] + x[i:i + 1, :] for i in range(19)]
            z = [z[i] + x[19 + i:20 + i, :] for i in range(6)]
        return dy, z

    return rhs_rows


def make_sweep_kernel(p: RodParams, spec: MLPSpec | None = None,
                      block_b: int = 256, interpret: bool = False,
                      want_rod: bool = True, method: str = "euler",
                      pipeline: bool | None = None):
    """Build the fused spatial-sweep kernel for a concrete rod (+ optional
    KNODE net). Returns fn(G (B,6), yh (B,N,19), zh (B,N,6), tf (B,3),
    nn_params|None) -> (residual (B,6)[, y (B,N,19), z (B,N-1,6)]).

    method: "euler" (reference parity, cosserat_ode.py:197-201) or "rk4"
    (cosserat_ode.py:222-242 with linear history midpoints, knode.py:80-81
    — the midpoints are computed in-kernel from the node histories).
    pipeline: lowering mode (see module docstring). None picks statically:
    grid pipeline for RK4 or N > 16, static unroll otherwise.
    """
    if method not in ("euler", "rk4"):
        raise ValueError(method)
    N = p.N
    if pipeline is None:
        pipeline = method == "rk4" or N > 16
    f = lambda v: float(np.asarray(v))
    p0 = tuple(float(x) for x in np.asarray(p.p0))
    h0 = tuple(float(x) for x in np.asarray(p.h0))
    q0 = tuple(float(x) for x in np.asarray(p.q0))
    w0 = tuple(float(x) for x in np.asarray(p.w0))
    F_tip = tuple(float(x) for x in np.asarray(p.F_tip))
    M_tip = tuple(float(x) for x in np.asarray(p.M_tip))
    ds = f(p.ds)
    use_nn = spec is not None
    n_layers = len(spec.dims) - 1 if use_nn else 0
    act = _activation_rows(spec.activation) if use_nn else None

    rhs_rows = make_rhs_rows(p, spec)

    def euler_update(y, yh_j, zh_j, tf, w_refs):
        dy, z = rhs_rows(y, yh_j, zh_j, tf, w_refs)
        return [y[i] + ds * dy[i] for i in range(19)], z

    def rk4_update(y, yh_j, zh_j, yh_j1, zh_j1, tf, w_refs):
        yh_m = 0.5 * (yh_j + yh_j1)
        zh_m = 0.5 * (zh_j + zh_j1)
        k1, z = rhs_rows(y, yh_j, zh_j, tf, w_refs)
        y2 = [y[i] + (ds / 2) * k1[i] for i in range(19)]
        k2, _ = rhs_rows(y2, yh_m, zh_m, tf, w_refs)
        y3 = [y[i] + (ds / 2) * k2[i] for i in range(19)]
        k3, _ = rhs_rows(y3, yh_m, zh_m, tf, w_refs)
        y4 = [y[i] + ds * k3[i] for i in range(19)]
        k4, _ = rhs_rows(y4, yh_j1, zh_j1, tf, w_refs)
        return [y[i] + (ds / 6.0) * (k1[i] + 2 * (k2[i] + k3[i]) + k4[i])
                for i in range(19)], z

    def split_weight_refs(refs):
        if not use_nn:
            return refs, None
        return refs[2 * n_layers:], tuple(refs[:2 * n_layers])

    # ------------------------------------------------------------------
    # static-unroll kernel: one grid step per batch block, nodes inlined
    # ------------------------------------------------------------------
    def kernel_unrolled(*refs):
        G_ref, yh_ref, zh_ref, tf_ref, *rest = refs
        rest, w_refs = split_weight_refs(rest)
        if want_rod:
            res_ref, y_ref, z_ref = rest
        else:
            (res_ref,) = rest

        tf = [tf_ref[i:i + 1, :] for i in range(3)]
        TB = G_ref.shape[1]
        dt = G_ref.dtype
        const_row = lambda c: jnp.full((1, TB), c, dt)

        # base node y0 (cosserat_ode.py:194)
        y = ([const_row(p0[i]) for i in range(3)]
             + [const_row(h0[i]) for i in range(4)]
             + [G_ref[i:i + 1, :] for i in range(6)]
             + [const_row(q0[i]) for i in range(3)]
             + [const_row(w0[i]) for i in range(3)])
        if want_rod:
            y_ref[0:19, :] = jnp.concatenate(y, axis=0)

        for j in range(N - 1):  # static unroll
            yh_j = yh_ref[19 * j:19 * (j + 1), :]
            zh_j = zh_ref[6 * j:6 * (j + 1), :]
            if method == "euler":
                y, z = euler_update(y, yh_j, zh_j, tf, w_refs)
            else:
                yh_j1 = yh_ref[19 * (j + 1):19 * (j + 2), :]
                zh_j1 = zh_ref[6 * (j + 1):6 * (j + 2), :]
                y, z = rk4_update(y, yh_j, zh_j, yh_j1, zh_j1, tf, w_refs)
            if want_rod:
                y_ref[19 * (j + 1):19 * (j + 2), :] = jnp.concatenate(y, axis=0)
                z_ref[6 * j:6 * (j + 1), :] = jnp.concatenate(z, axis=0)

        res = [F_tip[i] - y[7 + i] for i in range(3)] + \
              [M_tip[i] - y[10 + i] for i in range(3)]
        res_ref[:] = jnp.concatenate(res, axis=0)

    # ------------------------------------------------------------------
    # grid-pipelined kernel: grid (batch_blocks, N-1); node j's history
    # block is streamed in by the index map; the integrated state is
    # carried across grid steps in VMEM scratch. Compiled once, any N.
    # ------------------------------------------------------------------
    def kernel_pipelined(*refs):
        if method == "rk4":
            G_ref, yh_ref, zh_ref, yh1_ref, zh1_ref, tf_ref, *rest = refs
        else:
            G_ref, yh_ref, zh_ref, tf_ref, *rest = refs
        rest, w_refs = split_weight_refs(rest)
        if want_rod:
            res_ref, y_ref, z_ref, y_sc = rest
        else:
            res_ref, y_sc = rest

        j = pl.program_id(1)
        tf = [tf_ref[i:i + 1, :] for i in range(3)]
        TB = G_ref.shape[1]
        dt = G_ref.dtype
        const_row = lambda c: jnp.full((1, TB), c, dt)

        @pl.when(j == 0)
        def _():
            y0 = ([const_row(p0[i]) for i in range(3)]
                  + [const_row(h0[i]) for i in range(4)]
                  + [G_ref[i:i + 1, :] for i in range(6)]
                  + [const_row(q0[i]) for i in range(3)]
                  + [const_row(w0[i]) for i in range(3)])
            y_sc[:] = jnp.concatenate(y0, axis=0)

        # node slabs are padded to YR/ZR rows so the streamed blocks tile
        # (Mosaic: second-minor block dim must be divisible by 8); the
        # physics only reads the live rows
        y = [y_sc[i:i + 1, :] for i in range(19)]
        if method == "euler":
            y_new, z = euler_update(y, yh_ref[0:19, :], zh_ref[0:6, :],
                                    tf, w_refs)
        else:
            y_new, z = rk4_update(y, yh_ref[0:19, :], zh_ref[0:6, :],
                                  yh1_ref[0:19, :], zh1_ref[0:6, :],
                                  tf, w_refs)
        y_cat = jnp.concatenate(y_new, axis=0)
        y_sc[:] = y_cat
        if want_rod:
            pad = jnp.zeros((_YR - 19, TB), dt)
            y_ref[:] = jnp.concatenate([y_cat, pad], axis=0)  # blk j <-> node j+1
            z_ref[:] = jnp.concatenate(
                z + [jnp.zeros((_ZR - 6, TB), dt)], axis=0)

        @pl.when(j == N - 2)
        def _():
            res = [F_tip[i] - y_new[7 + i] for i in range(3)] + \
                  [M_tip[i] - y_new[10 + i] for i in range(3)]
            res_ref[:] = jnp.concatenate(res, axis=0)

    def _weight_args_specs(nn_params, vmem):
        """Per-layer (dout, din) weight + (dout, 1) bias, replicated over
        the grid."""
        args, specs = [], []
        for l in range(n_layers):
            w = nn_params[l]["w"]                     # (dout, din)
            b = nn_params[l]["b"][:, None]            # (dout, 1)
            for a in (w, b):
                args.append(a)
                specs.append(pl.BlockSpec(
                    a.shape, (lambda i: (0, 0)) if not pipeline
                    else (lambda i, j: (0, 0)), memory_space=vmem))
        return args, specs

    def fwd(G, yh, zh, tf, nn_params=None):
        """G (B,6), yh (B,N,19), zh (B,N,6), tf (B,3) -> outputs (B,...)."""
        B = G.shape[0]
        dt = G.dtype
        TB = block_b
        Bp = ((B + TB - 1) // TB) * TB

        # transpose to state-major (rows = state, lanes = batch)
        Gt = jnp.pad(G, ((0, Bp - B), (0, 0))).T                   # (6, Bp)
        yht = jnp.pad(yh.reshape(B, N * 19), ((0, Bp - B), (0, 0))).T
        zht = jnp.pad(zh.reshape(B, N * 6), ((0, Bp - B), (0, 0))).T
        tft = jnp.pad(tf, ((0, Bp - B), (0, 0))).T                 # (3, Bp)
        vmem = pltpu.VMEM

        if not pipeline:
            bspec = lambda rows: pl.BlockSpec((rows, TB), lambda i: (0, i),
                                              memory_space=vmem)
            in_specs = [bspec(6), bspec(N * 19), bspec(N * 6), bspec(3)]
            args = [Gt, yht, zht, tft]
            if use_nn:
                wargs, wspecs = _weight_args_specs(nn_params, vmem)
                args += wargs
                in_specs += wspecs
            out_shape = [jax.ShapeDtypeStruct((6, Bp), dt)]
            out_specs = [bspec(6)]
            if want_rod:
                out_shape += [jax.ShapeDtypeStruct((N * 19, Bp), dt),
                              jax.ShapeDtypeStruct(((N - 1) * 6, Bp), dt)]
                out_specs += [bspec(N * 19), bspec((N - 1) * 6)]
            outs = pl.pallas_call(
                kernel_unrolled,
                grid=(Bp // TB,),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                interpret=interpret,
            )(*args)
            res = outs[0].T[:B]
            if not want_rod:
                return res
            y_out = outs[1].T[:B].reshape(B, N, 19)
            z_out = outs[2].T[:B].reshape(B, N - 1, 6)
            return res, y_out, z_out

        # --- grid-pipelined path ---
        # per-node slabs padded 19 -> _YR, 6 -> _ZR rows so the streamed
        # blocks satisfy Mosaic's x8 second-minor tiling rule
        yhtp = jnp.pad(yh, ((0, Bp - B), (0, 0), (0, _YR - 19))
                       ).reshape(Bp, N * _YR).T               # (N*_YR, Bp)
        zhtp = jnp.pad(zh, ((0, Bp - B), (0, 0), (0, _ZR - 6))
                       ).reshape(Bp, N * _ZR).T               # (N*_ZR, Bp)
        const_spec = lambda rows: pl.BlockSpec(
            (rows, TB), lambda i, j: (0, i), memory_space=vmem)
        node_spec = lambda rows: pl.BlockSpec(
            (rows, TB), lambda i, j: (j, i), memory_space=vmem)
        node1_spec = lambda rows: pl.BlockSpec(
            (rows, TB), lambda i, j: (j + 1, i), memory_space=vmem)

        in_specs = [const_spec(6), node_spec(_YR), node_spec(_ZR)]
        args = [Gt, yhtp, zhtp]
        if method == "rk4":
            in_specs += [node1_spec(_YR), node1_spec(_ZR)]
            args += [yhtp, zhtp]
        in_specs += [const_spec(3)]
        args += [tft]
        if use_nn:
            wargs, wspecs = _weight_args_specs(nn_params, vmem)
            args += wargs
            in_specs += wspecs

        out_shape = [jax.ShapeDtypeStruct((6, Bp), dt)]
        out_specs = [const_spec(6)]
        if want_rod:
            out_shape += [jax.ShapeDtypeStruct(((N - 1) * _YR, Bp), dt),
                          jax.ShapeDtypeStruct(((N - 1) * _ZR, Bp), dt)]
            out_specs += [node_spec(_YR), node_spec(_ZR)]

        outs = pl.pallas_call(
            kernel_pipelined,
            grid=(Bp // TB, N - 1),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((19, TB), dt)],
            interpret=interpret,
        )(*args)

        res = outs[0].T[:B]
        if not want_rod:
            return res
        # node 0 is the known base state — assemble it host-of-kernel
        base = jnp.concatenate([
            jnp.broadcast_to(jnp.asarray(p0, dt), (B, 3)),
            jnp.broadcast_to(jnp.asarray(h0, dt), (B, 4)),
            G[:, 0:3], G[:, 3:6],
            jnp.broadcast_to(jnp.asarray(q0, dt), (B, 3)),
            jnp.broadcast_to(jnp.asarray(w0, dt), (B, 3)),
        ], axis=1)[:, None, :]                                  # (B, 1, 19)
        y_rest = outs[1].T[:B].reshape(B, N - 1, _YR)[:, :, :19]
        y_out = jnp.concatenate([base, y_rest], axis=1)
        z_out = outs[2].T[:B].reshape(B, N - 1, _ZR)[:, :, :6]
        return res, y_out, z_out

    return fwd
