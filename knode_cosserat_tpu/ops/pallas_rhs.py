"""Pallas TPU kernel: fused batched hybrid Cosserat RHS.

The training hot op evaluates, for B = trajectories x timesteps x keypoints
cells at once, the physics RHS (quat->R, constitutive solve, BDF-2 terms,
body forces, rod derivatives) plus the KNODE MLP residual
(cosserat_ode.py:114-186; both the 28-input and 53-input-history nets,
any layer count). This kernel fuses the
whole evaluation in VMEM: the physics runs structure-of-arrays on the VPU
(each state component is a (TB, 1) lane vector), the MLP matmuls run on the
MXU, and no intermediate ever round-trips HBM. Rod parameters are baked in
as compile-time constants (they are fixed for a training run).

Differentiability: the op carries a jax.custom_vjp whose backward pass is
the VJP of the pure-JAX implementation (core.rhs) — bitwise-equivalent math,
so gradients are exact while the forward uses the fused kernel.

Use ``make_fused_next_segment(p, spec)`` to build the op; it returns a
callable (nn_params, y, yh, zh, tf) -> (y_grown, z) matching
core.spatial.next_segment_euler on flattened (B, .) inputs.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import RodParams
from ..core.rhs import rhs as jax_rhs
from ..models.mlp import MLPSpec, mlp_apply

__all__ = ["make_fused_next_segment"]


def _c3(M):
    """3x3 constant matrix -> nested tuple of python floats."""
    M = np.asarray(M, np.float64)
    return tuple(tuple(float(x) for x in row) for row in M)


def _matvec3(M, x):
    """Constant 3x3 times list of 3 lane-vectors; zeros fold away."""
    out = []
    for i in range(3):
        acc = None
        for j in range(3):
            c = M[i][j]
            if c == 0.0:
                continue
            term = c * x[j]
            acc = term if acc is None else acc + term
        out.append(acc if acc is not None else jnp.zeros_like(x[0]))
    return out


def _cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def make_fused_next_segment(p: RodParams, spec: MLPSpec,
                            block_b: int = 256, interpret: bool = False):
    """Build the fused kernel for a concrete rod + MLP architecture.

    Returned callable: (nn_params, y (B,19), yh (B,19), zh (B,6), tf (B,3))
    -> (y_grown (B,19), z (B,6)), equal to
    y + ds * rhs(...) per next_segment_euler. B is padded to block_b.
    """
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
    ds = f(p.ds)
    n_layers = len(spec.dims) - 1

    def kernel(*refs):
        y_ref, yh_ref, zh_ref, tf_ref = refs[:4]
        w_refs = refs[4:4 + 2 * n_layers]
        yg_ref, z_ref = refs[4 + 2 * n_layers:]
        y = y_ref[:]            # (TB, 19)
        yh = yh_ref[:]
        zh = zh_ref[:]
        tf_in = tf_ref[:]       # (TB, 3)

        col = lambda a, i: a[:, i:i + 1]          # (TB, 1) lane vector
        h = [col(y, 3 + i) for i in range(4)]
        n = [col(y, 7 + i) for i in range(3)]
        m = [col(y, 10 + i) for i in range(3)]
        q = [col(y, 13 + i) for i in range(3)]
        w = [col(y, 16 + i) for i in range(3)]
        vh = [col(zh, i) for i in range(3)]
        uh = [col(zh, 3 + i) for i in range(3)]
        tf = [col(tf_in, i) for i in range(3)]

        # quat -> R (cosserat_ode.py:132-137)
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

        # constitutive solve (cosserat_ode.py:139-142, v_rest form)
        Rtn = Rt_(n)
        Bse_vh = _matvec3(Bse, vh)
        v = _matvec3(Kse_inv, [Rtn[i] - Bse_vh[i] for i in range(3)])
        v = [v[i] + v_rest[i] for i in range(3)]
        Rtm = Rt_(m)
        Bbt_uh = _matvec3(Bbt, uh)
        u = _matvec3(Kbt_inv, [Rtm[i] - Bbt_uh[i] for i in range(3)])

        # BDF-2 time derivatives
        vt = [c0 * v[i] + col(zh, i) for i in range(3)]
        ut = [c0 * u[i] + col(zh, 3 + i) for i in range(3)]
        qt = [c0 * q[i] + col(yh, 13 + i) for i in range(3)]
        wt = [c0 * w[i] + col(yh, 16 + i) for i in range(3)]

        # body force
        drag = [Cdrag[i] * q[i] * jnp.abs(q[i]) for i in range(3)]
        Rdrag = R_(drag)
        fb = [rhoAg[i] - Rdrag[i] + tf[i] for i in range(3)]

        # rod derivatives
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

        ys = jnp.concatenate(ps + hs + ns + ms + qs + ws, axis=1)  # (TB,19)
        z = jnp.concatenate(v + u, axis=1)                          # (TB,6)

        # KNODE MLP residual on the MXU: [y, z, tf] (TB, 28) or the
        # 53-input history variant [y, yh, z, zh, tf]
        # (cosserat_ode.py:171-175)
        if spec.history:
            nn_in = jnp.concatenate([y, yh, z, zh, tf_in], axis=1)
        else:
            nn_in = jnp.concatenate([y, z, tf_in], axis=1)
        out = nn_in
        for l in range(n_layers):
            wt_ref, b_ref = w_refs[2 * l], w_refs[2 * l + 1]
            out = jnp.dot(out, wt_ref[:],
                          preferred_element_type=out.dtype) + b_ref[:]
            if l < n_layers - 1:
                # explicit formulas — Mosaic lacks expm1 (and matches the
                # reference numpy shim exactly, cosserat_ode.py:92-94)
                if spec.activation == "elu":
                    out = jnp.where(out > 0, out, jnp.exp(out) - 1.0)
                elif spec.activation == "tanh":
                    out = jnp.tanh(out)
                elif spec.activation == "relu":
                    out = jnp.maximum(out, 0.0)
                elif spec.activation == "softplus":
                    out = (jnp.log1p(jnp.exp(-jnp.abs(out)))
                           + jnp.maximum(out, 0.0))
                else:
                    raise ValueError(spec.activation)

        ys = ys + out[:, :19]
        z = z + out[:, 19:]
        yg_ref[:] = y + ds * ys
        z_ref[:] = z

    def fwd_impl(nn_params, y, yh, zh, tf):
        B = y.shape[0]
        TB = block_b
        Bp = ((B + TB - 1) // TB) * TB
        pad = lambda a: jnp.pad(a, ((0, Bp - B), (0, 0)))
        yp, yhp, zhp, tfp = pad(y), pad(yh), pad(zh), pad(tf)
        # pad the quaternion norm guard: keep h valid on pad rows
        yp = yp.at[B:, 3].set(1.0)

        grid = (Bp // TB,)
        bspec = lambda d: pl.BlockSpec((TB, d), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
        wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                           memory_space=pltpu.VMEM)
        wargs, wspecs = [], []
        for l in range(n_layers):
            wt = nn_params[l]["w"].T             # (din, dout)
            b = nn_params[l]["b"][None, :]       # (1, dout)
            wargs += [wt, b]
            wspecs += [wspec(wt.shape), wspec(b.shape)]
        yg, z = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bspec(19), bspec(19), bspec(6), bspec(3)] + wspecs,
            out_specs=[bspec(19), bspec(6)],
            out_shape=[jax.ShapeDtypeStruct((Bp, 19), y.dtype),
                       jax.ShapeDtypeStruct((Bp, 6), y.dtype)],
            interpret=interpret,
        )(yp, yhp, zhp, tfp, *wargs)
        return yg[:B], z[:B]

    def jax_impl(nn_params, y, yh, zh, tf):
        nn_fn = lambda x: mlp_apply(spec, nn_params, x)
        dy, z = jax_rhs(p, y, yh, zh, tf, nn_fn, nn_history=spec.history)
        return y + p.ds * dy, z

    @jax.custom_vjp
    def fused(nn_params, y, yh, zh, tf):
        return fwd_impl(nn_params, y, yh, zh, tf)

    def fused_fwd(nn_params, y, yh, zh, tf):
        return fwd_impl(nn_params, y, yh, zh, tf), (nn_params, y, yh, zh, tf)

    def fused_bwd(res, ct):
        nn_params, y, yh, zh, tf = res
        _, vjp = jax.vjp(jax_impl, nn_params, y, yh, zh, tf)
        return vjp(ct)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused
