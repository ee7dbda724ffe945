"""Multi-rod assemblies: parallel continuum robots on TPU.

Several Cosserat rods clamped to a fixed base and rigidly attached to a
common RIGID END PLATE — the standard parallel-continuum-robot topology
(Till & Rucker-style). The reference (hsiehScalAR/KNODE-Cosserat) models a
single rod only; its scalar-loop solvers cannot express the coupled
boundary-value problem. Here the whole assembly solves as ONE Newton
iteration on TPU:

  unknowns  X = [G_1 .. G_M (6 each),  p_plate (3),  h_plate (4)]
  residual  R = [tip position constraints        (3 per rod)
                 tip orientation constraints     (3 per rod)
                 plate Newton (force) balance    (3)
                 plate Euler (moment) balance    (3)
                 plate quaternion unit norm      (1)]

All M rod sweeps integrate simultaneously (``jax.vmap`` over the stacked
rod pytree — the same batching trick as core/multiple_shooting), so the
sequential depth of a residual evaluation is N-1 regardless of M. The
Jacobian is ARROWHEAD-structured (rod blocks + a 7-wide plate border) and
can be assembled from 6 sweep tangents per rod plus cheap algebra
(_assembly_jacobian, ``solver="structured"``) instead of jacfwd's 6M+7
tangents through every sweep (``solver="dense"``). Measured: structured
is 2-3x faster on CPU; dense is faster on TPU at M<=8 (latency-bound,
the extra tangents vectorize for free) — ``solver="auto"`` (default)
picks per backend.

Physics conventions (matching core/rhs, reference cosserat_ode.py:114-186):
  - y[7:10] = n, y[10:13] = m are the WORLD-frame internal force/moment, so
    the single-rod tip BC n(L) = F_tip generalizes to: rod i pushes on the
    plate with (-n_i(L), -m_i(L)) at its attachment point.
  - Tendon tension enters as a distributed body force only (the reference's
    simplification, cosserat_ode.py:150-151) — no tendon point loads are
    applied to the plate.
  - Plate translation/rotation dynamics use the SAME BDF-2 history scheme
    as the rod states: x_t = c0*x + xh with xh = c1*x_prev + c2*x_prev2.

A massless plate with a single rod attached at zero offset reduces exactly
to the free-tip single-rod problem, so ``simulate_assembly`` with M=1
matches core/stepper.simulate_scan to solver tolerance
(tests/test_assembly.py pins it).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .multiple_shooting import _lm_damped_solve, _newton_dense, _newton_loop
from .params import RodParams, _pytree_dataclass, make_rod
from .shooting import NewtonStats
from .spatial import base_state, integrate_euler
from ..ops.quaternion import quat_to_rotmat

__all__ = ["PlateParams", "RodAssembly", "make_ring_assembly", "stack_rods",
           "with_contact_plane", "assembly_solve_step", "assembly_step_carry",
           "AssemblyCarry", "simulate_assembly", "AssemblySimOutput"]


# ------------------------------------------------------------ quaternions

def _quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, [w, x, y, z] convention (matches ops/quaternion)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def _quat_conj(a: jnp.ndarray) -> jnp.ndarray:
    return a * jnp.asarray([1.0, -1.0, -1.0, -1.0], a.dtype)


def _body_angular_velocity(h: jnp.ndarray, hdot: jnp.ndarray) -> jnp.ndarray:
    """omega_body = 2 * vec(conj(h) * hdot) for (near-)unit h."""
    return 2.0 * _quat_mul(_quat_conj(h), hdot)[..., 1:4]


# ------------------------------------------------------------- parameters

@_pytree_dataclass
class PlateParams:
    """Rigid end plate: mass/inertia + per-rod attachment geometry.

    attach_offsets: (M, 3) attachment points in the PLATE body frame,
      relative to the plate center of mass.
    attach_quats: (M, 4) fixed rotation from plate frame to each rod's tip
      frame (identity when rods meet the plate squarely).
    mass/inertia: 0 / zeros(3,3) model a massless coupler (static plate
      equilibrium — the M=1 free-tip reduction).

    Contact (``has_contact=True``): the plate can touch ONE rigid plane
    n . x = c (``contact_plane`` = [n (unit), c]) through ``contact_points``
    (Kc, 3, plate body frame). The model is a SMOOTHED penalty — normal
    force k * softplus(-beta * gap) / beta plus approach-rate damping
    gated by a sigmoid contact indicator — so every coupled Newton solve
    (and its custom_root gradients) stays smooth; beta controls how sharp
    the complementarity corner is. has_contact is STATIC: a contact-free
    assembly compiles exactly the pre-contact program.
    """
    __static_fields__ = ("has_contact",)

    mass: Any
    inertia: Any            # (3, 3), plate body frame
    attach_offsets: Any     # (M, 3)
    attach_quats: Any       # (M, 4)
    g: Any                  # (3,) gravity (world)
    contact_plane: Any = None     # (4,) [n_unit, c] with n . x = c
    contact_points: Any = None    # (Kc, 3) plate body frame
    contact_k: Any = None         # penalty stiffness (N/m per point)
    contact_d: Any = None         # approach-rate damping (N s/m per point)
    contact_beta: Any = None      # smoothing sharpness (1/m)
    has_contact: bool = False

    def replace(self, **kw) -> "PlateParams":
        return dataclasses.replace(self, **kw)


@_pytree_dataclass
class RodAssembly:
    """M rods + the rigid plate coupling them.

    rods: a STACKED RodParams pytree (every array leaf carries a leading M
    axis — see ``stack_rods``); all rods share N, n_tendons and del_t.
    """
    __static_fields__ = ("M",)

    M: int
    rods: RodParams
    plate: PlateParams
    # plate initial pose (consistent with the rods' straight initial state)
    p_plate0: Any           # (3,)
    h_plate0: Any           # (4,)

    def replace(self, **kw) -> "RodAssembly":
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.asarray(self.p_plate0).dtype


def stack_rods(rods: Sequence[RodParams]) -> RodParams:
    """Stack per-rod parameter pytrees along a new leading axis (static
    fields must agree)."""
    r0 = rods[0]
    dt0 = float(np.asarray(r0.del_t))
    for r in rods[1:]:
        if r.N != r0.N or r.n_tendons != r0.n_tendons:
            raise ValueError("all rods in an assembly must share N and "
                             "n_tendons")
        # The coupled step applies rod 0's BDF-2 coefficients (c0/c1/c2)
        # to every rod's history AND the plate; mismatched del_t would
        # converge to a silently inconsistent time discretization.
        if float(np.asarray(r.del_t)) != dt0:
            raise ValueError("all rods in an assembly must share del_t "
                             f"(got {float(np.asarray(r.del_t))} vs {dt0})")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *rods)


def make_ring_assembly(
    n_rods: int = 3,
    base_radius: float = 0.05,
    plate_mass: float = 0.0,
    plate_inertia: Optional[np.ndarray] = None,
    N: int = 10,
    dtype=None,
    rod_fn: Optional[Callable[..., RodParams]] = None,
    **rod_overrides,
) -> RodAssembly:
    """M identical vertical rods on a base circle of ``base_radius``, tips
    attached to a rigid plate at the same radial pattern (the canonical
    parallel-continuum-robot bench geometry).

    rod_fn(N=, dtype=, p0=, **rod_overrides) -> RodParams; defaults to
    core.params.make_rod (the paper rod, cosserat_ode.py:14-47).
    """
    rod_fn = rod_fn or make_rod
    ang = 2.0 * np.pi * np.arange(n_rods) / n_rods
    bases = np.stack([base_radius * np.cos(ang),
                      base_radius * np.sin(ang),
                      np.zeros(n_rods)], axis=-1)
    rods = [rod_fn(N=N, dtype=dtype, p0=bases[i], **rod_overrides)
            for i in range(n_rods)]
    stacked = stack_rods(rods)
    fdtype = stacked.dtype
    L = float(np.asarray(rods[0].L))
    # straight vertical rods: tip_i = base_i + [0, 0, L]; plate center on
    # the axis, attachments = the same radial pattern in the plate frame
    p_plate0 = np.array([0.0, 0.0, L])
    offsets = bases - np.array([0.0, 0.0, 0.0])
    quats = np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (n_rods, 1))
    inertia = (np.zeros((3, 3)) if plate_inertia is None
               else np.asarray(plate_inertia, np.float64))
    cast = lambda x: jnp.asarray(x, fdtype)
    plate = PlateParams(mass=cast(plate_mass), inertia=cast(inertia),
                        attach_offsets=cast(offsets),
                        attach_quats=cast(quats),
                        g=cast(np.asarray(rods[0].g)))
    return RodAssembly(M=n_rods, rods=stacked, plate=plate,
                       p_plate0=cast(p_plate0),
                       h_plate0=cast(np.array([1.0, 0.0, 0.0, 0.0])))


def with_contact_plane(
    asm: RodAssembly,
    normal,
    offset: float,
    points=None,
    k: float = 1e4,
    d: float = 50.0,
    beta: float = 2000.0,
) -> RodAssembly:
    """Attach a rigid contact plane n . x = offset to the assembly's plate.

    points: (Kc, 3) contact points in the PLATE body frame; defaults to
    the rod-attachment ring. k/d: penalty stiffness / approach damping
    per point; beta: smoothing sharpness (1/m) — the complementarity
    corner is rounded over ~1/beta of gap (see PlateParams docstring).
    Returns a new assembly; the original is untouched.
    """
    dtype = asm.dtype
    n = np.asarray(normal, np.float64)
    norm = np.linalg.norm(n)
    if n.shape != (3,) or not np.isfinite(norm) or norm < 1e-12:
        raise ValueError(f"contact plane normal {normal!r} must be a "
                         "finite nonzero 3-vector (a zero normal would "
                         "silently poison the solve with NaNs)")
    n = n / norm
    pts = (asm.plate.attach_offsets if points is None
           else jnp.asarray(points, dtype))
    cast = lambda x: jnp.asarray(x, dtype)
    plate = asm.plate.replace(
        contact_plane=cast(np.concatenate([n, [float(offset)]])),
        contact_points=cast(pts),
        contact_k=cast(k), contact_d=cast(d), contact_beta=cast(beta),
        has_contact=True)
    return asm.replace(plate=plate)


# --------------------------------------------------------------- solver

def _sweep_all(rods: RodParams, G, yh, zh, tf, nn_fn, nn_history,
               nn_spec=None, nn_params=None):
    """All M rod sweeps at once: G (M, 6), yh (M, N, 19), zh (M, N, 6),
    tf (M, 3) -> (y (M, N, 19), z_body (M, N-1, 6)).

    Residual options: ``nn_fn`` applies ONE shared residual to every rod;
    ``nn_spec`` + ``nn_params`` (a params pytree STACKED along a leading M
    axis) give each rod its own weights — e.g. residuals trained per rod
    on coupled data. The per-rod params ride the same vmap as the rod
    parameters."""
    if nn_params is not None:
        from ..models.mlp import mlp_apply

        def one(p_i, G_i, yh_i, zh_i, tf_i, w_i):
            fn = lambda x: mlp_apply(nn_spec, w_i, x)
            return integrate_euler(p_i, G_i, yh_i, zh_i, tf_i, fn,
                                   nn_history)

        return jax.vmap(one)(rods, G, yh, zh, tf, nn_params)
    return jax.vmap(
        lambda p_i, G_i, yh_i, zh_i, tf_i: integrate_euler(
            p_i, G_i, yh_i, zh_i, tf_i, nn_fn, nn_history)
    )(rods, G, yh, zh, tf)


def _residual_algebra(asm: RodAssembly, tips, plate7, pph, vph, hph, wbh):
    """Residual (6M + 7,) as pure ALGEBRA of the sweep outputs: tips
    (M, 13) = tip [p, h_raw, n, m] per rod, plate7 = [pp, hp]. All the
    rod physics is behind ``tips``; everything here is cheap (no sweep),
    which is what makes the structured Jacobian pay (see
    _assembly_jacobian)."""
    M = asm.M
    plate = asm.plate
    c0 = asm.rods.c0[0]
    pp = plate7[:3]
    hp = plate7[3:]
    n_tip = tips[:, 7:10]
    m_tip = tips[:, 10:13]

    Rp = quat_to_rotmat(hp)                     # plate world-from-body
    att_w = jnp.einsum("ij,mj->mi", Rp, plate.attach_offsets)

    # tip position: rod tip must sit at its plate attachment point
    res_pos = (tips[:, 0:3] - (pp[None, :] + att_w)).reshape(-1)

    # tip orientation: h_tip ~ hp * attach_quat (vector part of the
    # relative quaternion; tips stay in the warm-started hemisphere)
    h_tip = tips[:, 3:7]
    h_tip = h_tip / jnp.linalg.norm(h_tip, axis=-1, keepdims=True)
    h_target = _quat_mul(jnp.broadcast_to(hp, (M, 4)), plate.attach_quats)
    res_ori = _quat_mul(_quat_conj(h_target), h_tip)[:, 1:4].reshape(-1)

    # plate BDF-2 kinematics: velocity from pose, acceleration from velocity
    vp = c0 * pp + pph
    ap = c0 * vp + vph
    hdot = c0 * hp + hph
    wb = _body_angular_velocity(hp, hdot)
    wbdot = c0 * wb + wbh

    # smoothed plane contact (see PlateParams docstring): a penalty normal
    # force + sigmoid-gated approach damping at each contact point. The
    # BDF-2 vp/wb of the NEW step feed the damping, so contact is solved
    # implicitly with everything else (no splitting, no restitution hacks).
    f_contact = jnp.zeros(3, pp.dtype)
    tau_contact = jnp.zeros(3, pp.dtype)
    if plate.has_contact:
        n = plate.contact_plane[:3]
        off = plate.contact_plane[3]
        beta = plate.contact_beta
        r_w = jnp.einsum("ij,kj->ki", Rp, plate.contact_points)  # (Kc, 3)
        gap = (pp[None, :] + r_w) @ n - off                      # (Kc,)
        pen = jax.nn.softplus(-beta * gap) / beta                # ~max(0,-g)
        act = jax.nn.sigmoid(-beta * gap)                        # in-contact
        w_world = Rp @ wb
        v_pt = vp[None, :] + jnp.cross(w_world[None, :], r_w)
        gdot = v_pt @ n
        fmag = (plate.contact_k * pen
                + plate.contact_d * act * jax.nn.relu(-gdot))
        f_i = fmag[:, None] * n[None, :]
        f_contact = jnp.sum(f_i, axis=0)
        tau_contact = jnp.sum(jnp.cross(r_w, f_i), axis=0)

    # Newton: m*(ap - g) = sum of rod reactions (-n_tip) + contact;
    # massless -> static
    res_f = (plate.mass * (ap - plate.g) + jnp.sum(n_tip, axis=0)
             - f_contact)
    # Euler (plate body frame): J wbdot + wb x J wb = Rp^T * sum of world
    # torques about the plate COM from the rod reactions + contact
    torque_w = (jnp.sum(jnp.cross(att_w, -n_tip) - m_tip, axis=0)
                + tau_contact)
    Jw = plate.inertia @ wb
    res_m = plate.inertia @ wbdot + jnp.cross(wb, Jw) - Rp.T @ torque_w

    res_norm = jnp.sum(hp * hp) - 1.0
    return jnp.concatenate([res_pos, res_ori, res_f, res_m,
                            res_norm[None]])


def _assembly_residual(asm: RodAssembly, X, yh, zh, tf, pph, vph, hph, wbh,
                       nn_fn, nn_history, nn_spec=None, nn_params=None):
    """Stacked residual (6M + 7,). pph/vph/hph/wbh are the BDF-2 history
    combinations c1*x + c2*x_prev of the plate pose, velocity, quaternion
    and body angular velocity."""
    M = asm.M
    G = X[: 6 * M].reshape(M, 6)
    y_nodes, _ = _sweep_all(asm.rods, G, yh, zh, tf, nn_fn, nn_history,
                            nn_spec, nn_params)
    return _residual_algebra(asm, y_nodes[:, -1, :13], X[6 * M:],
                             pph, vph, hph, wbh)


def _tip_jacobians(asm: RodAssembly, G, yh, zh, tf, nn_fn, nn_history,
                   nn_spec=None, nn_params=None):
    """Per-rod tip Jacobians T_i = d tip_i / d G_i, the ONLY expensive part
    of the coupled Jacobian: tip_i depends on G_i alone (the sweep is
    rod-local), so 6 vmapped tangents replace the dense path's (6M + 7)
    tangents through every sweep. Returns (T (M, 13, 6), tips (M, 13))."""
    from ..models.mlp import mlp_apply

    def one(p_i, G_i, yh_i, zh_i, tf_i, w_i):
        if nn_params is not None:
            fn = lambda x: mlp_apply(nn_spec, w_i, x)
        else:
            fn = nn_fn

        def tip(g):
            y, _ = integrate_euler(p_i, g, yh_i, zh_i, tf_i, fn, nn_history)
            t = y[-1, :13]
            return t, t

        return jax.jacfwd(tip, has_aux=True)(G_i)

    w_axis = jax.tree.map(lambda _: 0, nn_params) if nn_params is not None \
        else None
    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, w_axis))(
        asm.rods, G, yh, zh, tf, nn_params)


def _assembly_jacobian(asm: RodAssembly, X, yh, zh, tf, pph, vph, hph, wbh,
                       nn_fn, nn_history, nn_spec=None, nn_params=None):
    """STRUCTURED (6M+7)^2 Jacobian + residual in one pass.

    The coupled Jacobian is an arrowhead: rod constraints see only their
    own G_i (through the sweep) plus the 7 plate variables (algebraically);
    the plate balance rows see every tip. Chain rule splits it as

        J[:, G_i]   = (d R / d tips_i) @ T_i        (T_i from _tip_jacobians)
        J[:, plate] = d R / d plate7                 (cheap algebra)

    so the sweeps carry 6 forward tangents instead of 6M+7 — the assembly
    analogue of multiple_shooting._structured_direction (there the
    structure is block-bidiagonal in space; here block-diagonal across
    rods with a plate border)."""
    M = asm.M
    G = X[: 6 * M].reshape(M, 6)
    plate7 = X[6 * M:]
    T, tips = _tip_jacobians(asm, G, yh, zh, tf, nn_fn, nn_history,
                             nn_spec, nn_params)

    alg = lambda t, q: _residual_algebra(asm, t, q, pph, vph, hph, wbh)
    Jt, Jq = jax.jacfwd(alg, argnums=(0, 1))(tips, plate7)
    r = alg(tips, plate7)
    # J columns for G: (R, M, 13) x (M, 13, 6) -> (R, M, 6), rod-major
    JG = jnp.einsum("rmt,mtg->rmg", Jt, T).reshape(-1, 6 * M)
    return jnp.concatenate([JG, Jq], axis=1), r


def _newton_structured(residual_fn, jac_fn, X0, tol, max_iter, **kw):
    """The shared multiple_shooting._newton_loop (vmapped line search + LM
    stall escalation, identical stats semantics) with (J, r) from the
    structured assembly ``jac_fn`` instead of jacfwd through the full
    residual."""
    eye = jnp.eye(X0.shape[-1], dtype=X0.dtype)

    def direction(X, r, lam):
        J, _ = jac_fn(X)
        return _lm_damped_solve(J, r, lam, eye)

    return _newton_loop(residual_fn, direction, X0, tol, max_iter, **kw)


def _implicit_root_dense(residual_fn, X0, tol, max_iter, jac_fn=None):
    """lax.custom_root around the Newton solve: gradients of the SOLVED
    coupled step flow via the implicit function theorem (the assembly
    analogue of core/shooting.implicit_root, with an LU tangent solve for
    the (6M+7)-dim system). jac_fn (optional) supplies the structured
    (J, r) assembly for the forward Newton iterations."""
    def solve(f, x0):
        if jac_fn is not None:
            X, _ = _newton_structured(f, jac_fn, x0, tol=tol,
                                      max_iter=max_iter)
        else:
            X, _ = _newton_dense(f, x0, tol=tol, max_iter=max_iter)
        return X

    def tangent_solve(g, y):
        J = jax.jacobian(g)(jnp.zeros_like(y))
        return jnp.linalg.solve(J, y)

    return lax.custom_root(residual_fn, X0, solve, tangent_solve)


def assembly_solve_step(asm: RodAssembly, yh, zh, tf, X0, pph, vph, hph,
                        wbh, nn_fn=None, nn_history: bool = False,
                        tol: float = 1e-10, max_iter: int = 50,
                        differentiable: bool = False,
                        nn_spec=None, nn_params=None,
                        solver: str = "auto"):
    """Solve one BDF-2 time step of the coupled assembly.

    Args:
      yh/zh: (M, N, 19)/(M, N, 6) BDF-2 histories; tf: (M, 3) tendon body
        forces; X0: (6M + 7,) warm start; pph/vph/hph/wbh: plate histories.
      differentiable: route the solve through lax.custom_root so gradients
        w.r.t. tensions / rod params / NN weights flow via the implicit
        function theorem — enables MPC on parallel continuum robots.
      solver: "structured" assembles the arrowhead Jacobian from 6 sweep
        tangents + cheap algebra (see _assembly_jacobian); "dense" jacfwds
        the full residual (6M+7 tangents through every sweep). "auto"
        (default) picks by backend from measurement: structured is 2-3x
        on CPU (tangent work dominates) but SLOWER on TPU at M<=8 (the
        solve is latency-bound there and dense's tangents vectorize onto
        the VPU for free, while the split tips->algebra Jacobian lengthens
        the critical path) — so auto = structured on cpu, dense otherwise.
    Returns (y (M, N, 19), z_body (M, N-1, 6), X, stats).
    """
    if solver == "auto":
        solver = "structured" if jax.default_backend() == "cpu" else "dense"
    if solver not in ("structured", "dense"):
        raise ValueError(f"unknown assembly solver {solver!r}")
    res = partial(_assembly_residual, asm, yh=yh, zh=zh, tf=tf, pph=pph,
                  vph=vph, hph=hph, wbh=wbh, nn_fn=nn_fn,
                  nn_history=nn_history, nn_spec=nn_spec,
                  nn_params=nn_params)
    jac = partial(_assembly_jacobian, asm, yh=yh, zh=zh, tf=tf, pph=pph,
                  vph=vph, hph=hph, wbh=wbh, nn_fn=nn_fn,
                  nn_history=nn_history, nn_spec=nn_spec,
                  nn_params=nn_params) if solver == "structured" else None
    if differentiable:
        X = _implicit_root_dense(res, X0, tol=tol, max_iter=max_iter,
                                 jac_fn=jac)
        r = res(jax.lax.stop_gradient(X))
        r2 = jnp.sum(r * r)
        # custom_root hides the iteration count; converged is derived from
        # the actual residual so a stalled solve reports honestly
        # (iterations stays 0 = unavailable under the implicit path)
        stats = NewtonStats(jnp.array(0, jnp.int32), jnp.sqrt(r2),
                            r2 <= tol, jnp.array(0, jnp.int32))
    elif jac is not None:
        X, stats = _newton_structured(res, jac, X0, tol=tol,
                                      max_iter=max_iter)
    else:
        X, stats = _newton_dense(res, X0, tol=tol, max_iter=max_iter)
    M = asm.M
    G = X[: 6 * M].reshape(M, 6)
    y, z_body = _sweep_all(asm.rods, G, yh, zh, tf, nn_fn, nn_history,
                           nn_spec, nn_params)
    return y, z_body, X, stats


class AssemblySimOutput(NamedTuple):
    traj: jnp.ndarray           # (T, M, N, 50) [y, z, yh, zh] per rod
    plate_pose: jnp.ndarray     # (T, 7) [p_plate, h_plate]
    Gs: jnp.ndarray             # (T, M, 6) converged base reactions
    newton_iters: jnp.ndarray   # (T,)
    residual_norm: jnp.ndarray  # (T,)


def _initial_rod_states(asm: RodAssembly):
    """Straight vertical rods from their bases (base_state-consistent,
    unlike stepper.initial_state which pins the base at the origin)."""
    rods = asm.rods
    N = rods.N
    dtype = asm.dtype
    M = asm.M

    def one(p0, L):
        zpos = jnp.linspace(jnp.zeros((), dtype), L, N)
        y = jnp.zeros((N, 19), dtype)
        y = y.at[:, 0].set(p0[0]).at[:, 1].set(p0[1])
        y = y.at[:, 2].set(p0[2] + zpos)
        y = y.at[:, 3].set(1.0)
        z = jnp.zeros((N, 6), dtype).at[:, 2].set(1.0)
        return y, z

    return jax.vmap(one)(rods.p0, rods.L)


class AssemblyCarry(NamedTuple):
    """BDF-2 carry of the coupled assembly (the scan state of
    simulate_assembly; also the moving-horizon state for MPC)."""
    y: jnp.ndarray          # (M, N, 19)
    z: jnp.ndarray          # (M, N, 6)
    y_prev: jnp.ndarray
    z_prev: jnp.ndarray
    G: jnp.ndarray          # (M, 6)
    G_prev: jnp.ndarray
    pp: jnp.ndarray         # (3,) plate position
    pp_prev: jnp.ndarray
    hp: jnp.ndarray         # (4,) plate quaternion
    hp_prev: jnp.ndarray
    vp: jnp.ndarray         # (3,) plate velocity (world)
    vp_prev: jnp.ndarray
    wb: jnp.ndarray         # (3,) plate angular velocity (body)
    wb_prev: jnp.ndarray

    @staticmethod
    def initial(asm: "RodAssembly") -> "AssemblyCarry":
        dtype = asm.dtype
        y0, z0 = _initial_rod_states(asm)
        G0 = jnp.zeros((asm.M, 6), dtype)
        pp0 = jnp.asarray(asm.p_plate0, dtype)
        hp0 = jnp.asarray(asm.h_plate0, dtype)
        v0 = jnp.zeros(3, dtype)
        return AssemblyCarry(y0, z0, y0, z0, G0, G0,
                             pp0, pp0, hp0, hp0, v0, v0, v0, v0)


def assembly_step_carry(asm: RodAssembly, carry: AssemblyCarry, tensions,
                        nn_fn=None, nn_history: bool = False,
                        tol: float = 1e-10, max_iter: int = 50,
                        differentiable: bool = False, nn_spec=None,
                        nn_params=None, solver: str = "auto",
                        solve_fn=None):
    """One coupled BDF-2 step from an arbitrary carry — the building block
    of simulate_assembly's scan and of moving-horizon planning. tensions:
    (M, n_tendons). Returns (carry', record (M, N, 50), plate_pose (7,),
    G (M, 6), stats).

    solve_fn: optional replacement for the XLA Newton solve — e.g. the
    fused mega-kernel (ops/pallas_assembly.make_assembly_step_kernel);
    signature (X0, yh, zh, tf, pph, vph, hph, wbh) -> (X, y, z_body, r2,
    iters). `differentiable` IS honored with solve_fn (hybrid IFT solve
    below); `solver` is not. The fused kernel knows nothing about the
    NN residual, so combining solve_fn with nn_fn/nn_params would make
    custom_root differentiate an NN-augmented residual at an NN-free
    root (res(X) != 0 -> silently wrong cotangents) — rejected here."""
    if solve_fn is not None and (nn_fn is not None
                                 or nn_params is not None):
        raise ValueError(
            "solve_fn (fused kernel) cannot be combined with nn_fn/"
            "nn_params: the kernel solves the physics-only residual, so "
            "hybrid-KNODE assemblies must use the XLA path "
            "(solve_fn=None / fused=False).")
    rods = asm.rods
    M = asm.M
    dtype = asm.dtype
    c0 = rods.c0[0]
    c1 = rods.c1[0]
    c2 = rods.c2[0]
    (y, z, y_prev, z_prev, G, G_prev,
     pp, pp_prev, hp, hp_prev, vp, vp_prev, wb, wb_prev) = carry
    yh = c1 * y + c2 * y_prev
    zh = c1 * z + c2 * z_prev
    pph = c1 * pp + c2 * pp_prev
    hph = c1 * hp + c2 * hp_prev
    vph = c1 * vp + c2 * vp_prev
    wbh = c1 * wb + c2 * wb_prev
    tf = jnp.einsum("mt,mtc->mc", jnp.asarray(tensions, dtype),
                    jnp.asarray(rods.tendon_dirs, dtype),
                    precision=lax.Precision.HIGHEST)
    X0 = jnp.concatenate([(2.0 * G - G_prev).reshape(-1), pp, hp])
    if solve_fn is not None and differentiable:
        # hybrid implicit solve: the fused mega-kernel produces the ROOT
        # (forward pass), the implicit function theorem produces the
        # gradients through the XLA residual's Jacobian at that root —
        # fused forward speed with the exact custom_root cotangents the
        # pure-XLA path has (MPC planning's per-step structure)
        res = partial(_assembly_residual, asm, yh=yh, zh=zh, tf=tf,
                      pph=pph, vph=vph, hph=hph, wbh=wbh, nn_fn=nn_fn,
                      nn_history=nn_history, nn_spec=nn_spec,
                      nn_params=nn_params)

        def fwd_solve(f, x0):
            return solve_fn(x0, yh, zh, tf, pph, vph, hph, wbh)[0]

        def tangent_solve(g, y_t):
            J = jax.jacobian(g)(jnp.zeros_like(y_t))
            return jnp.linalg.solve(J, y_t)

        X = lax.custom_root(res, X0, fwd_solve, tangent_solve)
        y_new, z_body = _sweep_all(asm.rods, X[: 6 * asm.M].reshape(
            asm.M, 6), yh, zh, tf, nn_fn, nn_history, nn_spec, nn_params)
        r = res(jax.lax.stop_gradient(X))
        r2 = jnp.sum(r * r)
        stats = NewtonStats(jnp.array(0, jnp.int32), jnp.sqrt(r2),
                            r2 <= tol, jnp.array(0, jnp.int32))
    elif solve_fn is not None:
        X, y_new, z_body, r2, iters = solve_fn(X0, yh, zh, tf, pph, vph,
                                               hph, wbh)
        stats = NewtonStats(iters, jnp.sqrt(r2), r2 <= tol,
                            jnp.array(0, jnp.int32))
    else:
        y_new, z_body, X, stats = assembly_solve_step(
            asm, yh, zh, tf, X0, pph, vph, hph, wbh, nn_fn, nn_history,
            tol, max_iter, differentiable=differentiable,
            nn_spec=nn_spec, nn_params=nn_params, solver=solver)
    G_new = X[: 6 * M].reshape(M, 6)
    pp_new = X[6 * M: 6 * M + 3]
    hp_new = X[6 * M + 3:]
    hp_new = hp_new / jnp.linalg.norm(hp_new)
    z_new = jnp.concatenate([z_body, z[:, -1:]], axis=1)
    vp_new = c0 * pp_new + pph
    hdot = c0 * hp_new + hph
    wb_new = _body_angular_velocity(hp_new, hdot)
    record = jnp.concatenate([y_new, z_new, yh, zh], axis=-1)
    new_carry = AssemblyCarry(y_new, z_new, y, z, G_new, G,
                              pp_new, pp, hp_new, hp, vp_new, vp,
                              wb_new, wb)
    return (new_carry, record, jnp.concatenate([pp_new, hp_new]), G_new,
            stats)


def simulate_assembly(
    asm: RodAssembly,
    controls: jnp.ndarray,
    nn_fn: Optional[Callable] = None,
    nn_history: bool = False,
    tol: Optional[float] = None,
    max_iter: int = 50,
    differentiable: bool = False,
    remat: bool = False,
    nn_spec=None,
    nn_params=None,
    solver: str = "auto",
    fused: bool | str = False,
) -> AssemblySimOutput:
    """Closed-loop BDF-2 rollout of the coupled assembly.

    controls: (T, M, n_tendons) per-rod tendon tensions. The trajectory
    record keeps the single-rod contract per rod ([y, z, yh, zh] with the
    tip z frozen), so evaluation/visualization utilities apply per rod.

    differentiable=True makes the WHOLE rollout differentiable w.r.t.
    controls / rod params / plate params / NN weights (implicit function
    theorem at every coupled solve) — gradient-based tension planning for
    parallel continuum robots. remat=True checkpoints each time step.

    Residuals: nn_fn applies one shared KNODE residual to every rod;
    nn_spec + nn_params (stacked along a leading M axis) give each rod
    its OWN weights — e.g. per-rod residuals trained on coupled data
    (tests/test_assembly.py::test_train_knode_on_assembly_data produces
    exactly such weights).

    fused=True runs every coupled Newton solve inside ONE Pallas
    mega-kernel launch (ops/pallas_assembly) — the single-assembly
    latency path (measured 14x the XLA path's marginal rate on chip at
    M=3, N=10). Requires no NN and no contact; same trajectory to solver
    tolerance (tests/test_assembly_fused.py). Composes with
    differentiable=True: the kernel solves each root, custom_root's
    implicit function theorem supplies the gradients (fused-forward MPC).
    fused="interpret" runs the kernel in interpreter mode (CPU tests).
    """
    if tol is None:
        tol = 1e-16 if jnp.dtype(asm.dtype) == jnp.float64 else 1e-10

    solve_fn = None
    if fused:
        if nn_fn is not None or nn_params is not None:
            raise NotImplementedError("fused=True does not support KNODE "
                                      "residuals yet; use fused=False")
        # differentiable=True composes: the kernel solves the root, the
        # implicit function theorem supplies gradients (see
        # assembly_step_carry's hybrid custom_root branch)
        from ..ops.pallas_assembly import make_assembly_step_kernel
        solve_fn = make_assembly_step_kernel(
            asm, tol=tol, max_iter=max_iter,
            interpret=(fused == "interpret"))

    def step(carry, tensions):
        new_carry, record, plate7, G_new, stats = assembly_step_carry(
            asm, carry, tensions, nn_fn, nn_history, tol, max_iter,
            differentiable=differentiable, nn_spec=nn_spec,
            nn_params=nn_params, solver=solver, solve_fn=solve_fn)
        return new_carry, (record, plate7, G_new, stats.iterations,
                           stats.residual_norm)

    T = controls.shape[0]
    carry0 = AssemblyCarry.initial(asm)
    body = jax.checkpoint(step) if remat else step
    _, (records, plates, Gs, iters, res) = lax.scan(body, carry0,
                                                    controls[: T - 1])

    rec0 = jnp.concatenate([carry0.y, carry0.z, carry0.y, carry0.z],
                           axis=-1)[None]
    traj = jnp.concatenate([rec0, records], axis=0)
    plate0 = jnp.concatenate([carry0.pp, carry0.hp])[None]
    plate_pose = jnp.concatenate([plate0, plates], axis=0)
    Gs = jnp.concatenate([carry0.G[None], Gs], axis=0)
    iters = jnp.concatenate([jnp.zeros(1, iters.dtype), iters])
    res = jnp.concatenate([jnp.zeros(1, res.dtype), res])
    return AssemblySimOutput(traj, plate_pose, Gs, iters, res)
