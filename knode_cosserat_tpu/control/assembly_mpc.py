"""Gradient-based MPC over a multi-rod assembly: plate-pose tracking.

The single-rod planner (control/mpc.py) steers a tip point; a parallel
continuum robot is steered by its rigid END PLATE — a full 6-DoF pose.
This module plans per-rod tendon-tension schedules u (H, M, n_tendons)
that track a plate position (and optionally orientation) trajectory:

  plan:  u* = argmin_u  mean ||p_plate_t(u) - p_target_t||^2
                        + w_ori * mean d_quat(h_plate_t(u), h_target_t)^2
                        + w_du  * mean ||u_t - u_{t-1}||^2
         s.t. u in [u_min, u_max]   (sigmoid reparam)

Every horizon step is one coupled assembly solve (core/assembly.
assembly_step_carry) run with ``differentiable=True``, so gradients flow
through the (6M+7)-dim implicit Newton solve by the implicit function
theorem — the whole Adam optimization is ONE jitted program, exactly the
structure of make_planner but over the coupled plant.

The orientation error uses the vector part of h_target^-1 * h_plate
(small-angle ~ half the rotation-vector error), which is smooth and
sign-corrected so antipodal quaternions cost zero.

No reference counterpart: hsiehScalAR/KNODE-Cosserat has neither
assemblies nor planning (its rollouts go through scipy fsolve, which
blocks gradients).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.assembly import (AssemblyCarry, RodAssembly, _quat_conj,
                             _quat_mul, assembly_step_carry)

__all__ = ["AssemblyPlanResult", "rollout_plate", "make_assembly_planner",
           "make_multistart_assembly_planner", "AssemblyMPCController"]


class AssemblyPlanResult(NamedTuple):
    tensions: jnp.ndarray      # (H, M, n_tendons) optimized schedule
    logits: jnp.ndarray        # (H, M, n_tendons) reparam warm start
    cost: jnp.ndarray          # scalar final cost
    cost_history: jnp.ndarray  # (opt_iters,)
    plate_poses: jnp.ndarray   # (H, 7) predicted [p, h] under tensions


def rollout_plate(asm: RodAssembly, carry: AssemblyCarry, tensions,
                  nn_fn=None, nn_history: bool = False,
                  nn_spec=None, nn_params=None,
                  tol: float = 1e-8, max_iter: int = 30, solve_fn=None):
    """Differentiable H-step assembly rollout from ``carry`` under a
    (H, M, n_tendons) tension schedule; returns (plate poses (H, 7),
    final AssemblyCarry). Gradients w.r.t. tensions / NN weights flow
    through every coupled implicit solve.

    solve_fn: optional fused forward solver (the mega-kernel from
    ops/pallas_assembly.make_assembly_step_kernel) — roots come from one
    Pallas launch per step, gradients still via the implicit function
    theorem (assembly_step_carry's hybrid branch)."""
    def step(c, u):
        nxt, _, plate7, _, _ = assembly_step_carry(
            asm, c, u, nn_fn, nn_history, tol, max_iter,
            differentiable=True, nn_spec=nn_spec, nn_params=nn_params,
            solve_fn=solve_fn)
        return nxt, plate7

    final, plates = jax.lax.scan(step, carry,
                                 jnp.asarray(tensions, asm.dtype))
    return plates, final


def _quat_err(h: jnp.ndarray, h_target: jnp.ndarray) -> jnp.ndarray:
    """Vector part of h_target^-1 * h, sign-corrected (antipode-safe);
    ~ rotvec/2 for small errors. Shapes (..., 4) -> (..., 3)."""
    rel = _quat_mul(_quat_conj(h_target), h)
    # where(>=0) not sign(): sign(0) = 0 would zero the error (and its
    # gradient) at exactly 180 deg — the maximally wrong orientation.
    flip = jnp.where(rel[..., 0:1] >= 0, 1.0, -1.0).astype(rel.dtype)
    return rel[..., 1:4] * flip


def make_assembly_planner(
    asm: RodAssembly,
    horizon: int,
    nn_spec=None,
    opt_iters: int = 40,
    opt_lr: float = 0.4,
    u_min: float = 0.0,
    u_max: float = 20.0,
    w_du: float = 1e-4,
    w_ori: float = 0.0,
    tol: float = 1e-8,
    max_iter: int = 30,
    fused: bool | str = False,
) -> Callable[..., AssemblyPlanResult]:
    """Build the jitted assembly plan function.

    Returns ``plan(carry, target_pos, target_quat=None, logits_init=None,
    nn_params=None, u_last=None)`` -> AssemblyPlanResult.
      target_pos:  (horizon, 3) plate positions to track.
      target_quat: (horizon, 4) plate orientations (used when w_ori > 0;
        pass None to track position only).
      nn_params: per-rod KNODE weights stacked along a leading M axis
        (pairs with ``nn_spec``), as produced by training on per-rod
        assembly data.
      fused: solve every horizon step's root with the Pallas mega-kernel
        (ops/pallas_assembly; 14x marginal forward speed on chip) while
        gradients keep flowing through custom_root's implicit function
        theorem. Physics-only planning (nn_spec must be None).
    """
    span = float(u_max) - float(u_min)
    lo = float(u_min)
    M = asm.M
    n_t = int(asm.rods.n_tendons)
    solve_fn = None
    if fused:
        if nn_spec is not None:
            raise NotImplementedError("fused planning does not support "
                                      "KNODE residuals yet")
        from ..ops.pallas_assembly import make_assembly_step_kernel
        solve_fn = make_assembly_step_kernel(
            asm, tol=tol, max_iter=max_iter,
            interpret=(fused == "interpret"))

    def to_u(logits):
        return lo + span * jax.nn.sigmoid(logits)

    def cost_fn(logits, carry, target_pos, target_quat, nn_params, u_last):
        u = to_u(logits)
        plates, _ = rollout_plate(asm, carry, u, nn_spec=nn_spec,
                                  nn_params=nn_params, tol=tol,
                                  max_iter=max_iter, solve_fn=solve_fn)
        track = jnp.mean(jnp.sum((plates[:, :3] - target_pos) ** 2,
                                 axis=-1))
        if w_ori > 0.0:
            e = _quat_err(plates[:, 3:7], target_quat)
            track = track + w_ori * jnp.mean(jnp.sum(e * e, axis=-1))
        du = jnp.diff(jnp.concatenate([u_last[None], u], axis=0), axis=0)
        return track + w_du * jnp.mean(jnp.sum(du * du, axis=(-2, -1)))

    optimizer = optax.adam(opt_lr)

    @jax.jit
    def plan(carry: AssemblyCarry, target_pos, target_quat=None,
             logits_init=None, nn_params=None,
             u_last=None) -> AssemblyPlanResult:
        target_pos = jnp.asarray(target_pos, asm.dtype)
        if target_quat is None:
            target_quat = jnp.broadcast_to(
                jnp.asarray([1.0, 0.0, 0.0, 0.0], asm.dtype), (horizon, 4))
        else:
            target_quat = jnp.asarray(target_quat, asm.dtype)
        if logits_init is None:
            logits_init = jnp.zeros((horizon, M, n_t), asm.dtype)
        if u_last is None:
            u_last = to_u(logits_init[0])
        opt_state = optimizer.init(logits_init)

        def body(c, _):
            logits, opt_state = c
            cost, g = jax.value_and_grad(cost_fn)(
                logits, carry, target_pos, target_quat, nn_params, u_last)
            updates, opt_state = optimizer.update(g, opt_state, logits)
            logits = optax.apply_updates(logits, updates)
            return (logits, opt_state), cost

        (logits, _), costs = jax.lax.scan(body, (logits_init, opt_state),
                                          None, length=opt_iters)
        u = to_u(logits)
        plates, _ = rollout_plate(asm, carry, u, nn_spec=nn_spec,
                                  nn_params=nn_params, tol=tol,
                                  max_iter=max_iter, solve_fn=solve_fn)
        final_cost = cost_fn(logits, carry, target_pos, target_quat,
                             nn_params, u_last)
        return AssemblyPlanResult(u, logits, final_cost, costs, plates)

    return plan


def make_multistart_assembly_planner(asm: RodAssembly, horizon: int,
                                     nn_spec=None, restarts: int = 8,
                                     init_scale: float = 2.0,
                                     **kw) -> Callable[..., AssemblyPlanResult]:
    """Multi-start variant of make_assembly_planner (the assembly analogue
    of control/mpc.make_multistart_planner): ``restarts`` independent Adam
    descents from randomized logit inits run as ONE vmapped program —
    exactly the batched-coupled-solve workload that pays 29x on TPU
    (docs/BENCHMARKS.md "Batched assemblies") — and the best final cost
    wins. Restart 0 seeds from ``logits_init`` (the receding-horizon warm
    start), so the result can never be worse than the single plan.

    Returns ``plan(carry, target_pos, key, target_quat=None,
    logits_init=None, nn_params=None, u_last=None)``.
    """
    single = make_assembly_planner(asm, horizon, nn_spec, **kw)
    M = asm.M
    n_t = int(asm.rods.n_tendons)

    @jax.jit
    def plan(carry: AssemblyCarry, target_pos, key, target_quat=None,
             logits_init=None, nn_params=None,
             u_last=None) -> AssemblyPlanResult:
        if logits_init is None:
            logits_init = jnp.zeros((horizon, M, n_t), asm.dtype)
        noise = init_scale * jax.random.normal(
            key, (restarts - 1, horizon, M, n_t), asm.dtype)
        inits = jnp.concatenate([logits_init[None],
                                 logits_init[None] + noise], axis=0)
        results = jax.vmap(
            lambda li: single(carry, target_pos, target_quat, li,
                              nn_params, u_last)
        )(inits)
        best = jnp.argmin(results.cost)
        return jax.tree.map(lambda x: x[best], results)

    return plan


class AssemblyMPCController:
    """Receding-horizon plate-pose controller over the coupled assembly.

    Mirrors control/mpc.MPCController: each ``act`` plans ``horizon``
    steps from the CURRENT assembly carry, applies the first (M,
    n_tendons) tension matrix to the internal model, and shifts the
    optimized logits for the next call's warm start.
    """

    def __init__(self, asm: RodAssembly, horizon: int = 8,
                 nn_spec=None, nn_params=None,
                 replan_iters: int = 20, first_iters: int = 60, **kw):
        self.asm = asm
        self.horizon = horizon
        self.nn_spec = nn_spec
        self.nn_params = nn_params
        self._kw = kw
        self._plan_first = make_assembly_planner(
            asm, horizon, nn_spec, opt_iters=first_iters, **kw)
        self._plan_warm = make_assembly_planner(
            asm, horizon, nn_spec, opt_iters=replan_iters, **kw)
        self.carry = AssemblyCarry.initial(asm)
        self._logits = None
        self._u_applied = None
        self._step = jax.jit(partial(
            assembly_step_carry, asm,
            tol=kw.get("tol", 1e-8), max_iter=kw.get("max_iter", 30),
            nn_spec=nn_spec))

    def reset(self):
        self.carry = AssemblyCarry.initial(self.asm)
        self._logits = None
        self._u_applied = None

    def act(self, target_pos, target_quat=None) -> tuple:
        """Plan against (horizon, 3) plate-position targets (and optional
        (horizon, 4) quaternion targets); apply + return the first (M,
        n_tendons) tension matrix. Returns (tensions, info dict)."""
        planner = (self._plan_first if self._logits is None
                   else self._plan_warm)
        result = planner(self.carry, target_pos, target_quat,
                         self._logits, self.nn_params, self._u_applied)
        u0 = result.tensions[0]
        self.carry, _, plate7, _, _ = self._step(
            self.carry, u0, nn_params=self.nn_params)
        self._logits = jnp.concatenate(
            [result.logits[1:], result.logits[-1:]], axis=0)
        self._u_applied = u0
        return u0, {"cost": float(result.cost),
                    "predicted_plates": result.plate_poses,
                    "plate_pose": plate7}
