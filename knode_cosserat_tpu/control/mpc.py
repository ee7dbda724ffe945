"""Gradient-based MPC over tendon tensions through the differentiable rollout.

The reference stack can only *replay* tension schedules (its teleop node
forwards joystick targets to the firmware PID — motor_joy_teleop, and its
rollouts go through scipy fsolve, which blocks gradients). The rebuild's
rollout is differentiable end-to-end: the Newton shooting solve runs under
``lax.custom_root`` (core/shooting.implicit_root), so d(tip trajectory)/
d(tensions) flows through the *solved* implicit BDF-2 steps via the
implicit function theorem. That turns tendon-tension planning into plain
gradient descent on device:

  plan:  u* = argmin_u  mean ||tip_t(u) - target_t||^2
                        + w_du * mean ||u_t - u_{t-1}||^2
         s.t. u in [u_min, u_max]   (enforced by a sigmoid reparam)

The whole optimization (Adam over ``opt_iters`` iterations, each iteration
an H-step implicit rollout + reverse sweep) is ONE jitted program — no
host round-trips inside a plan call. ``MPCController`` wraps it in a
receding-horizon loop: solve, apply the first tension vector, shift the
warm start. Works for the pure physics rod or the trained hybrid
(physics + KNODE MLP) model, so a model trained by training/train.py
drops straight into the controller.

This is the roadmap "MPC demo" capability (docs/ROADMAP.md): planning
through the simulator the reference can only evaluate.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.params import RodParams
from ..core.shooting import implicit_root
from ..core.spatial import integrate_euler, tip_residual
from ..core.stepper import initial_state
from ..models.mlp import MLPSpec, bind

__all__ = ["PlanState", "PlanResult", "make_planner",
           "make_multistart_planner", "MPCController", "rollout_tips"]


class PlanState(NamedTuple):
    """BDF-2 carry of the controlled rod (matches core/stepper's scan
    carry): current and previous node states plus the last two solved base
    reactions (G, G_prev) for the extrapolated Newton warm start."""
    y: jnp.ndarray        # (N, 19)
    z: jnp.ndarray        # (N, 6)
    y_prev: jnp.ndarray
    z_prev: jnp.ndarray
    G: jnp.ndarray        # (6,)
    G_prev: jnp.ndarray

    @staticmethod
    def initial(p: RodParams) -> "PlanState":
        y0, z0 = initial_state(p)
        G0 = jnp.zeros(6, p.dtype)
        return PlanState(y0, z0, y0, z0, G0, G0)


class PlanResult(NamedTuple):
    tensions: jnp.ndarray      # (H, 4) optimized schedule
    logits: jnp.ndarray        # (H, 4) reparam point (warm start for next)
    cost: jnp.ndarray          # scalar final cost
    cost_history: jnp.ndarray  # (opt_iters,)
    tips: jnp.ndarray          # (H, 3) predicted tip track under tensions


def _bdf2_step(p: RodParams, state: PlanState, tensions, nn_fn,
               nn_history: bool, tol: float, max_iter: int):
    """One differentiable BDF-2 step from an arbitrary carry (the moving-
    horizon analogue of core/stepper.simulate_scan's scan body, which is
    pinned to the straight-rod start)."""
    y, z, y_prev, z_prev, G, G_prev = state
    yh = p.c1 * y + p.c2 * y_prev
    zh = p.c1 * z + p.c2 * z_prev
    tf = jnp.einsum("t,tc->c", jnp.asarray(tensions, p.dtype),
                    jnp.asarray(p.tendon_dirs, p.dtype),
                    precision=jax.lax.Precision.HIGHEST)

    def res(Gx):
        yi, _ = integrate_euler(p, Gx, yh, zh, tf, nn_fn, nn_history)
        return tip_residual(p, yi)

    G_new = implicit_root(res, 2.0 * G - G_prev, tol=tol, max_iter=max_iter)
    y_new, z_body = integrate_euler(p, G_new, yh, zh, tf, nn_fn, nn_history)
    z_new = jnp.concatenate([z_body, z[-1:]], axis=0)
    return PlanState(y_new, z_new, y, z, G_new, G)


def rollout_tips(p: RodParams, state: PlanState, tensions,
                 spec: Optional[MLPSpec] = None, nn_params=None,
                 tol: float = 1e-10, max_iter: int = 30):
    """Differentiable H-step rollout from ``state`` under a (H, 4) tension
    schedule; returns (tips (H, 3), final PlanState). Gradients w.r.t.
    ``tensions`` (and ``nn_params``) flow through every implicit solve."""
    nn_fn = bind(spec, nn_params) if spec is not None else None
    nn_history = bool(spec.history) if spec is not None else False

    def step(carry, u):
        nxt = _bdf2_step(p, carry, u, nn_fn, nn_history, tol, max_iter)
        return nxt, nxt.y[-1, 0:3]

    final, tips = jax.lax.scan(step, state, jnp.asarray(tensions, p.dtype))
    return tips, final


def make_planner(
    p: RodParams,
    horizon: int,
    spec: Optional[MLPSpec] = None,
    opt_iters: int = 60,
    opt_lr: float = 0.5,
    u_min: float = 0.0,
    u_max: float = 20.0,
    w_du: float = 1e-4,
    tol: float = 1e-10,
    max_iter: int = 30,
) -> Callable[..., PlanResult]:
    """Build the jitted plan function.

    Returns ``plan(state, target_tips, logits_init=None, nn_params=None)``
    -> PlanResult. ``target_tips``: (horizon, 3) tip positions to track.
    ``logits_init``: (horizon, 4) warm start in the sigmoid reparam space
    (e.g. the previous plan's shifted logits); zeros = mid-range tensions.
    Tensions are u = u_min + (u_max - u_min) * sigmoid(logits), so box
    constraints hold by construction and the problem stays smooth.
    """
    span = float(u_max) - float(u_min)
    lo = float(u_min)

    def to_u(logits):
        return lo + span * jax.nn.sigmoid(logits)

    def cost_fn(logits, state, target, nn_params, u_last):
        u = to_u(logits)
        tips, _ = rollout_tips(p, state, u, spec, nn_params,
                               tol=tol, max_iter=max_iter)
        track = jnp.mean(jnp.sum((tips - target) ** 2, axis=-1))
        du = jnp.diff(jnp.concatenate([u_last[None], u], axis=0), axis=0)
        return track + w_du * jnp.mean(jnp.sum(du * du, axis=-1))

    optimizer = optax.adam(opt_lr)

    @jax.jit
    def plan(state: PlanState, target_tips, logits_init=None,
             nn_params=None, u_last=None) -> PlanResult:
        target = jnp.asarray(target_tips, p.dtype)
        if logits_init is None:
            logits_init = jnp.zeros((horizon, 4), p.dtype)
        if u_last is None:
            u_last = to_u(logits_init[0])
        opt_state = optimizer.init(logits_init)

        def body(carry, _):
            logits, opt_state = carry
            c, g = jax.value_and_grad(cost_fn)(logits, state, target,
                                               nn_params, u_last)
            updates, opt_state = optimizer.update(g, opt_state, logits)
            logits = optax.apply_updates(logits, updates)
            return (logits, opt_state), c

        (logits, _), costs = jax.lax.scan(body, (logits_init, opt_state),
                                          None, length=opt_iters)
        u = to_u(logits)
        tips, _ = rollout_tips(p, state, u, spec, nn_params,
                               tol=tol, max_iter=max_iter)
        final_cost = cost_fn(logits, state, target, nn_params, u_last)
        return PlanResult(u, logits, final_cost, costs, tips)

    return plan


def make_multistart_planner(p: RodParams, horizon: int,
                            restarts: int = 8, init_scale: float = 2.0,
                            **kw) -> Callable[..., PlanResult]:
    """Multi-start variant of make_planner: ``restarts`` independent Adam
    descents from randomized logit inits run as ONE vmapped program (the
    rollouts batch onto the device — measured 29x throughput from B=1 to
    B=256 on the coupled solves, docs/BENCHMARKS.md), and the best final
    cost wins. Escapes the local minima a single warm start can fall
    into when the target track is far from mid-range tensions.

    Returns ``plan(state, target_tips, key, logits_init=None,
    nn_params=None, u_last=None) -> PlanResult`` (the WINNING restart's
    result). ``logits_init`` seeds restart 0 (the receding-horizon warm
    start); the rest perturb it by ``init_scale``-scaled normal noise.
    """
    single = make_planner(p, horizon, **kw)
    n_tendons = 4

    @jax.jit
    def plan(state: PlanState, target_tips, key, logits_init=None,
             nn_params=None, u_last=None) -> PlanResult:
        if logits_init is None:
            logits_init = jnp.zeros((horizon, n_tendons), p.dtype)
        noise = init_scale * jax.random.normal(
            key, (restarts - 1, horizon, n_tendons), p.dtype)
        inits = jnp.concatenate([logits_init[None],
                                 logits_init[None] + noise], axis=0)
        results = jax.vmap(
            lambda li: single(state, target_tips, li, nn_params, u_last)
        )(inits)
        best = jnp.argmin(results.cost)
        return jax.tree.map(lambda x: x[best], results)

    return plan


class MPCController:
    """Receding-horizon controller over the (hybrid) rod model.

    Each ``act`` call plans ``horizon`` steps from the CURRENT model state,
    applies the first tension vector to the internal model (the planner's
    own dynamics — a digital-twin loop; feed the returned tensions to
    hw/bridge or serving.CompiledStepper to drive an external plant), and
    shifts the optimized logits one step for the next call's warm start.
    """

    def __init__(self, p: RodParams, horizon: int = 10,
                 spec: Optional[MLPSpec] = None, nn_params=None,
                 replan_iters: int = 25, first_iters: int = 80, **kw):
        self.p = p
        self.horizon = horizon
        self.spec = spec
        self.nn_params = nn_params
        self._kw = kw
        self._plan_first = make_planner(p, horizon, spec,
                                        opt_iters=first_iters, **kw)
        self._plan_warm = make_planner(p, horizon, spec,
                                       opt_iters=replan_iters, **kw)
        # Build the advance step ONCE: a fresh jit(partial(...)) per act()
        # call would miss the trace cache every time and recompile the
        # implicit BDF-2 solve at every control step. nn_params stays a
        # traced argument so later weight updates don't hit stale closures.
        tol = kw.get("tol", 1e-10)
        max_iter = kw.get("max_iter", 30)

        def _advance(state, u, nn_p):
            nn_fn = bind(spec, nn_p) if spec is not None else None
            nn_history = bool(spec.history) if spec is not None else False
            return _bdf2_step(p, state, u, nn_fn, nn_history, tol, max_iter)

        self._step = jax.jit(_advance)
        self.state = PlanState.initial(p)
        self._logits = None
        self._u_applied = None

    def reset(self):
        self.state = PlanState.initial(self.p)
        self._logits = None
        self._u_applied = None

    def act(self, target_tips) -> tuple:
        """Plan against (horizon, 3) targets; apply + return the first
        tension vector. Returns (tensions (4,), info dict)."""
        planner = self._plan_first if self._logits is None else self._plan_warm
        result = planner(self.state, target_tips, self._logits,
                         self.nn_params, self._u_applied)
        u0 = result.tensions[0]
        # advance the internal model by the applied action
        self.state = self._step(self.state, u0, self.nn_params)
        # shift warm start: drop the applied step, repeat the last
        self._logits = jnp.concatenate([result.logits[1:],
                                        result.logits[-1:]], axis=0)
        self._u_applied = u0
        tip = self.state.y[-1, 0:3]
        return u0, {"cost": float(result.cost),
                    "predicted_tips": result.tips,
                    "tip": tip}
