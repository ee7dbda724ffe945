"""Fast batched rollout: Newton shooting driven entirely by the fused
Pallas sweep kernel (ops/pallas_sweep.py).

Motivation: the XLA rollout's wall time is kernel-launch overhead — every
Newton iteration runs two lax.scan sweeps of dozens of tiny ops per node.
Here each Newton phase is ONE kernel launch over the whole rod batch:

  per iteration:
    probes     — residuals at [G + h_i e_i] for the finite-difference
                 Jacobian, batched over (rods x 6) in one launch
    candidates — residuals at [G + alpha_k dG] for the vectorized line
                 search, batched over (rods x A) in one launch
  per time step, after convergence:
    one full sweep records the rod (y, z).

The FD Jacobian only steers Newton; the residual itself is exact, so the
converged root (and hence the trajectory) matches the autodiff-Jacobian
path to solver tolerance — pinned by tests/test_fast_rollout.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models.mlp import MLPSpec
from ..ops.linalg import solve_small
from ..ops.pallas_sweep import make_sweep_kernel
from .params import RodParams
from .stepper import initial_state

__all__ = ["make_fast_rollout", "make_fast_step", "mega_rollout_cached"]


_MEGA_LRU: "OrderedDict" = None


def mega_rollout_cached(p: RodParams, spec=None, tol: float = 1e-10,
                        max_iter: int = 50, method: str = "euler",
                        interpret: bool = False):
    """Shared content-keyed LRU of jitted mega rollouts.

    Both the train-loop validation rollouts (training/train.py) and the
    grid eval sweeps (evaluation/tables.py) reuse compiled mega kernels
    here. The key hashes the rod's LEAF VALUES (not object identity), so
    logically-identical rods built by separate apply_mod calls share one
    compile; the LRU (16 entries) bounds retained executables across
    hyperparameter sweeps."""
    global _MEGA_LRU
    import hashlib
    from collections import OrderedDict

    if _MEGA_LRU is None:
        _MEGA_LRU = OrderedDict()
    h = hashlib.sha1()
    for leaf in jax.tree.leaves(p):
        h.update(np.asarray(leaf).tobytes())
    h.update(repr((p.N, p.n_tendons, spec, float(tol), int(max_iter),
                   method, interpret)).encode())
    key = h.hexdigest()
    fn = _MEGA_LRU.get(key)
    if fn is None:
        fn = jax.jit(make_fast_rollout(p, spec, tol=tol, max_iter=max_iter,
                                       impl="mega", method=method,
                                       interpret=interpret))
        _MEGA_LRU[key] = fn
        while len(_MEGA_LRU) > 16:
            _MEGA_LRU.popitem(last=False)
    else:
        _MEGA_LRU.move_to_end(key)
    return fn


def _build_kernels(p, spec, block_b, interpret, impl, method="euler"):
    if impl == "pallas":
        return (make_sweep_kernel(p, spec, block_b=block_b, method=method,
                                  interpret=interpret, want_rod=False),
                make_sweep_kernel(p, spec, block_b=block_b, method=method,
                                  interpret=interpret, want_rod=True))
    if impl == "xla":
        return (_xla_sweeps(p, spec, want_rod=False, method=method),
                _xla_sweeps(p, spec, want_rod=True, method=method))
    raise ValueError(impl)


def _build_step(p, k_res, k_full, tol, max_iter, n_alphas,
                jacobian_refresh, fd_order):
    """Shared single-BDF-2-step builder: returns
    step(y, z, y_prev, z_prev, G, tensions, nn_params) ->
    (y_new, z_new, G_new, r2, iters). All leading axes are the rod batch R."""
    dtype = p.dtype
    if fd_order == 2:
        eps = jnp.asarray(6e-6 if dtype == jnp.float64 else 5e-3, dtype)
    else:
        eps = jnp.asarray(1e-8 if dtype == jnp.float64 else 3e-4, dtype)
    alphas = (0.5 ** jnp.arange(n_alphas)).astype(dtype)
    eye = jnp.eye(6, dtype=dtype)
    # LM stall escalation — THE ladder constants live in ops/pallas_step
    # (see there for the 4 x30 vs 8 x10 rationale); importing them keeps
    # the XLA driver and the kernel in lock-step across retunes
    from ..ops.pallas_step import (_LM_GROWTH, _LM_LAMBDA0,
                                   _MAX_ESCALATIONS)
    lm_lambda0 = jnp.asarray(_LM_LAMBDA0, dtype)
    lm_growth = _LM_GROWTH
    max_escalations = _MAX_ESCALATIONS

    def step(y, z, y_prev, z_prev, G, tensions, nn_params=None):
        R = y.shape[0]
        yh = p.c1 * y + p.c2 * y_prev
        zh = p.c1 * z + p.c2 * z_prev
        tf = jnp.einsum("rt,tc->rc", jnp.asarray(tensions, dtype),
                        jnp.asarray(p.tendon_dirs, dtype),
                        precision=jax.lax.Precision.HIGHEST)   # (R, 3)

        def res_batch(G_flat, width):
            rep = lambda a: jnp.repeat(a, width, axis=0)
            return k_res(G_flat, rep(yh), rep(zh), rep(tf), nn_params)

        def fd_jacobian(G, r):
            h = eps * (1.0 + jnp.abs(G))
            plus = G[:, None, :] + h[:, None, :] * eye[None]
            if fd_order == 2:
                minus = G[:, None, :] - h[:, None, :] * eye[None]
                probes = jnp.concatenate([plus, minus], axis=1)
                r_p = res_batch(probes.reshape(R * 12, 6),
                                12).reshape(R, 12, 6)
                J = (r_p[:, :6] - r_p[:, 6:]) / (2 * h[:, :, None])
            else:
                r_p = res_batch(plus.reshape(R * 6, 6), 6).reshape(R, 6, 6)
                J = (r_p - r[:, None, :]) / h[:, :, None]
            return jnp.swapaxes(J, 1, 2)

        def cond(state):
            G, r, r2, J, it, lam, fails = state
            return (jnp.any((r2 > tol) & (fails <= max_escalations))
                    & (it < max_iter))

        def body(state):
            G, r, r2, J, it, lam, fails = state
            if jacobian_refresh == 1:
                J = fd_jacobian(G, r)
            else:
                J = lax.cond(it % jacobian_refresh == 0,
                             lambda: fd_jacobian(G, r), lambda: J)
            # adaptive LM term (zero until a stall escalates it)
            D = jnp.maximum(jnp.abs(jnp.diagonal(J, axis1=-2, axis2=-1)),
                            1.0)
            Jl = J + (lam[:, None] * D)[:, :, None] * eye[None]
            dG = solve_small(Jl, -r)
            dG = jnp.where(jnp.all(jnp.isfinite(dG), axis=-1,
                                   keepdims=True), dG, 0.0)
            cand = G[:, None, :] + alphas[None, :, None] * dG[:, None, :]
            r_c = res_batch(cand.reshape(R * n_alphas, 6),
                            n_alphas).reshape(R, n_alphas, 6)
            r2_c = jnp.sum(r_c * r_c, axis=-1)
            improves = r2_c < r2[:, None]
            idx = jnp.argmax(improves, axis=1)
            found = jnp.any(improves, axis=1)
            pick = jnp.where(found, idx, 0)
            take = lambda a: jnp.take_along_axis(
                a, pick[:, None, None], axis=1).squeeze(1)
            active = (r2 > tol) & (fails <= max_escalations)
            # advance only improving lanes; stalling lanes HOLD position
            # and retry next iteration with an escalated lambda
            step_ok = active & found
            G = jnp.where(step_ok[:, None], take(cand), G)
            r = jnp.where(step_ok[:, None], take(r_c), r)
            r2 = jnp.where(step_ok, jnp.take_along_axis(
                r2_c, pick[:, None], axis=1)[:, 0], r2)
            no_improve = active & (~found)
            lam = jnp.where(no_improve,
                            jnp.maximum(lam * lm_growth, lm_lambda0),
                            0.0).astype(dtype)
            fails = jnp.where(no_improve, fails + 1,
                              jnp.where(active, 0, fails))
            return (G, r, r2, J, it + 1, lam, fails)

        r0 = k_res(G, yh, zh, tf, nn_params)
        r2 = jnp.sum(r0 * r0, axis=-1)
        state = (G, r0, r2, jnp.zeros((R, 6, 6), dtype),
                 jnp.array(0, jnp.int32), jnp.zeros(R, dtype),
                 jnp.zeros(R, jnp.int32))
        G_new, _, r2, _, it, _, _ = lax.while_loop(cond, body, state)

        _, y_new, z_body = k_full(G_new, yh, zh, tf, nn_params)
        z_new = jnp.concatenate([z_body, z[:, -1:, :]], axis=1)
        return y_new, z_new, G_new, yh, zh, r2, it

    return step


def _build_step_mega(p: RodParams, spec, block_b, tol, max_iter, n_alphas,
                     interpret, method="euler"):
    """Mega-kernel inner step (ops/pallas_step.py): the whole Newton
    shooting solve in one pallas_call. Same signature as _build_step's."""
    from ..ops.pallas_step import make_step_kernel
    dtype = p.dtype
    kstep = make_step_kernel(p, spec, block_b=block_b, tol=tol,
                             max_iter=max_iter, n_alphas=n_alphas,
                             interpret=interpret, method=method)

    def inner(y, z, y_prev, z_prev, G, tensions, nn_params=None):
        yh = p.c1 * y + p.c2 * y_prev
        zh = p.c1 * z + p.c2 * z_prev
        tf = jnp.einsum("rt,tc->rc", jnp.asarray(tensions, dtype),
                        jnp.asarray(p.tendon_dirs, dtype),
                        precision=jax.lax.Precision.HIGHEST)
        G_new, y_new, z_body, r2, iters = kstep(G, yh, zh, tf, nn_params)
        z_new = jnp.concatenate([z_body, z[:, -1:, :]], axis=1)
        return y_new, z_new, G_new, yh, zh, r2, iters

    return inner


def make_fast_step(p: RodParams, spec: Optional[MLPSpec] = None,
                   tol: float = 1e-12, max_iter: int = 30,
                   n_alphas: int = 7, block_b: int = 256,
                   interpret: bool = False, impl: str = "pallas",
                   jacobian_refresh: int = 1, fd_order: int = 2,
                   method: str = "euler"):
    """Single fused BDF-2 step (serving / control loops): fn(y, z, y_prev,
    z_prev, G, tensions, nn_params) -> (y_new, z_new, G_new, residual2,
    iters). Batched over a leading rod axis.

    impl "mega" runs the whole Newton solve in one kernel launch —
    the lowest-latency serving path. NOTE: the mega kernel always uses
    forward-difference Jacobians refreshed every iteration; the fd_order
    and jacobian_refresh arguments apply only to impl "pallas"/"xla"."""
    if impl == "mega":
        inner = _build_step_mega(p, spec, block_b, tol, max_iter, n_alphas,
                                 interpret, method=method)
    else:
        k_res, k_full = _build_kernels(p, spec, block_b, interpret, impl,
                                       method)
        inner = _build_step(p, k_res, k_full, tol, max_iter, n_alphas,
                            jacobian_refresh, fd_order)

    def step(y, z, y_prev, z_prev, G, tensions, nn_params=None):
        y_new, z_new, G_new, _, _, r2, it = inner(
            y, z, y_prev, z_prev, G, tensions, nn_params)
        return y_new, z_new, G_new, r2, it

    return step


def _xla_sweeps(p: RodParams, spec, want_rod: bool, method: str = "euler"):
    """Pure-XLA stand-in for the pallas sweep kernel (same signature);
    used for CPU testing of the FD-Newton driver and as a fallback."""
    from ..models.mlp import bind
    from .spatial import integrate_euler, integrate_rk4, tip_residual

    def fn(G, yh, zh, tf, nn_params=None):
        nn_fn = bind(spec, nn_params) if (spec is not None
                                          and nn_params is not None) else None

        def one(g, yhh, zhh, tff):
            if method == "euler":
                y, z = integrate_euler(p, g, yhh, zhh, tff, nn_fn)
            else:
                yh_int = 0.5 * (yhh[:-1] + yhh[1:])
                zh_int = 0.5 * (zhh[:-1] + zhh[1:])
                y, z = integrate_rk4(p, g, yhh, zhh, yh_int, zh_int, tff,
                                     nn_fn)
            r = tip_residual(p, y)
            return (r, y, z) if want_rod else r

        return jax.vmap(one)(G, yh, zh, tf)

    return fn


def make_fast_rollout(
    p: RodParams,
    spec: Optional[MLPSpec] = None,
    tol: float = 1e-12,
    max_iter: int = 30,
    n_alphas: int = 7,
    block_b: int = 256,
    interpret: bool = False,
    impl: str = "pallas",
    jacobian_refresh: int = 1,
    fd_order: int = 2,
    method: str = "euler",
    extrapolate: bool = True,
):
    """Build fn(controls (R, T, 4), nn_params|None) -> traj (R, T, N, 50).

    Output matches core.stepper.simulate_scan over a vmapped rod batch
    (same record layout, same dropped final step, same frozen tip-z).
    impl: "pallas" (fused sweep kernels per Newton phase), "mega" (the
    whole Newton shooting step in ONE kernel launch per time step —
    ops/pallas_step.py; euler or rk4, fd_order=1 semantics), or "xla" (vmapped
    scan sweeps — same driver, used for CPU validation).
    jacobian_refresh: recompute the FD Jacobian every k-th iteration
    (chord/Shamanskii Newton). 1 = every iteration; higher values skip the
    probe launches on intermediate iterations — the residual stays exact,
    so converged roots are unchanged, only the path differs."""
    N = p.N
    dtype = p.dtype
    if impl == "mega":
        inner = _build_step_mega(p, spec, block_b, tol, max_iter, n_alphas,
                                 interpret, method=method)
    else:
        k_res, k_full = _build_kernels(p, spec, block_b, interpret, impl,
                                       method)
        inner = _build_step(p, k_res, k_full, tol, max_iter, n_alphas,
                            jacobian_refresh, fd_order)

    def rollout(controls, nn_params=None):
        controls = jnp.asarray(controls, dtype)
        R, T = controls.shape[0], controls.shape[1]
        y0, z0 = initial_state(p)
        y0 = jnp.broadcast_to(y0, (R, N, 19))
        z0 = jnp.broadcast_to(z0, (R, N, 6))
        G0 = jnp.zeros((R, 6), dtype)

        def step(carry, tensions):
            y, z, y_prev, z_prev, G, G_prev = carry
            # linear extrapolation of the base reaction across time steps
            # starts Newton closer to the root (fewer iterations; the
            # converged G is tolerance-identical either way)
            G_guess = 2.0 * G - G_prev if extrapolate else G
            y_new, z_new, G_new, yh, zh, r2, iters = inner(
                y, z, y_prev, z_prev, G_guess, tensions, nn_params)
            record = jnp.concatenate([y_new, z_new, yh, zh], axis=-1)
            return ((y_new, z_new, y, z, G_new, G),
                    (record, jnp.sqrt(r2), iters))

        carry0 = (y0, z0, y0, z0, G0, G0)
        _, (records, res, iters) = lax.scan(
            step, carry0, jnp.swapaxes(controls, 0, 1)[:T - 1])
        rec0 = jnp.concatenate([y0, z0, y0, z0], axis=-1)[None]
        traj = jnp.concatenate([rec0, records], axis=0)       # (T, R, N, 50)
        return jnp.swapaxes(traj, 0, 1), res, iters

    return rollout
