"""Gradient-based system identification of physical rod parameters.

The reference architecture treats wrong physics as something only the KNODE
residual can absorb: the mods registry deliberately injects faulted
parameters (knode.py:22-47) and the MLP learns the gap
(physics_train.py:196-304). Its derived terms are computed by a host-side
side-effecting method (compute_intermediate_terms, cosserat_ode.py:58-78),
so d(loss)/d(E, L, Bbt, ...) does not exist there.

In the rebuild every derived term is traceable (core/params.derive_traced),
so the faulted parameter itself is recoverable by gradient descent — the
natural complement to KNODE residual learning:

  * ``objective="teacher"`` — the same teacher-forced one-step loss the
    KNODE trainer minimizes (training/loss.py), but differentiated w.r.t.
    physical parameters instead of NN weights. Cheap (no solver in the
    graph), robust, and uses exactly the data the trainer already consumes.
  * ``objective="rollout"`` — node-position MSE of the full implicit BDF-2
    rollout, differentiated through every Newton shooting solve via
    ``lax.custom_root`` (core/shooting.implicit_root). Stronger signal on
    slow dynamics (damping, drag), costlier per step.

Positive scalars (E, L, r, rho, ...) are fitted in log-space — scale-free
steps and positivity for free; damping matrices as log-diagonals; C and g
linearly. ``fit_nn=True`` additionally trains the residual MLP jointly with
the physics (grey-box identification).

The whole fit (Adam over `steps` iterations) is ONE jitted ``lax.scan``
program — zero per-step dispatch, vmappable over candidate starts.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from ..core.params import RodParams, derive_traced
from ..core.stepper import simulate_scan
from ..models.mlp import MLPSpec, mlp_apply
from ..ops.dd import dd_gram, dd_to_float64
from .loss import (DEFAULT_KEYPOINTS_FAST, teacher_forced_loss,
                   teacher_forced_residuals)

__all__ = ["FITTABLE_FIELDS", "theta_init", "apply_theta", "theta_values",
           "SysIdResult", "fit_rod_params", "IdentifiabilityReport",
           "identifiability", "DesignResult", "design_experiment",
           "LaplacePosterior", "laplace_posterior", "sample_posterior",
           "AssemblySysIdResult", "fit_assembly_params",
           "assembly_identifiability"]

# field -> parameterization. log: positive scalar fitted as log(x);
# logdiag: (3,3) diagonal matrix fitted as log of its diagonal;
# linear: fitted as-is (fields whose physical value may be zero).
FITTABLE_FIELDS: Dict[str, str] = {
    "E": "log",
    "L": "log",
    "r": "log",
    "rho": "log",
    "tendon_offset": "log",
    "T0": "log",
    "Bbt": "logdiag",
    "Bse": "logdiag",
    "C": "linear",
    "g": "linear",
    "vstar": "linear",
}


def theta_init(p: RodParams, fields: Sequence[str]) -> Dict[str, jnp.ndarray]:
    """Pack the selected base parameters of ``p`` into the optimization
    vector (a dict pytree), applying the per-field transform."""
    theta = {}
    for name in fields:
        if name not in FITTABLE_FIELDS:
            raise ValueError(
                f"{name!r} is not fittable; choose from "
                f"{sorted(FITTABLE_FIELDS)}")
        kind = FITTABLE_FIELDS[name]
        val = np.asarray(jax.device_get(getattr(p, name)), np.float64)
        if kind == "log":
            if not np.all(val > 0):
                raise ValueError(f"{name} must be > 0 for log-space fitting "
                                 f"(got {val}); start from a positive guess")
            theta[name] = jnp.asarray(np.log(val), p.dtype)
        elif kind == "logdiag":
            d = np.diagonal(val)
            if not np.all(d > 0):
                raise ValueError(
                    f"{name} diagonal must be > 0 for log-space fitting "
                    f"(got {d}); start from a positive guess")
            theta[name] = jnp.asarray(np.log(d), p.dtype)
        else:  # linear
            theta[name] = jnp.asarray(val, p.dtype)
    return theta


def apply_theta(p: RodParams, theta: Dict[str, jnp.ndarray]) -> RodParams:
    """Rebuild a fully-derived RodParams with the fitted base parameters.
    Traceable and differentiable w.r.t. every theta leaf."""
    kw = {}
    for name, t in theta.items():
        kind = FITTABLE_FIELDS[name]
        if kind == "log":
            kw[name] = jnp.exp(t)
        elif kind == "logdiag":
            kw[name] = jnp.diag(jnp.exp(t))
        else:
            kw[name] = t
    return derive_traced(p.replace(**kw))


def theta_values(theta: Dict[str, jnp.ndarray]) -> Dict[str, np.ndarray]:
    """Physical-space values of a packed theta (host numpy, for reporting)."""
    out = {}
    for name, t in theta.items():
        kind = FITTABLE_FIELDS[name]
        v = np.asarray(jax.device_get(t), np.float64)
        out[name] = np.exp(v) if kind in ("log", "logdiag") else v
    return out


@dataclasses.dataclass
class SysIdResult:
    """Outcome of :func:`fit_rod_params`.

    params: the fitted, fully-derived rod.
    theta: fitted optimization variables (transform space).
    values: physical-space fitted values per field (host numpy).
    nn_params: fitted residual weights when ``fit_nn=True`` (else the
      unchanged input).
    loss_history: (steps,) objective value per Adam step.
    """
    params: RodParams
    theta: Dict[str, jnp.ndarray]
    values: Dict[str, np.ndarray]
    nn_params: object
    loss_history: jnp.ndarray
    # final objective per start when n_starts > 1 (loss_history is the
    # winning start's curve)
    start_losses: Optional[jnp.ndarray] = None


def _make_objective(p, traj, controls, objective, keypoints, spec,
                    nn_params, method, tol, max_iter, skip_first=False):
    """Shared scalar objective theta_dict -> loss for fitting and
    identifiability analysis.

    The rollout objective seeds the simulation from the OBSERVED first
    frame (simulate_scan(initial=...)) — real windows start mid-motion,
    and rolling out from the model's at-rest pose would attribute the
    initial-state mismatch to the fitted parameters. The seed frame is
    excluded from the MSE (it matches by construction).
    """

    def loss_fn(theta):
        p_t = apply_theta(p, theta["phys"])
        nnp = theta.get("nn", nn_params)
        if objective == "teacher":
            per = jax.vmap(lambda tr, ct: teacher_forced_loss(
                p_t, spec, nnp, tr, ct, keypoints,
                skip_first=skip_first))(traj, controls)
            return jnp.mean(per)
        nn_fn = None
        if nnp is not None:
            nn_fn = lambda x: mlp_apply(spec, nnp, x)

        def one(tr, ct):
            sim = simulate_scan(p_t, ct, nn_fn=nn_fn,
                                nn_history=spec.history, method=method,
                                tol=tol, max_iter=max_iter,
                                differentiable=True, remat=True,
                                initial=(tr[0, :, :19], tr[0, :, 19:]))
            return jnp.mean((sim.traj[1:, :, :3] - tr[1:, :, :3]) ** 2)

        return jnp.mean(jax.vmap(one)(traj, controls))

    return loss_fn


def _make_residual_fn(p, traj, controls, objective, keypoints, spec,
                      nn_params, method, tol, max_iter, skip_first=False):
    """Residual-vector sibling of :func:`_make_objective`:
    sum(res_fn(theta)**2) == loss_fn(theta) exactly. The Jacobian of this
    vector is what the f32-stable Gauss-Newton/Fisher paths consume."""

    B = traj.shape[0]

    def res_fn(theta):
        p_t = apply_theta(p, theta["phys"])
        nnp = theta.get("nn", nn_params)
        if objective == "teacher":
            per = jax.vmap(lambda tr, ct: teacher_forced_residuals(
                p_t, spec, nnp, tr, ct, keypoints,
                skip_first=skip_first))(traj, controls)
        else:
            nn_fn = None
            if nnp is not None:
                nn_fn = lambda x: mlp_apply(spec, nnp, x)

            def one(tr, ct):
                sim = simulate_scan(p_t, ct, nn_fn=nn_fn,
                                    nn_history=spec.history, method=method,
                                    tol=tol, max_iter=max_iter,
                                    differentiable=True, remat=True,
                                    initial=(tr[0, :, :19], tr[0, :, 19:]))
                d = (sim.traj[1:, :, :3] - tr[1:, :, :3]).reshape(-1)
                return d / jnp.sqrt(jnp.asarray(d.shape[0], d.dtype))

            per = jax.vmap(one)(traj, controls)
        return per.reshape(-1) / jnp.sqrt(jnp.asarray(B, per.dtype))

    return res_fn


def _chunk_sizes(steps: int, chunk) -> list:
    """Host-chunk lengths for a `steps`-long Adam scan. Always non-empty:
    steps=0 yields [0] (one empty lax.scan -> empty history), matching the
    unchunked path instead of crashing on concatenate([])."""
    if not chunk:
        return [steps]
    sizes = [chunk] * (steps // chunk) + ([steps % chunk]
                                          if steps % chunk else [])
    return sizes or [0]


def _default_opt(lr: float, nn_lr: float, fit_nn: bool):
    """The fit's default optimizer: Adam(lr) on the physics theta, a
    separate Adam(nn_lr) on joint NN weights. Labels are computed by a
    CALLABLE so the transform needs no concrete theta — buildable inside
    the trace-cached program factory below."""
    base = optax.adam(lr)
    if not fit_nn:
        return base

    def labels(th):
        return {k: jax.tree.map(lambda _: ("nn" if k == "nn" else "phys"), v)
                for k, v in th.items()}

    return optax.multi_transform({"phys": base, "nn": optax.adam(nn_lr)},
                                 labels)


def _build_fit_programs(opt, objective, keypoints, spec, method, tol,
                        max_iter, skip_first, vmapped):
    """(body, final_loss) jitted programs for :func:`fit_rod_params`.

    Everything array-valued — the rod, the data, the default NN weights,
    theta, optimizer state — enters as a jit ARGUMENT (jit's own cache
    then keys on shapes/dtypes/pytree structure), so the same program
    object serves every rod of a given N and every `fields` choice."""

    def _body(p, nn_params, theta, opt_state, traj, controls, length):
        loss_fn = _make_objective(p, traj, controls, objective, keypoints,
                                  spec, nn_params, method, tol, max_iter,
                                  skip_first=skip_first)

        def fit_step(carry, _):
            th, st = carry
            value, grads = jax.value_and_grad(loss_fn)(th)
            updates, st = opt.update(grads, st, th)
            th = optax.apply_updates(th, updates)
            return (th, st), value

        (theta, opt_state), hist = lax.scan(fit_step, (theta, opt_state),
                                            None, length=length)
        return theta, opt_state, hist

    def _final(p, nn_params, theta, traj, controls):
        loss_fn = _make_objective(p, traj, controls, objective, keypoints,
                                  spec, nn_params, method, tol, max_iter,
                                  skip_first=skip_first)
        return loss_fn(theta)

    if vmapped:    # multi-start: theta/opt_state batched, data broadcast
        body = jax.jit(
            jax.vmap(_body, in_axes=(None, None, 0, 0, None, None, None)),
            static_argnums=6)
        final = jax.jit(jax.vmap(_final,
                                 in_axes=(None, None, 0, None, None)))
    else:
        body = jax.jit(_body, static_argnums=6)
        final = jax.jit(_final)
    return body, final


@functools.lru_cache(maxsize=64)
def _cached_fit_programs(objective, keypoints, spec, method, tol, max_iter,
                         skip_first, lr, nn_lr, fit_nn, vmapped):
    """Trace-cache for the default-optimizer fit path.

    A fresh-closure jit re-traces on EVERY call: the 200-step teacher fit's
    wall was ~95% host re-trace (sysid_fit200_wall_s ~1.3 s against a 0.26
    ms/step device marginal — bench.py's T-differential), paid again for
    each window in repeated identification. Keying the program on the
    hashable config alone removes it for every call after the first; the
    custom-`optimizer` path stays uncached (an optax transform is not a
    cache key)."""
    opt = _default_opt(lr, nn_lr, fit_nn)
    body, final = _build_fit_programs(opt, objective, keypoints, spec,
                                      method, tol, max_iter, skip_first,
                                      vmapped)
    return opt, body, final


def _best_start(final_losses: jnp.ndarray) -> jnp.ndarray:
    """Index of the winning restart. NaN final losses (diverged starts —
    exactly what multi-start exists to survive) are treated as +inf;
    a bare jnp.argmin would RETURN the NaN index."""
    clean = jnp.where(jnp.isnan(final_losses), jnp.inf, final_losses)
    return jnp.argmin(clean)


def _flatten_theta(theta):
    """(vec0, labels, unpack) for a transform-space theta dict — the one
    packing used by both identifiability() and design_experiment()."""
    labels = []
    for name in sorted(theta):          # tree.flatten order (sorted keys)
        n = int(np.prod(jnp.shape(theta[name]))) or 1
        labels += [name] if n == 1 else [f"{name}[{i}]" for i in range(n)]
    leaves, treedef = jax.tree.flatten(theta)
    sizes = [int(np.prod(jnp.shape(l))) or 1 for l in leaves]
    vec0 = jnp.concatenate([jnp.ravel(l) for l in leaves])

    def unpack(v):
        out, off = [], 0
        for leaf, n in zip(leaves, sizes):
            out.append(jnp.reshape(v[off:off + n], jnp.shape(leaf)))
            off += n
        return jax.tree.unflatten(treedef, out)

    return vec0, labels, unpack


def fit_rod_params(
    p: RodParams,
    traj: jnp.ndarray,
    controls: jnp.ndarray,
    fields: Sequence[str] = ("E",),
    *,
    objective: str = "teacher",
    steps: int = 300,
    lr: float = 0.05,
    keypoints: Sequence[int] = DEFAULT_KEYPOINTS_FAST,
    spec: Optional[MLPSpec] = None,
    nn_params=None,
    fit_nn: bool = False,
    nn_lr: float = 1e-2,
    optimizer: Optional[optax.GradientTransformation] = None,
    method: str = "euler",
    tol: Optional[float] = None,
    max_iter: int = 50,
    n_starts: int = 1,
    start_scale: float = 0.25,
    key: Optional[jax.Array] = None,
    skip_first: bool = False,
    chunk: Optional[int] = None,
) -> SysIdResult:
    """Fit physical rod parameters to observed trajectories.

    Args:
      p: starting rod (e.g. a faulted mod — ``experimental_rod("youngs")``);
        non-fitted fields stay at their values in ``p``.
      traj: observed states, (T, N, 25) or batched (B, T, N, 25) — the
        trainer's data contract (training/data.py).
      controls: (T, n_tendons) or (B, T, n_tendons) applied tensions.
      fields: which base parameters to fit (keys of FITTABLE_FIELDS).
      objective: "teacher" (one-step, solver-free) or "rollout" (full
        implicit rollout through lax.custom_root).
      fit_nn: jointly train the residual MLP (grey-box); ``nn_params`` must
        then be provided (e.g. ``init_mlp``) and is returned fitted.
      optimizer: optax transform for the physics theta (default Adam(lr));
        when fit_nn, NN weights get their own Adam(nn_lr) via
        optax.multi_transform.
      n_starts: >1 runs vmapped RANDOM-RESTART fits (the rollout objective
        is non-convex): start 0 is the unperturbed theta, the rest jitter
        the physics theta (log-space fields additively, linear fields
        relative to their magnitude) by ``start_scale``; the start with
        the lowest final objective wins. Same pattern as the multi-start
        MPC planner (control/mpc.make_multistart_planner).
      skip_first: drop the first transition from the teacher loss — set
        True for data that starts MID-MOTION (trimmed real windows),
        where the fabricated self-prev BDF-2 history of the first step
        would bias the fit (same quirk OnlineAdapter handles; the
        rollout objective is unaffected — it seeds from the observed
        first frame either way).
      chunk: run the Adam scan in host-level chunks of this many steps
        (identical results — the optimizer state carries across chunks).
        Bounds the compiled program size: the FULL-length rollout
        objective (custom_root through every Newton solve x every fit
        step in one scan) crashes the libtpu worker at T=120 x
        steps=150, while the same fit in 50-step chunks runs on chip
        (measured, scripts/sysid_precision_study.py). The CLI defaults
        rollout-objective fits to chunk=50 off-CPU.

    Returns a :class:`SysIdResult`; the whole fit is one jitted program
    per chunk (all starts train concurrently under vmap).
    """
    if objective not in ("teacher", "rollout"):
        raise ValueError(f"unknown objective {objective!r}")
    if chunk is not None and chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    spec = spec if spec is not None else MLPSpec.for_knode()
    traj = jnp.asarray(traj, p.dtype)
    controls = jnp.asarray(controls, p.dtype)
    if traj.ndim == 3:
        traj = traj[None]
        controls = controls[None]
    if traj.ndim != 4 or traj.shape[-1] < 25 or controls.ndim != 3:
        raise ValueError("traj must be (T, N, >=25) or (B, T, N, >=25) "
                         "with matching controls")
    traj = traj[..., :25]            # SimOutput rows carry 50 channels
    if fit_nn and nn_params is None:
        raise ValueError("fit_nn=True requires initial nn_params "
                         "(models.mlp.init_mlp)")

    theta0: Dict[str, object] = {"phys": theta_init(p, fields)}
    if fit_nn:
        theta0["nn"] = nn_params

    kp = tuple(int(k) for k in keypoints)
    if optimizer is None:
        programs = functools.partial(
            _cached_fit_programs, objective, kp, spec, method,
            None if tol is None else float(tol), int(max_iter),
            bool(skip_first), float(lr), float(nn_lr), bool(fit_nn))
    else:
        if fit_nn:
            # separate learning rates: physics in log-space moves through
            # the caller's transform, NN weights at the trainer's scale.
            labels = {"phys": jax.tree.map(lambda _: "phys",
                                           theta0["phys"]),
                      "nn": jax.tree.map(lambda _: "nn", theta0["nn"])}
            opt_custom = optax.multi_transform(
                {"phys": optimizer, "nn": optax.adam(nn_lr)}, labels)
        else:
            opt_custom = optimizer

        def programs(vmapped):
            body, final = _build_fit_programs(
                opt_custom, objective, kp, spec, method, tol, max_iter,
                skip_first, vmapped)
            return opt_custom, body, final

    def run_chunked(theta, vmapped: bool):
        """steps as ceil(steps/chunk) jitted programs (2 compilations
        max: the full chunk and the remainder), optimizer state carried
        across; identical math to the single-program scan."""
        sizes = _chunk_sizes(steps, chunk)
        opt, body, final_of = programs(vmapped)
        opt_state = (jax.vmap(opt.init)(theta) if vmapped
                     else opt.init(theta))
        hists = []
        for length in sizes:
            theta, opt_state, h = body(p, nn_params, theta, opt_state,
                                       traj, controls, length)
            hists.append(h)
        hist = jnp.concatenate(hists, axis=1 if vmapped else 0)
        return theta, hist, final_of(p, nn_params, theta, traj, controls)

    start_losses = None
    if n_starts > 1:
        key = jax.random.PRNGKey(0) if key is None else key
        phys0 = theta0["phys"]
        leaves, treedef = jax.tree.flatten(phys0)
        keys = jax.random.split(key, len(leaves))

        def jittered(leaf, k, name_kind):
            noise = jax.random.normal(
                k, (n_starts - 1,) + jnp.shape(leaf), leaf.dtype)
            if name_kind == "linear":
                scale = start_scale * (jnp.abs(leaf) + 1e-3)
            else:            # log-space: additive jitter = relative jitter
                scale = start_scale
            batch = leaf[None] + scale * noise
            return jnp.concatenate([leaf[None], batch], axis=0)

        kinds = [FITTABLE_FIELDS[n] for n in sorted(phys0)]
        # tree.flatten of a dict flattens in sorted-key order
        phys_batch = jax.tree.unflatten(treedef, [
            jittered(l, k, kind)
            for l, k, kind in zip(leaves, keys, kinds)])
        theta_batch = {"phys": phys_batch}
        if fit_nn:
            theta_batch["nn"] = jax.tree.map(
                lambda a: jnp.broadcast_to(a[None],
                                           (n_starts,) + jnp.shape(a)),
                theta0["nn"])
        theta_fit_b, hist_b, final_b = run_chunked(theta_batch,
                                                   vmapped=True)
        best = _best_start(final_b)
        theta_fit = jax.tree.map(lambda a: a[best], theta_fit_b)
        hist = hist_b[best]
        start_losses = final_b
    else:
        theta_fit, hist, _ = run_chunked(theta0, vmapped=False)

    phys = theta_fit["phys"]
    return SysIdResult(
        params=apply_theta(p, phys),
        theta=phys,
        values=theta_values(phys),
        nn_params=theta_fit.get("nn", nn_params),
        loss_history=hist,
        start_losses=start_losses,
    )


@dataclasses.dataclass
class IdentifiabilityReport:
    """Local identifiability analysis at a parameter point.

    All quantities live in TRANSFORM space (log for positive scalars /
    diagonals — i.e. relative perturbations; linear otherwise).

    labels: flattened theta component names ("E", "Bbt[0]", ...).
    hessian: (D, D) curvature of the objective.
    covariance_unscaled: pinv(hessian) — the Laplace covariance UP TO the
      observation-noise scale sigma^2 (which the MSE objective does not
      estimate); meaningful for RELATIVE comparisons between parameters.
    std_unscaled: sqrt(diag(covariance_unscaled)).
    correlation: scale-free parameter correlation matrix — near +/-1
      entries mean the data cannot tell those parameters apart (e.g. E
      and r both enter stiffness as E*r^2/r^4).
    eigvals: hessian eigenvalues, ascending — near-zero relative to the
      largest means a locally non-identifiable direction (the matching
      eigvecs row says which combination).
    eigvecs: (D, D), column i pairs with eigvals[i].
    """
    labels: list
    hessian: np.ndarray
    covariance_unscaled: np.ndarray
    std_unscaled: np.ndarray
    correlation: np.ndarray
    eigvals: np.ndarray
    eigvecs: np.ndarray
    # objective value at the analysis point (reused by laplace_posterior
    # for the noise-scale estimate — no second rollout compile)
    loss_value: float = 0.0


def identifiability(
    p: RodParams,
    traj: jnp.ndarray,
    controls: jnp.ndarray,
    fields: Sequence[str] = ("E",),
    *,
    objective: str = "teacher",
    keypoints: Sequence[int] = DEFAULT_KEYPOINTS_FAST,
    spec: Optional[MLPSpec] = None,
    nn_params=None,
    method: str = "euler",
    tol: Optional[float] = None,
    max_iter: int = 50,
    skip_first: bool = False,
    hessian: str = "auto",
) -> IdentifiabilityReport:
    """Curvature-based local identifiability of ``fields`` at ``p``.

    Computes the curvature of the chosen objective w.r.t. the (small)
    transform-space theta vector at ``p`` — typically called at a fitted
    point (``res.params``). Near-singular directions and near-unit
    correlations expose parameter combinations the data cannot separate,
    BEFORE they corrupt a fit.

    hessian: how the curvature is computed.
      * "exact" — autodiff Hessian of the scalar objective. Requires f64
        to be trustworthy: the joint (E, r, L, rho, Bbt) Hessian spans
        ~9 orders of magnitude in eigenvalue, and a single-f32 Hessian
        inflates the smallest by ~2000x and scrambles the correlations
        (measured, docs/BENCHMARKS.md precision study).
      * "gn" — Gauss-Newton / Fisher: 2 J^T J from the residual-vector
        Jacobian (sum(r^2) == objective exactly), with the contraction
        accumulated in double-double f32 (ops/dd.py) so the conditioning
        survives on chip. Exact at zero residual; at a fitted point the
        neglected sum_i r_i grad^2 r_i term is O(residual). This IS the
        Fisher information of the Gaussian-noise model — the right
        object for identifiability.
      * "auto" — "exact" for f64 rods (CPU analysis), "gn" for f32 (the
        on-chip product path).
    """
    if objective not in ("teacher", "rollout"):
        raise ValueError(f"unknown objective {objective!r}")
    if hessian not in ("auto", "exact", "gn"):
        raise ValueError(f"unknown hessian mode {hessian!r}")
    spec = spec if spec is not None else MLPSpec.for_knode()
    traj = jnp.asarray(traj, p.dtype)
    controls = jnp.asarray(controls, p.dtype)
    if traj.ndim == 3:
        traj = traj[None]
        controls = controls[None]
    if traj.ndim != 4 or traj.shape[-1] < 25:
        raise ValueError(f"traj must be (T, N, >=25) or batched, got "
                         f"{traj.shape}")
    traj = traj[..., :25]            # SimOutput rows carry 50 channels
    if hessian == "auto":
        hessian = "exact" if jnp.dtype(p.dtype) == jnp.float64 else "gn"

    theta = theta_init(p, fields)
    vec0, labels, unpack = _flatten_theta(theta)

    if hessian == "gn":
        res_fn = _make_residual_fn(p, traj, controls, objective, keypoints,
                                   spec, nn_params, method, tol, max_iter,
                                   skip_first=skip_first)

        def res_of_vec(v):
            return res_fn({"phys": unpack(v)})

        @jax.jit
        def gn_parts(v):
            r = res_of_vec(v)
            # The Jacobian must be computed at HIGHEST matmul precision:
            # the MXU's default single-pass-bf16 f32 dots perturb J at
            # ~2^-8 relative, inflating sigma_min (and the smallest
            # Fisher eigenvalue, sigma_min^2) by ~1e2 (~1e4) on the
            # joint 5-field protocol — measured 7.90e-7 vs the true
            # 7.909e-11, scripts/diag_gn_chip.py. With HIGHEST the chip
            # matches the f64 CPU eigenvalue to 4 digits; the dd Gram
            # contraction itself lowers exactly (chip == host-f64 of the
            # same J). 7 forward tangents — the 6x dot cost is noise.
            with jax.default_matmul_precision("highest"):
                J = jax.jacfwd(res_of_vec)(v)      # (n, D): D fwd tangents
            hi, lo = dd_gram(J)                    # dd-accumulated J^T J
            return jnp.sum(r * r), hi, lo

        Lv, hi, lo = gn_parts(vec0)
        Lval = float(Lv)
        H = 2.0 * dd_to_float64(hi, lo)
    else:
        loss_fn = _make_objective(p, traj, controls, objective, keypoints,
                                  spec, nn_params, method, tol, max_iter,
                                  skip_first=skip_first)

        def loss_of_vec(v):
            return loss_fn({"phys": unpack(v)})

        H = np.asarray(jax.jit(jax.hessian(loss_of_vec))(vec0), np.float64)
        Lval = float(jax.jit(loss_of_vec)(vec0))
    return _report_from_hessian(labels, H, Lval)


def _report_from_hessian(labels, H, Lval) -> "IdentifiabilityReport":
    H = 0.5 * (H + H.T)
    cov = np.linalg.pinv(H)
    std = np.sqrt(np.clip(np.diagonal(cov), 0, None))
    denom = np.outer(std, std)
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = np.where(denom > 0, cov / np.where(denom == 0, 1, denom), 0.0)
    w, V = np.linalg.eigh(H)
    return IdentifiabilityReport(labels=labels, hessian=H,
                                 covariance_unscaled=cov,
                                 std_unscaled=std, correlation=corr,
                                 eigvals=w, eigvecs=V, loss_value=Lval)


@dataclasses.dataclass
class DesignResult:
    """Outcome of :func:`design_experiment`.

    controls: (T, n_tendons) optimized tension schedule (within bounds).
    objective_history: (steps,) criterion value per Adam step (the
      MINIMIZED quantity: -logdet for "D", -min-eigenvalue for "E").
    info_initial / info_final: criterion value (log det / min eig of the
      Fisher) at the initial and designed schedule — the information gain.
    """
    controls: jnp.ndarray
    objective_history: jnp.ndarray
    info_initial: float
    info_final: float


def design_experiment(
    p: RodParams,
    fields: Sequence[str] = ("E",),
    horizon: int = 30,
    *,
    criterion: str = "D",
    u_min: float = 0.0,
    u_max: float = 10.0,
    steps: int = 100,
    lr: float = 0.1,
    keypoints: Sequence[int] = DEFAULT_KEYPOINTS_FAST,
    method: str = "euler",
    tol: Optional[float] = None,
    max_iter: int = 50,
    u_init: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    fisher: str = "auto",
) -> DesignResult:
    """Fisher-optimal input design: pick the tension schedule that makes
    ``fields`` maximally identifiable BEFORE running the experiment.

    The information matrix is the Gauss-Newton Fisher of the teacher
    objective at the nominal parameters: simulate ``p`` under the candidate
    schedule u (differentiably — ``lax.custom_root`` through every Newton
    solve), evaluate the theta-Hessian of the teacher loss on that
    trajectory (exact Gauss-Newton there: residuals vanish at the nominal
    point), and ascend log det (D-optimal) or the smallest eigenvalue
    (E-optimal) with Adam over sigmoid-bounded tensions. The whole design
    loop is ONE jitted ``lax.scan``; gradients w.r.t. the schedule flow
    through the theta-Hessian AND the implicit rollout.

    The Fisher is known up to the observation-noise scale, which shifts
    log det by a constant — optimal designs are unaffected.

    A static schedule carries no information about damping/drag; the
    designed schedule learns to excite the rod (tests/test_sysid.py pins
    the gain).

    fisher: "exact" (autodiff theta-Hessian of the teacher loss — f64
    territory), "gn" (Gauss-Newton: the criterion is computed from the
    SINGULAR VALUES of the residual Jacobian J, never forming J^T J in
    working precision — log det(2 J^T J) = D log 2 + 2 sum log sigma_i,
    min-eig = 2 sigma_min^2 — so near-degenerate directions keep gradient
    signal in f32 on chip), or "auto" (exact for f64, gn for f32; see
    identifiability()).
    """
    if criterion not in ("D", "E"):
        raise ValueError(f"unknown criterion {criterion!r} (want 'D' or 'E')")
    if fisher not in ("auto", "exact", "gn"):
        raise ValueError(f"unknown fisher mode {fisher!r}")
    if fisher == "auto":
        fisher = "exact" if jnp.dtype(p.dtype) == jnp.float64 else "gn"
    theta = theta_init(p, fields)
    vec0, _, unpack = _flatten_theta(theta)
    D = int(vec0.shape[0])
    spec = MLPSpec.for_knode()
    dtype = p.dtype

    def nominal_traj(u):
        sim = simulate_scan(p, u, method=method, tol=tol, max_iter=max_iter,
                            differentiable=True, remat=True)
        return sim.traj[:, :, :25]

    def info_exact(u):
        traj = nominal_traj(u)

        def loss_of_vec(v):
            return teacher_forced_loss(apply_theta(p, unpack(v)), spec,
                                       None, traj, u, keypoints)

        H = jax.hessian(loss_of_vec)(vec0)
        H = 0.5 * (H + H.T)
        if criterion == "D":
            return jnp.linalg.slogdet(H)[1]
        return jnp.linalg.eigvalsh(H)[0]

    def info_gn(u):
        traj = nominal_traj(u)

        def res_of_vec(v):
            return teacher_forced_residuals(apply_theta(p, unpack(v)),
                                            spec, None, traj, u, keypoints)

        # HIGHEST matmul precision for the same reason as the
        # identifiability gn path: default-precision MXU dots bury
        # sigma_min of an ill-conditioned J under bf16 rounding, and the
        # E-criterion IS 2 sigma_min^2 (measured 1e4x inflation on the
        # joint 5-field spectrum, scripts/diag_gn_chip.py).
        with jax.default_matmul_precision("highest"):
            J = jax.jacfwd(res_of_vec)(vec0)       # (n, D)
        s = jnp.linalg.svd(J, compute_uv=False)    # descending
        if criterion == "D":
            return (D * jnp.log(jnp.asarray(2.0, s.dtype))
                    + 2.0 * jnp.sum(jnp.log(s)))
        return 2.0 * s[-1] ** 2

    info = info_gn if fisher == "gn" else info_exact

    span = u_max - u_min
    if u_init is None:
        # mid-range static start + tiny noise so the sigmoid has gradient
        key = jax.random.PRNGKey(0) if key is None else key
        logits0 = 0.01 * jax.random.normal(
            key, (horizon, p.tendon_dirs.shape[0]), dtype)
    else:
        u0 = jnp.clip((jnp.asarray(u_init, dtype) - u_min) / span,
                      1e-4, 1 - 1e-4)
        logits0 = jnp.log(u0 / (1 - u0))

    def objective(logits):
        return -info(u_min + span * jax.nn.sigmoid(logits))

    opt = optax.adam(lr)

    @jax.jit
    def run(logits):
        state = opt.init(logits)

        def step(carry, _):
            lg, st = carry
            val, g = jax.value_and_grad(objective)(lg)
            upd, st = opt.update(g, st, lg)
            return (optax.apply_updates(lg, upd), st), val

        (logits_f, _), hist = lax.scan(step, (logits, state), None,
                                       length=steps)
        u_f = u_min + span * jax.nn.sigmoid(logits_f)
        return u_f, hist, info(u_f)

    u_fit, hist, info_f = run(logits0)
    return DesignResult(controls=u_fit, objective_history=hist,
                        info_initial=float(-hist[0]),
                        info_final=float(info_f))


@dataclasses.dataclass
class LaplacePosterior:
    """Scaled Laplace approximation of the parameter posterior at a fit.

    Unlike IdentifiabilityReport's UNSCALED covariance, this one carries
    physical units: under an iid Gaussian position-noise model for the
    rollout objective (MSE L over n scalar position residuals, noise
    variance sigma^2), the negative log-likelihood is (n / 2 sigma^2) L,
    so the posterior covariance is (2 sigma^2 / n) H_L^-1 with
    sigma^2 estimated as L * n / (n - d) at the minimum.

    All theta-space quantities are in TRANSFORM space (log for positive
    scalars — std is then a RELATIVE one-sigma, e.g. std 0.02 on log E
    means +/-2% on E).

    Locally non-identifiable eigendirections (Hessian eigenvalue near zero
    relative to the largest — the documented E-r stiffness degeneracy) get
    the PRIOR variance ``prior_std**2`` along them, not the ~zero variance
    a pinv would assign: the data carries no information there, so the
    posterior must stay wide. ``degenerate_directions`` lists them as
    (eigenvector, data_variance) pairs for inspection.
    """
    labels: list
    theta: Dict[str, jnp.ndarray]     # posterior mean (the fit)
    covariance: np.ndarray            # (D, D), transform space, SCALED
    std: np.ndarray                   # sqrt(diag)
    sigma2: float                     # estimated position-noise variance
    n_residuals: int
    prior_std: float = np.inf
    degenerate_directions: list = dataclasses.field(default_factory=list)


def laplace_posterior(
    p: RodParams,
    traj: jnp.ndarray,
    controls: jnp.ndarray,
    fields: Sequence[str] = ("E",),
    *,
    keypoints: Sequence[int] = DEFAULT_KEYPOINTS_FAST,
    method: str = "euler",
    tol: Optional[float] = None,
    max_iter: int = 50,
    prior_std: float = 1.0,
) -> LaplacePosterior:
    """Scaled parameter posterior at ``p`` (call on a fitted
    ``res.params``) under the ROLLOUT objective's position-noise model.

    The teacher objective is deliberately NOT supported here: it sums
    four heterogeneous MSE terms (positions, internal states, Euler
    angles, strains) with no single noise scale, so a scalar sigma^2
    would be fiction. Its curvature is still available unscaled via
    :func:`identifiability`.

    prior_std: one-sigma width (transform space, i.e. RELATIVE for
    log-parameters — 1.0 means "within a factor ~e") of the Gaussian
    prior that bounds the variance along locally non-identifiable
    Hessian eigendirections. Without it a pinv would assign those
    directions ~ZERO variance — maximal confidence exactly where the
    data carries no information. A warning is emitted when any
    direction hits the prior.
    """
    traj = jnp.asarray(traj, p.dtype)
    controls = jnp.asarray(controls, p.dtype)
    if traj.ndim == 3:
        traj = traj[None]
        controls = controls[None]
    if traj.ndim != 4 or traj.shape[-1] < 25 or controls.ndim != 3 \
            or controls.shape[0] != traj.shape[0]:
        raise ValueError("traj must be (T, N, >=25) or (B, T, N, >=25) "
                         "with matching controls; got "
                         f"{traj.shape} / {controls.shape}")
    traj = traj[..., :25]            # SimOutput rows carry 50 channels
    theta = theta_init(p, fields)
    B, T, N = traj.shape[0], traj.shape[1], traj.shape[2]
    n = B * (T - 1) * N * 3          # scored position residuals
    d = int(sum(int(np.prod(jnp.shape(t))) or 1 for t in theta.values()))
    if n <= d:
        raise ValueError(f"need more residuals ({n}) than parameters ({d})")
    rep = identifiability(p, traj, controls, fields, objective="rollout",
                          keypoints=keypoints, method=method, tol=tol,
                          max_iter=max_iter)
    L = rep.loss_value               # evaluated jitted inside the report
    sigma2 = L * n / (n - d)
    # Posterior = (prior N(0, prior_std^2 I) x likelihood) Laplace: build
    # the covariance in the Hessian eigenbasis so near-zero-curvature
    # directions get the PRIOR variance, not pinv's zero. Data variance
    # along eigdir i is (2 sigma^2 / n) / w_i; composing with the prior:
    # var_i = 1 / (1/prior_var + w_i n / (2 sigma^2)).
    w = np.asarray(rep.eigvals, np.float64)
    V = np.asarray(rep.eigvecs, np.float64)
    prior_var = float(prior_std) ** 2
    data_prec = np.clip(w, 0.0, None) * n / (2.0 * sigma2)
    var = 1.0 / (1.0 / prior_var + data_prec)
    degenerate = []
    w_max = float(np.max(np.abs(w))) if w.size else 0.0
    for i in range(w.size):
        if w[i] <= 1e-10 * max(w_max, 1e-300):
            degenerate.append((V[:, i].copy(),
                               float(1.0 / max(data_prec[i], 1e-300))))
    if degenerate:
        import warnings
        combos = "; ".join(
            " + ".join(f"{v:+.3f}*{lb}" for v, lb in
                       zip(vec, rep.labels) if abs(v) > 0.05)
            for vec, _ in degenerate)
        warnings.warn(
            f"laplace_posterior: {len(degenerate)} locally "
            f"non-identifiable parameter direction(s) [{combos}] — the "
            f"data carries no curvature there; their posterior variance "
            f"is the prior's (prior_std={prior_std}). Re-excite (see "
            "design_experiment) or fix one of the coupled parameters.",
            stacklevel=2)
    cov = (V * var) @ V.T
    std = np.sqrt(np.clip(np.diagonal(cov), 0, None))
    return LaplacePosterior(labels=rep.labels, theta=theta,
                            covariance=cov, std=std, sigma2=sigma2,
                            n_residuals=n, prior_std=float(prior_std),
                            degenerate_directions=degenerate)


def sample_posterior(
    p: RodParams,
    post: LaplacePosterior,
    key: jax.Array,
    n_samples: int = 20,
) -> RodParams:
    """Draw parameter samples from the Laplace posterior and return a
    STACKED RodParams pytree (leading sample axis) — feed it straight to
    ``jax.vmap(simulate_scan, in_axes=(0, None))`` for predictive
    ensembles / tip-trajectory uncertainty bands."""
    vec0, _, unpack = _flatten_theta(post.theta)
    D = vec0.shape[0]
    cov = np.asarray(post.covariance, np.float64)
    # jittered Cholesky: the E-r style degenerate directions make cov
    # singular-ish. The jitter is RELATIVE to the covariance scale (an
    # absolute floor would swamp very tight posteriors and inflate the
    # sample spread beyond post.std); an exactly-zero cov falls back to
    # a degenerate (all-mean) ensemble via a tiny absolute epsilon.
    scale = float(np.trace(cov)) / max(D, 1)
    jitter = 1e-12 * scale if scale > 0 else 1e-300
    Lc = np.linalg.cholesky(cov + jitter * np.eye(D))
    eps = jax.random.normal(key, (n_samples, D), vec0.dtype)
    vecs = vec0[None, :] + eps @ jnp.asarray(Lc.T, vec0.dtype)
    return jax.vmap(lambda v: apply_theta(p, unpack(v)))(vecs)


# ------------------------------------------------- assembly identification

@dataclasses.dataclass
class AssemblySysIdResult:
    """Outcome of :func:`fit_assembly_params`.

    assembly: the fitted RodAssembly (per-rod derived params rebuilt).
    theta: fitted transform-space variables; every leaf carries a leading
      M (rod) axis.
    values: physical-space values per field, shape (M, ...) — read
      per-rod recoveries (and LOCALIZE a fault) directly from here.
    loss_history: (steps,) objective value per Adam step.
    """
    assembly: object
    theta: Dict[str, jnp.ndarray]
    values: Dict[str, np.ndarray]
    loss_history: jnp.ndarray


def _unstack_rods(rods: RodParams, M: int):
    return [jax.tree.map(lambda x: x[i], rods) for i in range(M)]


def _assembly_fit_loss(asm, plate_traj, controls, theta, w_ori, tol,
                       max_iter, solver):
    """Plate-pose MSE of the coupled rollout at per-rod theta (the
    fit_assembly_params objective; module-level so the jitted chunk below
    closes over hashable config only)."""
    from ..core.assembly import simulate_assembly
    rods_t = jax.vmap(apply_theta)(asm.rods, theta)
    sim = simulate_assembly(asm.replace(rods=rods_t), controls,
                            tol=tol, max_iter=max_iter,
                            differentiable=True, remat=True,
                            solver=solver)
    dp = sim.plate_pose[:, :3] - plate_traj[:, :3]
    loss = jnp.mean(dp * dp)
    if w_ori:
        # normalized, antipode-safe: 1 - cos^2(angle between quats).
        # Observed mocap quats are not unit-exact and the solver's
        # h_plate carries f32 rounding, so normalize both.
        q = sim.plate_pose[:, 3:7]
        qt = plate_traj[:, 3:7]
        dot = (jnp.sum(q * qt, axis=-1)
               * jax.lax.rsqrt(jnp.sum(q * q, axis=-1)
                               * jnp.sum(qt * qt, axis=-1) + 1e-30))
        loss = loss + w_ori * jnp.mean(1.0 - dot * dot)
    return loss


def _assembly_fit_chunk(opt, w_ori, tol, max_iter, solver,
                        asm, plate_traj, controls, theta, opt_state,
                        length):
    """One host-chunk of the assembly fit's Adam scan. The first five
    params are bound by functools.partial before jit; the assembly, data,
    theta and optimizer state are jit arguments (M/N/has_contact are
    static pytree aux), so jit's cache keys on their structure."""

    def loss_fn(th):
        return _assembly_fit_loss(asm, plate_traj, controls, th, w_ori,
                                  tol, max_iter, solver)

    def fit_step(carry, _):
        th, st = carry
        value, grads = jax.value_and_grad(loss_fn)(th)
        updates, st = opt.update(grads, st, th)
        th = optax.apply_updates(th, updates)
        return (th, st), value

    (theta, opt_state), hist = lax.scan(fit_step, (theta, opt_state),
                                        None, length=length)
    return theta, opt_state, hist


@functools.lru_cache(maxsize=32)
def _cached_assembly_fit_program(w_ori, tol, max_iter, solver, lr):
    """Trace-cache for the default-optimizer assembly fit (same rationale
    as _cached_fit_programs: a fresh-closure jit re-traces the whole
    coupled-rollout grad program on every call)."""
    opt = optax.adam(lr)
    body = jax.jit(functools.partial(_assembly_fit_chunk, opt, w_ori, tol,
                                     max_iter, solver), static_argnums=5)
    return opt, body


def fit_assembly_params(
    asm,
    plate_traj: jnp.ndarray,
    controls: jnp.ndarray,
    fields: Sequence[str] = ("E",),
    *,
    steps: int = 200,
    lr: float = 0.05,
    w_ori: float = 0.0,
    optimizer: Optional[optax.GradientTransformation] = None,
    tol: Optional[float] = None,
    max_iter: int = 50,
    solver: str = "auto",
    chunk: Optional[int] = None,
) -> AssemblySysIdResult:
    """Per-rod grey-box identification of a parallel continuum robot from
    END-PLATE pose observations alone.

    The plate rigidly couples the rods, so a parameter fault in ONE rod
    (stiffness drop, density error, ...) shifts the shared equilibrium
    asymmetrically — enough signal to both recover the value and
    localize which rod carries it, without any per-rod state
    measurement. Each fitted field gets an independent transform-space
    variable PER ROD (leading M axis); gradients flow through the whole
    coupled rollout (``simulate_assembly(differentiable=True)`` — IFT
    through every (6M+7)-dim implicit solve).

    Args:
      asm: starting assembly (e.g. all-nominal rods when hunting a fault).
      plate_traj: observed plate rows, (T, >=3): [p_plate(3), h_plate(4)];
        positions alone suffice (w_ori adds the quaternion term).
      controls: (T, M, n_tendons) per-rod applied tensions. An exciting,
        per-rod-asymmetric schedule separates the rods (see
        design_experiment for the single-rod analogue).
      fields: keys of FITTABLE_FIELDS; each is fitted per rod.
      w_ori: weight of the antipode-safe orientation term
        1 - <q, q_obs>^2 (needs plate_traj rows of width >= 7).
      chunk: host-chunked Adam scans with carried optimizer state
        (bit-identical; bounds compiled-program size exactly like
        fit_rod_params(chunk=)).

    Returns :class:`AssemblySysIdResult`; ``values[field]`` has shape
    (M,) (or (M, 3) for logdiag fields) — argmin/argmax over the rod
    axis localizes the fault. The whole fit is one jitted lax.scan per
    chunk. No reference analogue (the reference has no assemblies).
    """
    dtype = asm.dtype
    plate_traj = jnp.asarray(plate_traj, dtype)
    controls = jnp.asarray(controls, dtype)
    if controls.ndim != 3 or controls.shape[1] != asm.M:
        raise ValueError(f"controls must be (T, M={asm.M}, n_tendons), "
                         f"got {controls.shape}")
    if plate_traj.ndim != 2 or plate_traj.shape[-1] < 3:
        raise ValueError(f"plate_traj must be (T, >=3), got "
                         f"{plate_traj.shape}")
    if plate_traj.shape[0] != controls.shape[0]:
        raise ValueError("plate_traj and controls must share T")
    if w_ori and plate_traj.shape[-1] < 7:
        raise ValueError("w_ori needs plate_traj rows [p(3), h(4)]")
    if chunk is not None and chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")

    # per-rod transform-space init (each rod's own logdiag/log handling),
    # stacked to a leading M axis; jax.vmap(apply_theta) inverts it
    per_rod = [theta_init(r, fields) for r in _unstack_rods(asm.rods,
                                                            asm.M)]
    theta0 = jax.tree.map(lambda *xs: jnp.stack(xs), *per_rod)
    if optimizer is None:
        opt, scan_chunk = _cached_assembly_fit_program(
            float(w_ori), None if tol is None else float(tol),
            int(max_iter), solver, float(lr))
    else:
        opt = optimizer
        scan_chunk = jax.jit(
            functools.partial(_assembly_fit_chunk, opt, w_ori, tol,
                              max_iter, solver),
            static_argnums=5)

    sizes = _chunk_sizes(steps, chunk)
    theta, opt_state = theta0, opt.init(theta0)
    hists = []
    for n in sizes:
        theta, opt_state, hist = scan_chunk(asm, plate_traj, controls,
                                            theta, opt_state, n)
        hists.append(hist)
    loss_history = jnp.concatenate(hists) if len(hists) > 1 else hists[0]

    rods_fit = jax.vmap(apply_theta)(asm.rods, theta)
    values = theta_values(theta)
    return AssemblySysIdResult(assembly=asm.replace(rods=rods_fit),
                               theta=theta, values=values,
                               loss_history=loss_history)


def assembly_identifiability(
    asm,
    plate_traj: jnp.ndarray,
    controls: jnp.ndarray,
    fields: Sequence[str] = ("E",),
    *,
    w_ori: float = 0.0,
    tol: Optional[float] = None,
    max_iter: int = 50,
    solver: str = "auto",
) -> IdentifiabilityReport:
    """Gauss-Newton/Fisher identifiability of per-rod parameters from
    end-plate observations — BEFORE running :func:`fit_assembly_params`,
    ask whether the experiment can resolve them at all.

    The canonical use: on a symmetric M-ring observed by plate POSITION
    only, the anti-symmetric stiffness mode (rod i up, rod j down) is a
    near-null Fisher direction — fits silently converge to the mean
    stiffness (measured, tests/test_sysid.py). This report EXPOSES that
    flat direction (smallest eigenvalue, its eigenvector split across
    rods, corr -> -1 between the rods); adding the orientation channel
    (``w_ori > 0``) closes it.

    Observation model: Gaussian noise on plate position rows and (when
    w_ori > 0) on the plate quaternion, residual q - sign(<q, q_obs>) *
    q_obs (antipode-safe; equals the fit objective's 1 - cos^2 term to
    second order at the optimum — same Fisher information). The Jacobian
    runs at HIGHEST matmul precision and the Gram in double-double f32
    (ops/dd.py), exactly like the single-rod ``hessian="gn"`` path, so
    the spectrum is trustworthy on chip."""
    from ..core.assembly import simulate_assembly

    dtype = asm.dtype
    plate_traj = jnp.asarray(plate_traj, dtype)
    controls = jnp.asarray(controls, dtype)
    if controls.ndim != 3 or controls.shape[1] != asm.M:
        raise ValueError(f"controls must be (T, M={asm.M}, n_tendons), "
                         f"got {controls.shape}")
    if w_ori and plate_traj.shape[-1] < 7:
        raise ValueError("w_ori needs plate_traj rows [p(3), h(4)]")
    T = int(plate_traj.shape[0])

    per_rod = [theta_init(r, fields) for r in _unstack_rods(asm.rods,
                                                            asm.M)]
    theta0 = jax.tree.map(lambda *xs: jnp.stack(xs), *per_rod)
    vec0, _, unpack = _flatten_theta(theta0)
    # Per-rod labels: each theta leaf is (M, *comp) and ravels row-major,
    # so flat index k of a field with ncomp components per rod belongs to
    # rod k//ncomp, component k%ncomp. (A flat 'rod{k}' rename would
    # misattribute multi-component fields like Bbt — rod index must be
    # divided by the component count; pinned by test_sysid.py.)
    labels = []
    for name in sorted(theta0):        # _flatten_theta flattens sorted
        shape = jnp.shape(theta0[name])
        ncomp = int(np.prod(shape[1:])) or 1
        for k in range(int(shape[0]) * ncomp):
            suffix = "" if ncomp == 1 else f"[{k % ncomp}]"
            labels.append(f"rod{k // ncomp}:{name}{suffix}")

    def res_of_vec(v):
        rods_t = jax.vmap(apply_theta)(asm.rods, unpack(v))
        sim = simulate_assembly(asm.replace(rods=rods_t), controls,
                                tol=tol, max_iter=max_iter,
                                differentiable=True, remat=True,
                                solver=solver)
        dp = (sim.plate_pose[:, :3] - plate_traj[:, :3]).reshape(-1)
        parts = [dp / jnp.sqrt(jnp.asarray(3.0 * T, dtype))]
        if w_ori:
            q = sim.plate_pose[:, 3:7]
            qt = plate_traj[:, 3:7]
            q = q * jax.lax.rsqrt(jnp.sum(q * q, -1, keepdims=True)
                                  + 1e-30)
            qt = qt * jax.lax.rsqrt(jnp.sum(qt * qt, -1, keepdims=True)
                                    + 1e-30)
            sign = jnp.sign(jnp.sum(q * qt, -1, keepdims=True))
            dq = (q - jnp.where(sign == 0, 1.0, sign) * qt).reshape(-1)
            # |q - s*qt|^2 = 2(1-|dot|) ~= 1-dot^2 to second order, so
            # sqrt(w_ori/T) makes sum(r^2) match the fit objective's
            # w_ori*mean(1-dot^2) — same curvature, same Fisher weight
            # (a /2T scaling would halve the orientation block).
            parts.append(dq * jnp.sqrt(jnp.asarray(w_ori / T, dtype)))
        return jnp.concatenate(parts)

    @jax.jit
    def gn_parts(v):
        r = res_of_vec(v)
        # HIGHEST matmul precision + dd Gram: same rationale (and the
        # same measured 1e4x default-precision inflation) as the
        # single-rod gn path above.
        with jax.default_matmul_precision("highest"):
            J = jax.jacfwd(res_of_vec)(v)
        hi, lo = dd_gram(J)
        return jnp.sum(r * r), hi, lo

    Lv, hi, lo = gn_parts(vec0)
    H = 2.0 * dd_to_float64(hi, lo)
    return _report_from_hessian(labels, H, float(Lv))
