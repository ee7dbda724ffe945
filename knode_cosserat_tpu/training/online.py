"""Online KNODE adaptation: streaming residual learning on device.

The reference can only train OFFLINE: collect a dataset, then fit
(physics_train.py drives the whole run from saved trajectories;
train_segment.py likewise for real data). This module closes the loop —
telemetry streams in one step at a time (full-state records + the
applied tendon tensions, e.g. from the SIL twin via realworld/estimate
or straight from a digital-twin rollout), a ring buffer keeps the last
``window`` steps, and every ``update()`` runs a few jitted optax steps
of the SAME teacher-forced loss the offline trainer uses
(training/loss.py, reference loss physics_train.py:345-352) on that
window. The adapted weights can be handed live to control/mpc.py's
``MPCController`` (``nn_params`` is a traced argument of both the
planner and the advance step), so the controller's internal model
improves while it runs — continual "learning on the robot" that the
reference architecture cannot express.

Design notes (TPU-first):
  - The update step is ONE jitted program reused forever: window sizes
    are bucketed (powers of two from min_fill up to window), so at most
    a handful of compiles ever happen and a steady-state stream reuses
    one; update() cost is a few fused MXU matmuls, microseconds on chip.
  - The buffer lives on host as a numpy ring (telemetry arrives from
    IO-land anyway); updates ship one (window, N, 25) block to device.
  - Optimizer state persists across updates (plain Adam — plateau
    scheduling is an offline-length concept), so adaptation composes
    across windows like one long stream.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.params import RodParams
from ..models.mlp import MLPSpec, init_mlp
from ..utils.health import GuardedTraining
from .loss import DEFAULT_KEYPOINTS_FAST, teacher_forced_loss
from .sysid import apply_theta, theta_init, theta_values
from .train import make_train_step

__all__ = ["OnlineConfig", "OnlineAdapter", "OnlineSysIdConfig",
           "OnlineSysId"]


class _TelemetryRing:
    """Host-side telemetry ring buffer shared by the online learners:
    full-state records + applied tensions, power-of-two window bucketing
    so the jitted update step compiles a handful of times ever (see
    OnlineAdapter docstring for why padding instead would teach wrong
    physics)."""

    def __init__(self, p: RodParams, window: int, min_fill: int):
        if min_fill < 3:
            raise ValueError("min_fill must be >= 3 (the first transition "
                             "is dropped — see skip_first — so the loss "
                             "needs at least two)")
        if min_fill > window:
            raise ValueError("min_fill cannot exceed window")
        self._window = window
        self._min_fill = min_fill
        N = int(p.N)
        self._n_tendons = int(getattr(p, "n_tendons", 4))
        self._dtype = np.dtype(np.asarray(p.del_t).dtype)
        self._traj = np.zeros((window, N, 25), self._dtype)
        self._ctrl = np.zeros((window, self._n_tendons), self._dtype)
        self._head = 0              # next write slot
        self._count = 0             # total observed (saturates at window)

    def observe(self, record: np.ndarray, control: np.ndarray) -> None:
        """Append one telemetry step.

        record: (N, >=25) full state [y(19), z(6), ...] — the leading 25
          channels of the simulator's record rows, or realworld/estimate
          output. Extra channels (yh/zh in 50-wide records) are ignored.
        control: (n_tendons,) applied tendon tensions for this step.
        """
        rec = np.asarray(record, self._dtype)
        if rec.ndim != 2 or rec.shape[0] != self._traj.shape[1] \
                or rec.shape[1] < 25:
            raise ValueError(f"record shape {rec.shape} incompatible with "
                             f"(N={self._traj.shape[1]}, >=25)")
        u = np.asarray(control, self._dtype)
        if u.shape != (self._n_tendons,):
            raise ValueError(f"control shape {u.shape} != "
                             f"({self._n_tendons},) — a scalar would "
                             "silently broadcast into every tendon slot")
        self._traj[self._head] = rec[:, :25]
        self._ctrl[self._head] = u
        self._head = (self._head + 1) % self._window
        self._count = min(self._count + 1, self._window)

    def reset_buffer(self) -> None:
        """Drop buffered telemetry (e.g. across a known discontinuity —
        a re-rig, a payload swap) without touching learned state."""
        self._head = 0
        self._count = 0

    @property
    def ready(self) -> bool:
        return self._count >= self._min_fill

    def _bucket(self) -> int:
        """Largest power-of-two multiple of min_fill that fits the current
        fill (capped at window)."""
        if self._count >= self._window:
            return self._window
        b = self._min_fill
        while b * 2 <= self._count:
            b *= 2
        return min(b, self._window)

    def _ordered_window(self):
        """The most recent ``_bucket()`` frames, oldest-first."""
        W = self._window
        b = self._bucket()
        if self._count < W:
            t = self._traj[self._count - b: self._count]
            c = self._ctrl[self._count - b: self._count]
        else:
            idx = (np.arange(W - b, W) + self._head) % W
            t, c = self._traj[idx], self._ctrl[idx]
        return t, c


@dataclasses.dataclass
class OnlineConfig:
    """Knobs for streaming adaptation (deliberately smaller than
    TrainConfig: no eval loop, no plateau schedule, no checkpoint cadence
    — the caller owns the outer loop)."""
    window: int = 64            # ring-buffer length (time steps)
    min_fill: int = 8           # steps required before update() trains
    steps_per_update: int = 4   # optax steps per update() call
    lr: float = 1e-3
    # decoupled weight decay (AdamW). Online windows are small and the
    # free-rollout stability of the hybrid depends on the residual staying
    # small off-distribution; a little decay is the cheap regularizer.
    weight_decay: float = 1e-4
    hidden: int = 64
    keypoints: Tuple[int, ...] = DEFAULT_KEYPOINTS_FAST
    history: bool = False
    activation: str = "elu"
    clamp_weights: bool = True
    seed: int = 0
    # ----- handoff safety (the online -> MPC seam). guard=True wires a
    # GuardedTraining watchdog into the loss stream (NaN / divergence ->
    # rollback to the last snapshot) AND certifies weights before they are
    # exposed for controller handoff: an H-step FREE rollout of the hybrid
    # from the newest telemetry (exactly what a receding-horizon planner
    # consumes) must stay finite with the tip inside a physical trust
    # region, and the hybrid's windowed loss must actually beat the
    # physics-only baseline. Uncertified updates never reach
    # ``certified_params`` / ``handoff_to``.
    guard: bool = True
    probe_horizon: int = 10          # free-rollout probe length (steps)
    tip_radius_factor: float = 2.0   # tip must stay within factor * L
    certify_margin: float = 1.0      # require win_loss <= margin * phys_loss
    divergence_factor: float = 1e3   # loss-stream rollback threshold
    snapshot_every: int = 8          # GuardedTraining snapshot cadence
    # relax the divergence reference 10x per rollback: online streams are
    # non-stationary (the PLANT may legitimately change), so a sustained
    # loss jump must eventually be accepted — certification, not the loss
    # watchdog, is what keeps bad weights away from the controller.
    guard_forget: float = 10.0

    def spec(self) -> MLPSpec:
        return MLPSpec.for_knode(self.hidden, self.history, self.activation)


class OnlineAdapter(_TelemetryRing):
    """Streaming KNODE residual learner over a sliding window.

    >>> adapter = OnlineAdapter(model_rod, OnlineConfig())
    >>> for record, u in telemetry:          # record: (N, >=25), u: (4,)
    ...     adapter.observe(record, u)
    ...     if adapter.ready:
    ...         loss = adapter.update()
    >>> controller.nn_params = adapter.params   # live MPC handoff

    ``model_rod`` is the controller's (imperfect) physics; the residual
    learns whatever the telemetry source (the real plant) does that the
    model physics does not — the KNODE premise, applied online.

    The window is BUCKETED to powers of two (one compile per bucket ever
    reached, a handful total) WITHOUT fabricating transitions: padding by
    repeating a frame would teach the residual "this mid-swing state
    stays put" — wrong physics — on every padded row.
    """

    def __init__(self, p: RodParams, cfg: Optional[OnlineConfig] = None):
        self.p = p
        self.cfg = cfg = cfg or OnlineConfig()
        if cfg.steps_per_update < 1:
            raise ValueError("steps_per_update must be >= 1")
        super().__init__(p, cfg.window, cfg.min_fill)
        self.spec = cfg.spec()
        self.params = init_mlp(self.spec, jax.random.PRNGKey(cfg.seed))
        self._optimizer = (optax.adamw(cfg.lr,
                                       weight_decay=cfg.weight_decay)
                           if cfg.weight_decay else optax.adam(cfg.lr))
        self.opt_state = self._optimizer.init(self.params)
        # skip_first: the loss's first transition runs on a fabricated
        # self-prev BDF-2 history — exact for an at-rest traj[0] (offline),
        # wrong for a sliding window starting mid-motion. Drop it; every
        # trained transition then carries a true two-frame history.
        self._step, loss_fn = make_train_step(
            p, self.spec, self._optimizer, cfg.keypoints, cfg.clamp_weights,
            skip_first=True)
        self._loss_fn = jax.jit(loss_fn)   # diagnostics reuse the trace
        self.updates = 0
        self.last_loss: Optional[float] = None
        # --- handoff guard state (see OnlineConfig.guard) ---
        self._guard = (GuardedTraining(self.params, self.opt_state,
                                       cfg.divergence_factor,
                                       cfg.snapshot_every,
                                       forget=cfg.guard_forget)
                       if cfg.guard else None)
        self._certified = None
        self._probe = jax.jit(self._probe_impl) if cfg.guard else None
        self.certified_updates = 0
        self.rejected_updates = 0
        self.last_reject_reason: Optional[str] = None

    # ----------------------------------------------------- handoff guard

    def _probe_impl(self, params, last, prev, ctl):
        """H-step FREE rollout of the hybrid from the newest telemetry
        frames, replaying the window's most recent controls — the quantity
        a receding-horizon planner consumes (control/mpc.rollout_tips).
        Passes iff every predicted tip is finite and stays inside the
        physical trust region ||tip|| <= tip_radius_factor * L (the rod is
        clamped at the origin; a tip outside ~2L is unphysical for any
        admissible strain). Reference analogue being guarded: the offline
        pipeline needs best-DTW selection for the same hybrid-rollout
        fragility (physics_train.py:163-167)."""
        from ..control.mpc import PlanState, rollout_tips
        p = self.p
        st = PlanState(last[:, :19], last[:, 19:25],
                       prev[:, :19], prev[:, 19:25],
                       jnp.zeros(6, p.dtype), jnp.zeros(6, p.dtype))
        tips, _ = rollout_tips(p, st, ctl, self.spec, params)
        radius = self.cfg.tip_radius_factor * jnp.asarray(p.L, p.dtype)
        ok = jnp.all(jnp.isfinite(tips))
        ok &= jnp.max(jnp.linalg.norm(tips, axis=-1)) <= radius
        return ok

    def _certify(self, t, c) -> None:
        """Gate the just-trained weights behind the handoff contract."""
        win = float(self._loss_fn(self.params, t[None], c[None]))
        phys = float(self._loss_fn(None, t[None], c[None]))
        if not np.isfinite(win) or win > self.cfg.certify_margin * phys:
            self.rejected_updates += 1
            self.last_reject_reason = (
                f"window loss {win:.3e} vs physics {phys:.3e} "
                f"(margin {self.cfg.certify_margin})")
            return
        H = min(self.cfg.probe_horizon, t.shape[0] - 1)
        ok = bool(self._probe(self.params, jnp.asarray(t[-1]),
                              jnp.asarray(t[-2]), jnp.asarray(c[-H:])))
        if not ok:
            self.rejected_updates += 1
            self.last_reject_reason = (
                f"free-rollout probe failed over {H} steps "
                f"(non-finite or tip outside "
                f"{self.cfg.tip_radius_factor} * L)")
            return
        self._certified = self.params
        self.certified_updates += 1
        self.last_reject_reason = None

    @property
    def certified_params(self):
        """The last weights that PASSED certification (None until any do).
        This — not ``.params`` — is the sanctioned live-MPC handoff: raw
        ``.params`` may be mid-divergence on an adversarial/noisy window.
        Requires cfg.guard."""
        return self._certified

    def handoff_to(self, controller) -> bool:
        """Assign the last certified weights to a controller (anything with
        an ``nn_params`` attribute, e.g. control.mpc.MPCController).
        Returns False — and leaves the controller untouched — if nothing
        has been certified yet."""
        if self._certified is None:
            return False
        controller.nn_params = self._certified
        return True

    # ----------------------------------------------------------- learn

    def update(self) -> Optional[float]:
        """Run cfg.steps_per_update optax steps on the current window.
        Returns the last step's loss (None if the buffer is not ready).
        The optimizer state carries over — successive updates behave like
        one continuous training stream."""
        if not self.ready:
            return None
        t, c = self._ordered_window()
        trajs, ctrls = t[None], c[None]     # (1, W, N, 25), (1, W, 4)
        for _ in range(self.cfg.steps_per_update):
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, trajs, ctrls)
        self.updates += 1
        self.last_loss = float(loss)
        if self._guard is not None:
            self.params, self.opt_state, reset = self._guard.update(
                self.params, self.opt_state, self.last_loss)
            if reset:
                self.rejected_updates += 1
                self.last_reject_reason = (
                    f"loss stream diverged ({self.last_loss:.3e}); "
                    "rolled back to snapshot")
            else:
                self._certify(t, c)
        return self.last_loss

    def window_loss(self) -> Optional[float]:
        """Teacher-forced loss of the CURRENT weights on the current
        window, without training (use physics_loss() for the no-NN
        baseline)."""
        if not self.ready:
            return None
        t, c = self._ordered_window()
        return float(self._loss_fn(self.params, t[None], c[None]))

    def physics_loss(self) -> Optional[float]:
        """No-NN baseline loss on the current window — the number the
        residual must beat (reference epoch-0 eval quirk analogue)."""
        if not self.ready:
            return None
        t, c = self._ordered_window()
        return float(self._loss_fn(None, t[None], c[None]))


@dataclasses.dataclass
class OnlineSysIdConfig:
    """Knobs for streaming physical-parameter tracking."""
    fields: Tuple[str, ...] = ("E",)
    window: int = 64
    min_fill: int = 8
    steps_per_update: int = 4
    lr: float = 0.05            # log-space Adam — relative steps
    keypoints: Tuple[int, ...] = DEFAULT_KEYPOINTS_FAST
    seed: int = 0
    # loss-stream watchdog (NaN / divergence -> roll theta back); the
    # estimate is interpretable so there is no free-rollout probe here —
    # consumers should sanity-check values() against physical bounds.
    guard: bool = True
    divergence_factor: float = 1e3
    snapshot_every: int = 8
    # see OnlineConfig.guard_forget: the plant drifting IS the use case
    # here (damage detection), so a sustained loss jump must be accepted
    # after a few rollbacks rather than freezing theta at the stale value.
    guard_forget: float = 10.0


class OnlineSysId(_TelemetryRing):
    """Streaming PHYSICAL-PARAMETER tracking over the telemetry window —
    the grey-box sibling of :class:`OnlineAdapter`.

    Where the adapter learns an opaque NN residual for whatever the plant
    does that the model physics does not, this tracks the interpretable
    physical parameters themselves (training/sysid.py machinery: traced
    derived terms + log-space Adam on the same skip_first teacher loss).
    Use it when the plant DRIFTS physically — material softening, payload
    change, temperature — and you want the model to follow AND to read the
    diagnosis off the estimate (e.g. "E dropped 40%": damage detection,
    utils/health's domain-level complement).

    >>> tracker = OnlineSysId(model_rod, OnlineSysIdConfig(fields=("E",)))
    >>> for record, u in telemetry:
    ...     tracker.observe(record, u)
    ...     if tracker.ready:
    ...         tracker.update()
    >>> tracker.values()["E"]        # live estimate
    >>> p_now = tracker.rod          # fully-derived fitted RodParams

    The fitted ``rod`` is an ordinary RodParams pytree with unchanged
    shapes, so jitted consumers that take the rod AS AN ARGUMENT (e.g.
    ``jax.jit(simulate_scan)``) pick it up with no recompile; closures
    that baked the rod in (MPCController binds it at construction) must
    be rebuilt to adopt the new physics.
    """

    def __init__(self, p: RodParams, cfg: Optional[OnlineSysIdConfig] = None):
        self.p = p
        self.cfg = cfg = cfg or OnlineSysIdConfig()
        if cfg.steps_per_update < 1:
            raise ValueError("steps_per_update must be >= 1")
        super().__init__(p, cfg.window, cfg.min_fill)
        self.theta = theta_init(p, cfg.fields)
        self._optimizer = optax.adam(cfg.lr)
        self.opt_state = self._optimizer.init(self.theta)
        spec = MLPSpec.for_knode()
        kp = tuple(cfg.keypoints)

        def loss_fn(theta, traj, ctrl):
            return teacher_forced_loss(apply_theta(p, theta), spec, None,
                                       traj, ctrl, kp, skip_first=True)

        @jax.jit
        def step(theta, opt_state, traj, ctrl):
            val, g = jax.value_and_grad(loss_fn)(theta, traj, ctrl)
            upd, opt_state = self._optimizer.update(g, opt_state, theta)
            return optax.apply_updates(theta, upd), opt_state, val

        self._step = step
        self._loss_fn = jax.jit(loss_fn)
        self._guard = (GuardedTraining(self.theta, self.opt_state,
                                       cfg.divergence_factor,
                                       cfg.snapshot_every,
                                       forget=cfg.guard_forget)
                       if cfg.guard else None)
        self.updates = 0
        self.last_loss: Optional[float] = None
        self.rollbacks = 0

    def update(self) -> Optional[float]:
        """cfg.steps_per_update log-space Adam steps on the current window;
        optimizer state persists — one continuous estimation stream."""
        if not self.ready:
            return None
        t, c = self._ordered_window()
        for _ in range(self.cfg.steps_per_update):
            self.theta, self.opt_state, loss = self._step(
                self.theta, self.opt_state, t, c)
        self.updates += 1
        self.last_loss = float(loss)
        if self._guard is not None:
            self.theta, self.opt_state, reset = self._guard.update(
                self.theta, self.opt_state, self.last_loss)
            self.rollbacks += int(reset)
        return self.last_loss

    def values(self):
        """Current physical-space estimates per tracked field."""
        return theta_values(self.theta)

    @property
    def rod(self) -> RodParams:
        """Fully-derived RodParams at the current estimate."""
        return apply_theta(self.p, self.theta)

    def window_loss(self) -> Optional[float]:
        """Loss of the CURRENT estimate on the window, without training."""
        if not self.ready:
            return None
        t, c = self._ordered_window()
        return float(self._loss_fn(self.theta, t, c))
