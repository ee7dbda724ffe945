"""Failure detection — an aux subsystem the reference lacks (SURVEY.md
section 5; its only failure handling is the firmware e-stop).

Two layers:
  * rollout health: every simulate_scan already returns per-step Newton
    stats; ``check_rollout`` turns them into a structured report
    (non-converged steps, NaN states, residual spikes).
  * training health: ``GuardedTraining`` watches the loss stream for
    NaN/divergence and restores the last good params — cheap elastic
    recovery for long unattended runs.
"""
from __future__ import annotations

import dataclasses
from typing import List

import jax
import numpy as np

__all__ = ["RolloutReport", "check_rollout", "GuardedTraining"]


@dataclasses.dataclass
class RolloutReport:
    ok: bool
    n_steps: int
    bad_steps: List[int]          # residual above tolerance
    nan_steps: List[int]          # non-finite state
    max_residual: float
    max_newton_iters: int
    lm_retry_steps: List[int] = dataclasses.field(default_factory=list)

    def __str__(self):
        s = "OK" if self.ok else "UNHEALTHY"
        return (f"rollout {s}: {self.n_steps} steps, "
                f"max residual {self.max_residual:.2e}, "
                f"max newton iters {self.max_newton_iters}, "
                f"{len(self.bad_steps)} non-converged, "
                f"{len(self.nan_steps)} non-finite, "
                f"{len(self.lm_retry_steps)} LM-rescued")


def check_rollout(sim_output, residual_tol: float = 1e-4) -> RolloutReport:
    """Inspect a SimOutput for solver failures."""
    res = np.asarray(sim_output.residuals)
    iters = np.asarray(sim_output.newton_iters)
    traj = np.asarray(sim_output.traj)
    finite = np.isfinite(traj).all(axis=(1, 2))
    bad = np.where(res > residual_tol)[0]
    nans = np.where(~finite)[0]
    lm = (np.asarray(sim_output.lm_retries)
          if getattr(sim_output, "lm_retries", None) is not None
          else np.zeros(0, np.int32))
    return RolloutReport(
        ok=(len(bad) == 0 and len(nans) == 0),
        n_steps=traj.shape[0],
        bad_steps=bad.tolist(),
        nan_steps=nans.tolist(),
        max_residual=float(res.max()) if len(res) else 0.0,
        max_newton_iters=int(iters.max()) if len(iters) else 0,
        lm_retry_steps=np.where(lm > 0)[0].tolist(),
    )


class GuardedTraining:
    """Loss-stream watchdog with parameter rollback.

    Usage:
        guard = GuardedTraining(params, opt_state)
        for ...:
            params, opt_state, loss = step(...)
            params, opt_state, reset = guard.update(params, opt_state, loss)
    """

    def __init__(self, params, opt_state, divergence_factor: float = 1e3,
                 snapshot_every: int = 50, forget: float = 1.0):
        self._snap = (jax.tree.map(np.asarray, params),
                      jax.tree.map(np.asarray, opt_state))
        self.best_loss = np.inf
        self.divergence_factor = divergence_factor
        self.snapshot_every = snapshot_every
        # ``forget`` > 1 relaxes the divergence reference geometrically on
        # every ROLLED-BACK update. For offline training on a fixed dataset
        # (stationary loss landscape) the default 1.0 keeps the lifetime-best
        # reference. For ONLINE streams the plant itself may change (material
        # softening, payload pickup): the windowed loss then jumps for a
        # legitimate reason and a lifetime-best reference would veto every
        # subsequent update, freezing the learner at the stale snapshot
        # forever. With forget=f, a sustained regime change that raises the
        # loss J-fold over the best is accepted after ceil(log(J/factor)/
        # log(f)) rollbacks, while a single-step NaN/explosion still always
        # rolls back first.
        self.forget = forget
        self._since_snap = 0
        self.resets = 0

    def update(self, params, opt_state, loss):
        loss = float(loss)
        diverged = (not np.isfinite(loss)) or (
            np.isfinite(self.best_loss)
            and loss > self.best_loss * self.divergence_factor)
        if diverged:
            self.resets += 1
            if np.isfinite(self.best_loss):
                self.best_loss *= self.forget
            params = jax.tree.map(lambda x: x, self._snap[0])
            opt_state = jax.tree.map(lambda x: x, self._snap[1])
            return params, opt_state, True
        self.best_loss = min(self.best_loss, loss)
        self._since_snap += 1
        if self._since_snap >= self.snapshot_every:
            self._snap = (jax.tree.map(np.asarray, params),
                          jax.tree.map(np.asarray, opt_state))
            self._since_snap = 0
        return params, opt_state, False
