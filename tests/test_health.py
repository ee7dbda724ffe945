"""Failure-detection subsystem tests."""
import jax.numpy as jnp
import numpy as np

from knode_cosserat_tpu import apply_mod, calc_controls
from knode_cosserat_tpu.core.stepper import simulate_scan
from knode_cosserat_tpu.utils.health import (GuardedTraining, check_rollout)


def test_healthy_rollout_reports_ok():
    p = apply_mod(None)
    out = simulate_scan(p, jnp.asarray(calc_controls("sine", 1.0,
                                                     float(p.del_t), 10)))
    rep = check_rollout(out)
    assert rep.ok, str(rep)
    assert rep.max_newton_iters <= 10
    assert "OK" in str(rep)


def test_unhealthy_rollout_detected():
    p = apply_mod(None)
    out = simulate_scan(p, jnp.asarray(calc_controls("sine", 1.0,
                                                     float(p.del_t), 6)))
    # forge a failure: inject NaN + a residual spike
    traj = np.asarray(out.traj).copy()
    traj[3, 0, 0] = np.nan
    res = np.asarray(out.residuals).copy()
    res[4] = 1.0
    forged = out._replace(traj=traj, residuals=res)
    rep = check_rollout(forged)
    assert not rep.ok
    assert 3 in rep.nan_steps and 4 in rep.bad_steps


def test_guarded_training_rolls_back():
    params = {"w": np.ones(3)}
    opt = {"m": np.zeros(3)}
    guard = GuardedTraining(params, opt, divergence_factor=10,
                            snapshot_every=1)
    # healthy step (snapshots new params)
    p2 = {"w": np.full(3, 2.0)}
    p2, opt, reset = guard.update(p2, opt, 1.0)
    assert not reset
    # divergence: loss explodes -> rollback to snapshot
    p3 = {"w": np.full(3, 99.0)}
    p3, opt, reset = guard.update(p3, opt, 1e9)
    assert reset
    np.testing.assert_array_equal(p3["w"], np.full(3, 2.0))
    # NaN loss also triggers
    p4, opt, reset = guard.update({"w": np.zeros(3)}, opt, float("nan"))
    assert reset
    assert guard.resets == 2
