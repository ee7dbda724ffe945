"""Robustness fuzzing: random-but-physical rod parameters and tension
schedules must roll out finite with converged shooting solves."""
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu import make_rod
from knode_cosserat_tpu.core.stepper import simulate_scan
from knode_cosserat_tpu.utils.health import check_rollout


@pytest.mark.parametrize("seed", range(4))
def test_random_rod_rollouts_healthy(seed):
    rng = np.random.RandomState(seed)
    p = make_rod(
        N=int(rng.choice([8, 10, 16])),
        L=float(rng.uniform(0.3, 0.8)),
        E=float(10 ** rng.uniform(9.3, 11.0)),
        r=float(rng.uniform(0.001, 0.004)),
        rho=float(rng.uniform(1000, 8000)),
        del_t=float(rng.choice([0.01, 0.05])),
        Bbt=np.diag([10 ** rng.uniform(-3, -0.5)] * 3),
    )
    T = 12
    tensions = rng.uniform(2.0, 8.0, size=(T, 4))
    out = simulate_scan(p, jnp.asarray(tensions))
    rep = check_rollout(out, residual_tol=1e-5)
    assert rep.ok, str(rep)
    traj = np.asarray(out.traj)
    # rod stays near its physical length (positions bounded)
    assert np.abs(traj[:, :, :3]).max() < 2 * float(p.L)


def test_extreme_tensions_still_converge():
    p = make_rod()
    tensions = np.zeros((8, 4))
    tensions[:, 0] = 25.0  # hard one-sided pull
    out = simulate_scan(p, jnp.asarray(tensions))
    rep = check_rollout(out, residual_tol=1e-5)
    assert rep.ok, str(rep)


def test_zero_tension_is_gravity_sag_only():
    p = make_rod()
    out = simulate_scan(p, jnp.zeros((6, 4)))
    rep = check_rollout(out, residual_tol=1e-6)
    assert rep.ok
    traj = np.asarray(out.traj)
    # without tendon asymmetry the rod stays in near-vertical configuration
    assert np.abs(traj[-1, -1, 0:2]).max() < 0.05


def test_newton_stall_rescued_by_lm_escalation():
    """Tier-2 solver robustness (replaces the reference's scipy L-BFGS-B
    fallback, knode.py:91-94): a residual where the undamped Newton step
    diverges (atan with |x0| > ~1.39 and no backtracking) must still
    converge via the Levenberg-Marquardt escalation — and the failure mode
    without escalation must be the old stall."""
    import jax.numpy as jnp
    from knode_cosserat_tpu.core.shooting import newton_solve

    res = jnp.arctan  # elementwise on (6,): classic Newton divergence
    G0 = jnp.full(6, 3.0)

    # plain Newton (no escalation budget, full steps only) stalls
    _, stats_plain = newton_solve(res, G0, tol=1e-20, max_iter=50,
                                  max_backtracks=0, max_escalations=0)
    assert not bool(stats_plain.converged)

    # LM escalation rescues the same solve
    G, stats = newton_solve(res, G0, tol=1e-20, max_iter=50,
                            max_backtracks=0)
    assert bool(stats.converged), float(stats.residual_norm)
    assert int(stats.lm_retries) > 0
    np.testing.assert_allclose(np.asarray(G), 0.0, atol=1e-9)


def test_lm_escalation_does_not_change_healthy_solves():
    """On a well-behaved rollout the LM term must stay at zero: same
    trajectory, zero retries."""
    from knode_cosserat_tpu import apply_mod, calc_controls
    p = apply_mod(None)
    ctl = calc_controls("sine", 1.0, float(p.del_t), 20)
    out = simulate_scan(p, jnp.asarray(ctl))
    rep = check_rollout(out, residual_tol=1e-6)
    assert rep.ok, str(rep)
    assert rep.lm_retry_steps == []
    assert int(np.asarray(out.lm_retries).max()) == 0


def test_long_rollout_stays_healthy():
    """Realworld-track rollouts run for hundreds of steps
    (prepare.py: 60 s at del_t=0.05); a 200-step rollout must stay
    converged and bounded."""
    from knode_cosserat_tpu import apply_mod, calc_controls
    p = apply_mod(None)
    ctl = calc_controls("sine", 2.0, float(p.del_t), 200)
    out = simulate_scan(p, jnp.asarray(ctl))
    rep = check_rollout(out, residual_tol=1e-6)
    assert rep.ok, str(rep)
    traj = np.asarray(out.traj)
    assert np.abs(traj[:, :, :3]).max() < 2 * float(p.L)
