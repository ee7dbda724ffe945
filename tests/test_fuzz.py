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
