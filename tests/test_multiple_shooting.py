"""Parallel-in-space Newton (core/multiple_shooting.py).

The converged multiple-shooting solution satisfies the same discrete
equations as the sequential sweep (continuity closed to solver
tolerance), so rollouts must match core/stepper.simulate_scan to Newton
precision — physics and hybrid both.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu.controls import calc_controls
from knode_cosserat_tpu.core.multiple_shooting import (ms_solve_step,
                                                       simulate_scan_ms)
from knode_cosserat_tpu.core.params import make_rod
from knode_cosserat_tpu.core.stepper import simulate_scan
from knode_cosserat_tpu.models.mlp import MLPSpec, bind, init_mlp

T = 12


@pytest.fixture(scope="module")
def rod17():
    return make_rod(N=17, dtype=jnp.float64)


@pytest.fixture(scope="module")
def ctl(rod17):
    return jnp.asarray(calc_controls("sine", 0.5, float(rod17.del_t), T),
                       jnp.float64)


@pytest.mark.parametrize("solver", ["structured", "dense"])
def test_physics_rollout_matches_sequential(rod17, ctl, solver):
    ref = simulate_scan(rod17, ctl, tol=1e-24)
    for S in (2, 4, 8):
        out = jax.jit(lambda c: simulate_scan_ms(rod17, c, S, tol=1e-24,
                                                 solver=solver))(ctl)
        err = np.max(np.abs(np.asarray(out.traj) - np.asarray(ref.traj)))
        assert err < 1e-9, (S, err, solver)
        assert np.asarray(out.residuals).max() < 1e-10


def test_invalid_segment_count_raises(rod17, ctl):
    with pytest.raises(ValueError):
        simulate_scan_ms(rod17, ctl, 5)  # 5 does not divide N-1=16


def test_hybrid_rollout_matches_sequential(rod17, ctl):
    spec = MLPSpec.for_knode(16, False, "elu")
    params = init_mlp(spec, jax.random.PRNGKey(3), jnp.float64)
    # shrink the random residual so the hybrid rollout stays stable
    params = jax.tree.map(lambda x: 0.01 * x, params)
    nn_fn = bind(spec, params)
    ref = simulate_scan(rod17, ctl, nn_fn=nn_fn, tol=1e-24)
    for solver in ("structured", "dense"):
        out = jax.jit(lambda c: simulate_scan_ms(
            rod17, c, 4, nn_fn=nn_fn, tol=1e-24, solver=solver))(ctl)
        err = np.max(np.abs(np.asarray(out.traj) - np.asarray(ref.traj)))
        assert err < 1e-9, (solver, err)


def test_structured_assoc_scan_branch_matches_sequential():
    """S >= 33 takes the log-depth associative_scan prefix — pin its parity
    against the sequential sweep on a fine rod (m=1 segments included)."""
    rod = make_rod(N=65, dtype=jnp.float64)
    ctl = jnp.asarray(calc_controls("sine", 0.5, float(rod.del_t), 8),
                      jnp.float64)
    ref = simulate_scan(rod, ctl, tol=1e-24)
    for S in (32, 64):
        out = jax.jit(lambda c, S=S: simulate_scan_ms(
            rod, c, S, tol=1e-24, solver="structured"))(ctl)
        err = np.max(np.abs(np.asarray(out.traj) - np.asarray(ref.traj)))
        assert err < 1e-9, (S, err)


def test_single_step_warmstart_converges_fast(rod17, ctl):
    """In a warm-started rollout the solver should need very few Newton
    iterations per step (the point of the formulation: few iterations,
    each S-fold shallower than a sequential sweep)."""
    out = jax.jit(lambda c: simulate_scan_ms(rod17, c, 4, tol=1e-20))(ctl)
    iters = np.asarray(out.newton_iters)[1:]
    assert iters.max() <= 10
    assert np.asarray(out.lm_retries).max() == 0


def test_ms_step_vmaps_over_batch(rod17):
    """The whole solve vmaps over a batch axis (time batch / experiment
    grid), like every other solver in the package."""
    y0 = np.zeros((17, 19))
    y0[:, 2] = np.linspace(0, float(rod17.L), 17)
    y0[:, 3] = 1.0
    z0 = np.zeros((17, 6))
    z0[:, 2] = 1.0
    yh = jnp.asarray(np.stack([y0, y0]))
    zh = jnp.asarray(np.stack([z0, z0]))
    tf = jnp.asarray(np.stack([[0.1, 0.0, -0.05], [0.0, 0.2, -0.05]]))
    X0 = jnp.concatenate([jnp.zeros(6), yh[0][jnp.arange(1, 4) * 4]
                          .reshape(-1)])
    X0 = jnp.stack([X0, X0])
    y, z, X, stats = jax.vmap(
        lambda a, b, c, d: ms_solve_step(rod17, a, b, c, d, 4)
    )(yh, zh, tf, X0)
    assert y.shape == (2, 17, 19)
    assert np.all(np.asarray(stats.converged))
