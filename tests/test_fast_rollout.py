"""Fast (fused-sweep, FD-Newton) rollout vs the reference-parity XLA path.
Interpret mode on CPU; TPU timing in scripts/bench_rollout.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu import apply_mod, calc_controls
from knode_cosserat_tpu.core.fast_rollout import make_fast_rollout
from knode_cosserat_tpu.core.stepper import simulate_scan
from knode_cosserat_tpu.models import MLPSpec, init_mlp, bind
from knode_cosserat_tpu.ops.pallas_sweep import make_sweep_kernel


def test_sweep_kernel_matches_integrate_euler():
    from knode_cosserat_tpu.core.spatial import integrate_euler, tip_residual
    p = apply_mod(None)
    k = make_sweep_kernel(p, None, block_b=128, interpret=True)
    rng = np.random.RandomState(0)
    B = 5
    G = jnp.asarray(rng.randn(B, 6) * 0.01)
    yh = jnp.asarray(rng.randn(B, p.N, 19))
    zh = jnp.asarray(rng.randn(B, p.N, 6))
    tf = jnp.asarray(rng.randn(B, 3))
    res, y, z = k(G, yh, zh, tf)
    for b in range(B):
        y_ref, z_ref = integrate_euler(p, G[b], yh[b], zh[b], tf[b])
        np.testing.assert_allclose(np.asarray(y[b]), np.asarray(y_ref),
                                   rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(np.asarray(z[b]), np.asarray(z_ref),
                                   rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(np.asarray(res[b]),
                                   np.asarray(tip_residual(p, y_ref)),
                                   rtol=1e-9, atol=1e-10)


def test_sweep_kernel_with_nn():
    from knode_cosserat_tpu.core.spatial import integrate_euler
    p = apply_mod(None, dtype=jnp.float32)
    spec = MLPSpec.for_knode(16)
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)
    k = make_sweep_kernel(p, spec, block_b=128, interpret=True)
    rng = np.random.RandomState(1)
    B = 3
    G = jnp.asarray(rng.randn(B, 6) * 0.01, jnp.float32)
    yh = jnp.asarray(rng.randn(B, p.N, 19), jnp.float32)
    zh = jnp.asarray(rng.randn(B, p.N, 6), jnp.float32)
    tf = jnp.asarray(rng.randn(B, 3), jnp.float32)
    res, y, z = k(G, yh, zh, tf, params)
    for b in range(B):
        y_ref, _ = integrate_euler(p, G[b], yh[b], zh[b], tf[b],
                                   nn_fn=bind(spec, params))
        np.testing.assert_allclose(np.asarray(y[b]), np.asarray(y_ref),
                                   rtol=2e-4, atol=2e-4)


def test_fast_rollout_driver_matches_simulate_scan():
    """The FD-Newton driver (impl='xla' so CPU tests run in seconds; the
    pallas sweep itself is pinned equal to integrate_euler above) produces
    the same trajectories as the autodiff-Jacobian scan rollout."""
    p = apply_mod(None)
    roll = jax.jit(make_fast_rollout(p, tol=1e-16, impl="xla"))
    ctls = np.stack([calc_controls("sine", 1.0, float(p.del_t), 8),
                     calc_controls("step", 1.0, float(p.del_t), 8)])
    traj, res, iters = roll(jnp.asarray(ctls))
    assert traj.shape == (2, 8, p.N, 50)
    assert float(jnp.max(res)) < 1e-6
    for i in range(2):
        ref = np.asarray(simulate_scan(p, jnp.asarray(ctls[i])).traj)
        # central-difference Newton converges to the same root as the
        # autodiff path to near machine precision
        np.testing.assert_allclose(np.asarray(traj[i]), ref, rtol=1e-9,
                                   atol=5e-10)


def test_fast_rollout_driver_hybrid():
    p = apply_mod("nsw")
    spec = MLPSpec.for_knode(8)
    params = jax.tree.map(lambda x: x * 1e-3,
                          init_mlp(spec, jax.random.PRNGKey(0), jnp.float64))
    roll = jax.jit(make_fast_rollout(p, spec=spec, tol=1e-16, impl="xla"))
    ctls = np.stack([calc_controls("sine", 1.0, float(p.del_t), 6)])
    traj, res, iters = roll(jnp.asarray(ctls), params)
    ref = np.asarray(simulate_scan(p, jnp.asarray(ctls[0]),
                                   nn_fn=bind(spec, params)).traj)
    np.testing.assert_allclose(np.asarray(traj[0]), ref, rtol=1e-9,
                               atol=1e-10)


def test_sweep_kernel_rk4_matches_integrate_rk4():
    from knode_cosserat_tpu.core.spatial import integrate_rk4
    p = apply_mod(None)
    k = make_sweep_kernel(p, None, block_b=128, interpret=True,
                          method="rk4")
    rng = np.random.RandomState(2)
    B = 3
    G = jnp.asarray(rng.randn(B, 6) * 0.01)
    yh = jnp.asarray(rng.randn(B, p.N, 19))
    zh = jnp.asarray(rng.randn(B, p.N, 6))
    tf = jnp.asarray(rng.randn(B, 3))
    res, y, z = k(G, yh, zh, tf)
    for b in range(B):
        yh_int = 0.5 * (yh[b][:-1] + yh[b][1:])
        zh_int = 0.5 * (zh[b][:-1] + zh[b][1:])
        y_ref, z_ref = integrate_rk4(p, G[b], yh[b], zh[b], yh_int, zh_int,
                                     tf[b])
        np.testing.assert_allclose(np.asarray(y[b]), np.asarray(y_ref),
                                   rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(np.asarray(z[b]), np.asarray(z_ref),
                                   rtol=1e-9, atol=1e-10)


def test_fast_rollout_rk4_driver_matches_simulate_scan():
    p = apply_mod(None)
    roll = jax.jit(make_fast_rollout(p, tol=1e-16, impl="xla",
                                     method="rk4"))
    ctls = np.stack([calc_controls("sine", 1.0, float(p.del_t), 6)])
    traj, res, iters = roll(jnp.asarray(ctls))
    ref = np.asarray(simulate_scan(p, jnp.asarray(ctls[0]),
                                   method="rk4").traj)
    np.testing.assert_allclose(np.asarray(traj[0]), ref, rtol=1e-9,
                               atol=5e-10)


def test_mega_step_rollout_matches_simulate_scan():
    """The mega kernel (whole Newton shooting step in ONE pallas_call,
    ops/pallas_step.py) reproduces the autodiff-Jacobian scan rollout.
    Interpret mode on CPU; TPU timing in scripts/bench_fast_rollout.py."""
    p = apply_mod(None)
    roll = jax.jit(make_fast_rollout(p, tol=1e-18, impl="mega", block_b=8,
                                     interpret=True))
    ctls = np.stack([calc_controls("sine", 1.0, float(p.del_t), 8),
                     calc_controls("step", 1.0, float(p.del_t), 8)])
    traj, res, iters = roll(jnp.asarray(ctls))
    assert traj.shape == (2, 8, p.N, 50)
    assert float(jnp.max(res)) < 1e-6
    for i in range(2):
        ref = np.asarray(simulate_scan(p, jnp.asarray(ctls[i])).traj)
        # forward-difference (fd1) Jacobian stalls the line search a hair
        # earlier than the central-difference driver: ~1e-8 floor
        np.testing.assert_allclose(np.asarray(traj[i]), ref, rtol=1e-7,
                                   atol=2e-8)


def test_mega_step_rollout_hybrid():
    """mega kernel with the KNODE MLP residual active."""
    p = apply_mod("nsw")
    spec = MLPSpec.for_knode(8)
    params = jax.tree.map(lambda x: x * 1e-3,
                          init_mlp(spec, jax.random.PRNGKey(0), jnp.float64))
    roll = jax.jit(make_fast_rollout(p, spec=spec, tol=1e-18, impl="mega",
                                     block_b=8, interpret=True))
    ctls = np.stack([calc_controls("sine", 1.0, float(p.del_t), 6)])
    traj, res, iters = roll(jnp.asarray(ctls), params)
    ref = np.asarray(simulate_scan(p, jnp.asarray(ctls[0]),
                                   nn_fn=bind(spec, params)).traj)
    np.testing.assert_allclose(np.asarray(traj[0]), ref, rtol=1e-9,
                               atol=1e-10)


def test_mega_step_rollout_history_net():
    """mega kernel with the 53-input history variant
    (cosserat_ode.py:171-175)."""
    p = apply_mod("nsw")
    spec = MLPSpec.for_knode(8, history=True)
    params = jax.tree.map(lambda x: x * 1e-3,
                          init_mlp(spec, jax.random.PRNGKey(1), jnp.float64))
    roll = jax.jit(make_fast_rollout(p, spec=spec, tol=1e-18, impl="mega",
                                     block_b=8, interpret=True))
    ctls = np.stack([calc_controls("sine", 1.0, float(p.del_t), 6)])
    traj, res, iters = roll(jnp.asarray(ctls), params)
    ref = np.asarray(simulate_scan(p, jnp.asarray(ctls[0]),
                                   nn_fn=bind(spec, params),
                                   nn_history=True).traj)
    np.testing.assert_allclose(np.asarray(traj[0]), ref, rtol=1e-9,
                               atol=1e-10)


def test_mega_step_rollout_rk4():
    """mega kernel with in-kernel RK4 spatial integration matches the
    RK4 scan rollout (history midpoints per knode.py:80-81)."""
    p = apply_mod(None)
    roll = jax.jit(make_fast_rollout(p, tol=1e-18, impl="mega", block_b=8,
                                     interpret=True, method="rk4"))
    ctls = np.stack([calc_controls("sine", 1.0, float(p.del_t), 6)])
    traj, res, iters = roll(jnp.asarray(ctls))
    ref = np.asarray(simulate_scan(p, jnp.asarray(ctls[0]),
                                   method="rk4").traj)
    np.testing.assert_allclose(np.asarray(traj[0]), ref, rtol=1e-6,
                               atol=1e-7)
