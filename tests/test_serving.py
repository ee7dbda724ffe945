"""AOT-compiled stepper tests (serving path)."""
import jax
import jax.numpy as jnp
import numpy as np

from knode_cosserat_tpu import apply_mod, calc_controls, simulate
from knode_cosserat_tpu.models import MLPSpec, init_mlp
from knode_cosserat_tpu.serving import CompiledStepper


def test_compiled_stepper_matches_simulate():
    p = apply_mod(None)
    stepper = CompiledStepper(p, tol=1e-16, max_iter=50)
    ctl = calc_controls("sine", 1.0, float(p.del_t), 8)
    state = stepper.reset()
    states = [np.asarray(state.y)]
    for t in range(7):
        state, info = stepper.step(state, ctl[t])
        states.append(np.asarray(state.y))
        assert float(info["residual"]) < 1e-6
    traj = np.asarray(simulate(p, ctl))
    np.testing.assert_allclose(np.stack(states), traj[:, :, :19],
                               rtol=1e-8, atol=1e-9)


def test_compiled_stepper_batched_hybrid():
    p = apply_mod("nsw", dtype=jnp.float64)
    spec = MLPSpec.for_knode(16)
    params = jax.tree.map(lambda x: x * 1e-3,
                          init_mlp(spec, jax.random.PRNGKey(0), jnp.float64))
    stepper = CompiledStepper(p, spec=spec, nn_params=params, batch=3)
    state = stepper.reset()
    tensions = np.tile(np.array([6.0, 5.0, 4.0, 5.0]), (3, 1))
    state, info = stepper.step(state, tensions)
    assert state.y.shape == (3, p.N, 19)
    assert np.isfinite(np.asarray(state.y)).all()
    # identical inputs -> identical batch members
    y = np.asarray(state.y)
    np.testing.assert_array_equal(y[0], y[1])
    b = stepper.benchmark(n=5)
    assert b["latency_ms"] > 0 and np.isfinite(b["realtime_factor"])
    # the dispatch floor (trivial-program round trip) bounds the step
    # latency from below up to timing noise
    assert 0 < b["dispatch_floor_ms"] < b["latency_ms"] * 2


def test_compiled_stepper_fast_matches_scan_path():
    p = apply_mod(None)
    slow = CompiledStepper(p, tol=1e-16, max_iter=50)
    fast = CompiledStepper(p, tol=1e-16, max_iter=50, fast=True,
                           fast_impl="xla")
    ctl = calc_controls("sine", 1.0, float(p.del_t), 5)
    s1, s2 = slow.reset(), fast.reset()
    for t in range(4):
        s1, _ = slow.step(s1, ctl[t])
        s2, info = fast.step(s2, ctl[t])
        assert float(info["residual"]) < 1e-7
    np.testing.assert_allclose(np.asarray(s2.y), np.asarray(s1.y),
                               rtol=1e-9, atol=1e-9)
