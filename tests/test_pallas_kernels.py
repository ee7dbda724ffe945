"""Kernel-generality matrix for the fused Pallas ops (interpret mode):
history (53-input) nets, deep (>=3-layer) MLPs, and the grid-pipelined
sweep lowering vs the static unroll and the XLA path.

Reference coverage being pinned: cosserat_ode.py:171-175 (history input),
physics_train.py:46 (--layers), knode.py:80-81 + cosserat_ode.py:215-255
(RK4 with history midpoints).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu import apply_mod
from knode_cosserat_tpu.core.spatial import (integrate_euler, integrate_rk4,
                                             next_segment_euler,
                                             tip_residual)
from knode_cosserat_tpu.models import MLPSpec, init_mlp, bind
from knode_cosserat_tpu.models.mlp import mlp_apply
from knode_cosserat_tpu.ops.pallas_rhs import make_fused_next_segment
from knode_cosserat_tpu.ops.pallas_sweep import make_sweep_kernel

DT = jnp.float32


def _specs():
    return [
        MLPSpec.for_knode(32, history=True),                 # 53-input
        MLPSpec(dims=(28, 32, 32, 25), activation="elu"),    # 3-layer
        MLPSpec(dims=(53, 16, 16, 16, 25), activation="tanh",
                history=True),                               # deep + history
    ]


def _rhs_data(B=64):
    rng = np.random.RandomState(0)
    y = rng.randn(B, 19) * 0.1
    y[:, 3] += 1.0
    c = lambda a: jnp.asarray(a, DT)
    return (c(y), c(rng.randn(B, 19)), c(rng.randn(B, 6)),
            c(rng.randn(B, 3)))


@pytest.mark.parametrize("spec", _specs(), ids=["hist", "deep", "deep-hist"])
def test_fused_next_segment_general_nets(spec):
    p = apply_mod(None, dtype=DT)
    params = init_mlp(spec, jax.random.PRNGKey(0), DT)
    fused = make_fused_next_segment(p, spec, block_b=128, interpret=True)
    y, yh, zh, tf = _rhs_data()

    yg_f, z_f = fused(params, y, yh, zh, tf)
    yg_j, z_j = next_segment_euler(
        p, y, yh, zh, tf, nn_fn=lambda x: mlp_apply(spec, params, x),
        nn_history=spec.history)
    np.testing.assert_allclose(np.asarray(yg_f), np.asarray(yg_j),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_j),
                               rtol=2e-5, atol=2e-5)


def test_fused_next_segment_history_gradients():
    spec = MLPSpec.for_knode(16, history=True)
    p = apply_mod(None, dtype=DT)
    params = init_mlp(spec, jax.random.PRNGKey(1), DT)
    fused = make_fused_next_segment(p, spec, block_b=128, interpret=True)
    y, yh, zh, tf = _rhs_data(32)

    def loss_fused(q):
        yg, z = fused(q, y, yh, zh, tf)
        return jnp.sum(yg ** 2) + jnp.sum(z ** 2)

    def loss_jax(q):
        yg, z = next_segment_euler(
            p, y, yh, zh, tf, nn_fn=lambda x: mlp_apply(spec, q, x),
            nn_history=True)
        return jnp.sum(yg ** 2) + jnp.sum(z ** 2)

    gf = jax.grad(loss_fused)(params)
    gj = jax.grad(loss_jax)(params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gj)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def _sweep_data(p, B=8):
    rng = np.random.RandomState(2)
    c = lambda a: jnp.asarray(a, DT)
    G = c(rng.randn(B, 6) * 0.01)
    yh = c(rng.randn(B, p.N, 19) * 0.01)
    zh = c(rng.randn(B, p.N, 6) * 0.01)
    tf = c(rng.randn(B, 3))
    return G, yh, zh, tf


# interpret mode on the 1-CPU CI box is slow, and the *unrolled* RK4
# lowering (N-1 nodes x 4 inlined RHS stages) is by far the costliest
# interpret compile — so the default path covers RK4 via pipelined-vs-XLA
# only (test below) and every unrolled-RK4 comparison is marked slow.
_SWEEP_CASES = [
    pytest.param("euler", None, id="euler-phys"),
    pytest.param("euler", MLPSpec.for_knode(16, history=True),
                 id="euler-hist"),
    pytest.param("euler", MLPSpec(dims=(28, 16, 16, 25)), id="euler-deep"),
    pytest.param("rk4", None, id="rk4-phys", marks=pytest.mark.slow),
    pytest.param("rk4", MLPSpec.for_knode(16, history=True), id="rk4-hist",
                 marks=pytest.mark.slow),
]


@pytest.mark.parametrize("method,spec", _SWEEP_CASES)
def test_sweep_pipelined_matches_unrolled(method, spec):
    """Grid-pipelined lowering == static unroll == XLA scan, for the
    physics-only, history-net, and deep-net kernels, Euler and RK4."""
    p = apply_mod(None, dtype=DT)
    params = (init_mlp(spec, jax.random.PRNGKey(3), DT)
              if spec is not None else None)
    G, yh, zh, tf = _sweep_data(p)

    k_pipe = make_sweep_kernel(p, spec, block_b=64, interpret=True,
                               want_rod=True, method=method, pipeline=True)
    k_unroll = make_sweep_kernel(p, spec, block_b=64, interpret=True,
                                 want_rod=True, method=method,
                                 pipeline=False)
    r_p, y_p, z_p = k_pipe(G, yh, zh, tf, params)
    r_u, y_u, z_u = k_unroll(G, yh, zh, tf, params)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_u),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_u),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_u),
                               rtol=1e-6, atol=1e-6)

    # and against the XLA spatial integrators
    nn_fn = (lambda x: mlp_apply(spec, params, x)) if spec else None
    hist = bool(spec and spec.history)

    def one(g, yhh, zhh, tff):
        if method == "euler":
            y, z = integrate_euler(p, g, yhh, zhh, tff, nn_fn, hist)
        else:
            yh_int = 0.5 * (yhh[:-1] + yhh[1:])
            zh_int = 0.5 * (zhh[:-1] + zhh[1:])
            y, z = integrate_rk4(p, g, yhh, zhh, yh_int, zh_int, tff,
                                 nn_fn, hist)
        return tip_residual(p, y), y, z

    r_x, y_x, z_x = jax.vmap(one)(G, yh, zh, tf)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_x),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("spec", [None, MLPSpec.for_knode(8, history=True)],
                         ids=["phys", "hist"])
def test_sweep_rk4_pipelined_matches_xla(spec):
    """Default-path RK4 coverage: the grid-pipelined kernel against the XLA
    integrator (the unrolled kernel compare lives in the slow matrix —
    its interpret compile is minutes on the 1-CPU box). Small N keeps the
    interpret run fast while still exercising >1 pipeline step."""
    p = apply_mod(None, N=4, dtype=DT)
    params = (init_mlp(spec, jax.random.PRNGKey(3), DT)
              if spec is not None else None)
    G, yh, zh, tf = _sweep_data(p, B=4)

    k_pipe = make_sweep_kernel(p, spec, block_b=64, interpret=True,
                               want_rod=True, method="rk4", pipeline=True)
    r_p, y_p, z_p = k_pipe(G, yh, zh, tf, params)

    nn_fn = (lambda x: mlp_apply(spec, params, x)) if spec else None
    hist = bool(spec and spec.history)

    def one(g, yhh, zhh, tff):
        yh_int = 0.5 * (yhh[:-1] + yhh[1:])
        zh_int = 0.5 * (zhh[:-1] + zhh[1:])
        y, z = integrate_rk4(p, g, yhh, zhh, yh_int, zh_int, tff,
                             nn_fn, hist)
        return tip_residual(p, y), y, z

    r_x, y_x, z_x = jax.vmap(one)(G, yh, zh, tf)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_x),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_x),
                               rtol=2e-4, atol=2e-5)


def test_sweep_pipelined_residual_only():
    """want_rod=False pipelined kernel (the Newton probe path) returns the
    same residual as the XLA-validated want_rod=True lowering. (The
    *unrolled* want_rod=False variant is exercised on real TPU by the fast
    rollout; its interpret-mode compile is pathologically slow on the 1-CPU
    box, so it is not rebuilt here.)"""
    p = apply_mod(None, dtype=DT)
    G, yh, zh, tf = _sweep_data(p, B=8)
    k = make_sweep_kernel(p, None, block_b=64, interpret=True,
                          want_rod=False, method="euler", pipeline=True)
    k_ref = make_sweep_kernel(p, None, block_b=64, interpret=True,
                              want_rod=True, method="euler", pipeline=True)
    np.testing.assert_allclose(np.asarray(k(G, yh, zh, tf, None)),
                               np.asarray(k_ref(G, yh, zh, tf, None)[0]),
                               rtol=1e-6, atol=1e-6)


def test_sweep_large_n_pipelined():
    """N=80 (the convergence study's endpoint) through the pipelined
    kernel — the static unroll would be prohibitive to compile on TPU."""
    p = apply_mod(None, N=80, dtype=DT)
    G, yh, zh, tf = _sweep_data(p, B=4)
    k = make_sweep_kernel(p, None, block_b=64, interpret=True,
                          want_rod=True, method="euler")  # auto -> pipelined
    r, y, z = k(G, yh, zh, tf, None)
    assert y.shape == (4, 80, 19) and z.shape == (4, 79, 6)
    assert np.all(np.isfinite(np.asarray(r)))
