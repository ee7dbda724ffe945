"""Differentiable-rollout tests: gradients through the SOLVED trajectory via
the implicit function theorem — a capability the reference lacks entirely
(its training only differentiates the teacher-forced one-step path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu import apply_mod, calc_controls
from knode_cosserat_tpu.core.stepper import simulate_scan
from knode_cosserat_tpu.models import MLPSpec, bind, init_mlp


def _tip_x_after_rollout(p, controls, differentiable=True, remat=False,
                         nn_fn=None):
    out = simulate_scan(p, controls, nn_fn=nn_fn,
                        differentiable=differentiable, remat=remat)
    return out.traj[-1, -1, 0]  # tip x at final step


def test_rollout_gradient_wrt_gravity_matches_fd():
    p = apply_mod(None)
    controls = jnp.asarray(calc_controls("sine", 1.0, float(p.del_t), 6))

    @jax.jit
    def f(gz):
        q = p.replace(g=jnp.asarray([0.0, 0.0, gz]),
                      rhoAg=p.rhoA * jnp.asarray([0.0, 0.0, gz]))
        return _tip_x_after_rollout(q, controls)

    g = jax.jit(jax.grad(f))(-9.81)
    eps = 1e-4
    fd = (f(-9.81 + eps) - f(-9.81 - eps)) / (2 * eps)
    assert float(g) == pytest.approx(float(fd), rel=1e-4)


def test_rollout_gradient_wrt_nn_weights():
    p = apply_mod(None)
    spec = MLPSpec.for_knode(8)
    params = jax.tree.map(lambda x: x * 1e-3,
                          init_mlp(spec, jax.random.PRNGKey(0), jnp.float64))
    controls = jnp.asarray(calc_controls("sine", 1.0, float(p.del_t), 5))

    @jax.jit
    def f(q):
        return _tip_x_after_rollout(p, controls, nn_fn=bind(spec, q))

    g = jax.jit(jax.grad(f))(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0

    # finite-difference spot check on one weight entry
    eps = 1e-6
    def perturb(q, d):
        q0 = jax.tree.map(lambda x: x, q)
        w = q0[0]["w"].at[0, 0].add(d)
        return (dict(w=w, b=q0[0]["b"]),) + tuple(q0[1:])
    fd = (f(perturb(params, eps)) - f(perturb(params, -eps))) / (2 * eps)
    assert float(g[0]["w"][0, 0]) == pytest.approx(float(fd), rel=1e-3,
                                                   abs=1e-8)


def test_remat_rollout_gradient_matches_plain():
    p = apply_mod(None)
    controls = jnp.asarray(calc_controls("sine", 1.0, float(p.del_t), 5))

    # derive() is host-side; differentiate w.r.t. a traced tip force
    from functools import partial

    @partial(jax.jit, static_argnames="remat")
    def g(F, remat=False):
        q = p.replace(F_tip=jnp.asarray([F, 0.0, 0.0]))
        return _tip_x_after_rollout(q, controls, remat=remat)

    g_plain = jax.jit(jax.grad(g))(0.1)
    g_remat = jax.jit(jax.grad(lambda F: g(F, remat=True)))(0.1)
    assert float(g_plain) == pytest.approx(float(g_remat), rel=1e-10)
    eps = 1e-5
    fd = (g(0.1 + eps) - g(0.1 - eps)) / (2 * eps)
    assert float(g_plain) == pytest.approx(float(fd), rel=1e-4)
