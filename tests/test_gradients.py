"""Formal gradient checks (jax.test_util.check_grads) on the differentiable
surfaces: the RHS, the teacher-forced loss, and the spatial sweep —
replacing the reference's implicit trust in torch autograd (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from knode_cosserat_tpu import apply_mod
from knode_cosserat_tpu.core import integrate_euler, rhs
from knode_cosserat_tpu.models import MLPSpec, bind, init_mlp
from knode_cosserat_tpu.training import (make_training_data,
                                         teacher_forced_loss)


def _state(rng):
    y = rng.randn(19) * 0.1
    y[3] += 1.0
    return (jnp.asarray(y), jnp.asarray(rng.randn(19)),
            jnp.asarray(rng.randn(6)), jnp.asarray(rng.randn(3)))


def test_rhs_grads():
    p = apply_mod(None)
    rng = np.random.RandomState(0)
    y, yh, zh, tf = _state(rng)
    f = lambda a, b, c, d: jnp.sum(jnp.stack(
        [x.sum() for x in rhs(p, a, b, c, d)]))
    check_grads(f, (y, yh, zh, tf), order=1, modes=("fwd", "rev"),
                atol=1e-4, rtol=1e-4)


def test_spatial_sweep_grads_wrt_G():
    p = apply_mod(None)
    rng = np.random.RandomState(1)
    from knode_cosserat_tpu.core.stepper import initial_state
    y0, z0 = initial_state(p)
    yh = p.c1 * y0 + p.c2 * y0
    zh = p.c1 * z0 + p.c2 * z0
    tf = jnp.asarray(rng.randn(3) * 0.1)

    def f(G):
        y, z = integrate_euler(p, G, yh, zh, tf)
        return jnp.sum(y[-1] ** 2)

    check_grads(f, (jnp.asarray(rng.randn(6) * 0.01),), order=1,
                modes=("fwd", "rev"), atol=1e-4, rtol=1e-4)


def test_loss_grads_wrt_nn_params():
    ref = apply_mod(None)
    p_mod = apply_mod("youngs")
    trajs, ctls = make_training_data(ref, [("sine", 0.5)], train_len=5)
    spec = MLPSpec.for_knode(8)
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float64)
    f = lambda q: teacher_forced_loss(p_mod, spec, q, trajs[0], ctls[0])
    check_grads(f, (params,), order=1, modes=("rev",), atol=5e-3, rtol=5e-3)
