"""Unit tests for the physics core: quaternion ops, RHS, linalg, shooting."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from knode_cosserat_tpu import make_rod, apply_mod
from knode_cosserat_tpu.core import (rhs, integrate_euler, residual_euler,
                                     newton_solve, implicit_root)
from knode_cosserat_tpu.ops.quaternion import (quat_to_rotmat,
                                               quaternion_to_euler,
                                               quat_spatial_derivative)
from knode_cosserat_tpu.ops.linalg import solve_small, solve_spd_small


# ---------------- quaternion ----------------

def test_quat_to_rotmat_matches_scipy():
    rng = np.random.RandomState(0)
    q = rng.randn(32, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R_ours = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    # scipy expects [x,y,z,w]
    R_scipy = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-12)


def test_quat_to_rotmat_unnormalized_matches_formula():
    """The reference formula divides by h.h, so non-unit quats are handled
    the same way (cosserat_ode.py:132-137)."""
    h = np.array([1.3, -0.2, 0.4, 0.9])
    R = np.asarray(quat_to_rotmat(jnp.asarray(h)))
    h1, h2, h3, h4 = h
    M = np.eye(3) + 2 / np.dot(h, h) * np.array(
        [[-h3**2 - h4**2, h2*h3 - h4*h1, h2*h4 + h3*h1],
         [h2*h3 + h4*h1, -h2**2 - h4**2, h3*h4 - h2*h1],
         [h2*h4 - h3*h1, h3*h4 + h2*h1, -h2**2 - h3**2]])
    np.testing.assert_allclose(R, M, atol=1e-14)


def test_quat_spatial_derivative_matches_matrix_form():
    rng = np.random.RandomState(1)
    u, h = rng.randn(3), rng.randn(4)
    hs = np.asarray(quat_spatial_derivative(jnp.asarray(u), jnp.asarray(h)))
    Om = np.array([[0, -u[0], -u[1], -u[2]],
                   [u[0], 0, u[2], -u[1]],
                   [u[1], -u[2], 0, u[0]],
                   [u[2], u[1], -u[0], 0]])
    np.testing.assert_allclose(hs, 0.5 * Om @ h, atol=1e-14)


def test_quaternion_to_euler_matches_reference_torch():
    """Bit-match the reference Utils/transformations.py convention."""
    import torch
    rng = np.random.RandomState(2)
    q = rng.randn(4, 7)  # reference shape [4, a]
    qt = torch.tensor(q)
    qn = qt / qt.norm(p=2, dim=0, keepdim=True)
    w, x, y, z = qn[0], qn[1], qn[2], qn[3]
    roll = torch.atan2(2*(w*y + x*z), 1 - 2*(y**2 + z**2))
    pitch = torch.asin(torch.clamp(2*(w*z - x*y), -1.0, 1.0))
    yaw = torch.atan2(2*(w*x + y*z), 1 - 2*(x**2 + z**2))
    expect = torch.stack([roll, pitch, yaw], dim=0).numpy()
    ours = np.asarray(quaternion_to_euler(jnp.asarray(q.T))).T
    np.testing.assert_allclose(ours, expect, atol=1e-12)


# ---------------- linalg ----------------

def test_solve_small_random_systems():
    rng = np.random.RandomState(3)
    A = rng.randn(17, 6, 6)
    b = rng.randn(17, 6)
    x = np.asarray(solve_small(jnp.asarray(A), jnp.asarray(b)))
    expect = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(x, expect, rtol=1e-9, atol=1e-9)


def test_solve_small_needs_pivoting():
    A = np.array([[0.0, 1.0], [1.0, 0.0]])
    b = np.array([2.0, 3.0])
    x = np.asarray(solve_small(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, [3.0, 2.0], atol=1e-14)


def test_solve_spd_small():
    rng = np.random.RandomState(4)
    A = rng.randn(6, 6)
    b = rng.randn(6)
    x = np.asarray(solve_spd_small(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-6, atol=1e-8)


# ---------------- RHS ----------------

def _numpy_rhs(p, y, yh, zh, tf):
    """Independent numpy transcription of the paper equations for checking."""
    h, n, m = y[3:7], y[7:10], y[10:13]
    q, w = y[13:16], y[16:19]
    vh, uh = zh[0:3], zh[3:6]
    h1, h2, h3, h4 = h
    R = np.eye(3) + 2 / np.dot(h, h) * np.array(
        [[-h3**2 - h4**2, h2*h3 - h4*h1, h2*h4 + h3*h1],
         [h2*h3 + h4*h1, -h2**2 - h4**2, h3*h4 - h2*h1],
         [h2*h4 - h3*h1, h3*h4 + h2*h1, -h2**2 - h3**2]])
    Kse_inv = np.asarray(p.Kse_c0Bse_inv)
    Kbt_inv = np.asarray(p.Kbt_c0Bbt_inv)
    v = Kse_inv @ (R.T @ n + np.asarray(p.Kse_vstar) - np.asarray(p.Bse) @ vh)
    u = Kbt_inv @ (R.T @ m - np.asarray(p.Bbt) @ uh)
    z = np.hstack([v, u])
    yt = float(p.c0) * y + yh
    zt = float(p.c0) * z + zh
    vt, ut, qt, wt = zt[0:3], zt[3:6], yt[13:16], yt[16:19]
    f = np.asarray(p.rhoAg) - R @ (np.asarray(p.C) * q * np.abs(q)) + tf
    ps = R @ v
    ns = float(p.rhoA) * R @ (np.cross(w, q) + qt) - f
    ms = R @ (np.cross(w, np.asarray(p.rhoJ) @ w) + np.asarray(p.rhoJ) @ wt) \
        - np.cross(ps, n)
    qs = vt - np.cross(u, q) + np.cross(w, v)
    ws = ut - np.cross(u, w)
    Om = np.array([[0, -u[0], -u[1], -u[2]],
                   [u[0], 0, u[2], -u[1]],
                   [u[1], -u[2], 0, u[0]],
                   [u[2], u[1], -u[0], 0]])
    hs = 0.5 * Om @ h
    return np.hstack([ps, hs, ns, ms, qs, ws]), z


def test_rhs_against_numpy_transcription():
    p = apply_mod(None)
    rng = np.random.RandomState(5)
    for _ in range(5):
        y = rng.randn(19) * 0.1
        y[3] += 1.0
        yh = rng.randn(19)
        zh = rng.randn(6)
        tf = rng.randn(3)
        ys_np, z_np = _numpy_rhs(p, y, yh, zh, tf)
        ys, z = rhs(p, jnp.asarray(y), jnp.asarray(yh), jnp.asarray(zh),
                    jnp.asarray(tf))
        np.testing.assert_allclose(np.asarray(ys), ys_np, rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(z), z_np, rtol=1e-8, atol=1e-8)


def test_rhs_broadcasts_over_batch():
    p = apply_mod(None)
    rng = np.random.RandomState(6)
    y = rng.randn(4, 7, 19) * 0.1
    y[..., 3] += 1.0
    yh = rng.randn(4, 7, 19)
    zh = rng.randn(4, 7, 6)
    tf = rng.randn(3)
    ys, z = rhs(p, jnp.asarray(y), jnp.asarray(yh), jnp.asarray(zh),
                jnp.asarray(tf))
    assert ys.shape == (4, 7, 19) and z.shape == (4, 7, 6)
    ys0, z0 = rhs(p, jnp.asarray(y[2, 3]), jnp.asarray(yh[2, 3]),
                  jnp.asarray(zh[2, 3]), jnp.asarray(tf))
    np.testing.assert_allclose(np.asarray(ys)[2, 3], np.asarray(ys0),
                               rtol=1e-12)


def test_rhs_vmap_equals_broadcast():
    p = apply_mod(None)
    rng = np.random.RandomState(7)
    y = jnp.asarray(rng.randn(8, 19) * 0.1).at[:, 3].add(1.0)
    yh = jnp.asarray(rng.randn(8, 19))
    zh = jnp.asarray(rng.randn(8, 6))
    tf = jnp.asarray(rng.randn(3))
    ys_b, z_b = rhs(p, y, yh, zh, tf)
    ys_v, z_v = jax.vmap(lambda a, b, c: rhs(p, a, b, c, tf))(y, yh, zh)
    np.testing.assert_allclose(np.asarray(ys_b), np.asarray(ys_v), rtol=1e-12)


# ---------------- shooting ----------------

def test_newton_scalarish_system():
    def f(x):
        return jnp.stack([x[0] ** 3 - 2.0, x[1] - x[0]])
    x, stats = newton_solve(f, jnp.array([1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(x), [2 ** (1 / 3)] * 2, rtol=1e-10)
    assert bool(stats.converged)


def test_newton_solves_rod_step():
    p = apply_mod(None)
    from knode_cosserat_tpu.core.stepper import initial_state
    y0, z0 = initial_state(p)
    yh = p.c1 * y0 + p.c2 * y0
    zh = p.c1 * z0 + p.c2 * z0
    tf = jnp.asarray(np.array([6.0, 5.0, 4.0, 5.0])) @ p.tendon_dirs
    res = lambda G: residual_euler(p, G, yh, zh, tf)
    G, stats = newton_solve(res, jnp.zeros(6, y0.dtype))
    assert bool(stats.converged), float(stats.residual_norm)
    assert float(stats.residual_norm) < 1e-8


def test_implicit_root_gradients():
    """d(root)/d(param) through lax.custom_root matches finite differences."""
    def make_res(a):
        return lambda x: jnp.stack([x[0] ** 2 - a, x[1] - 3 * x[0]])

    def root0(a):
        return implicit_root(make_res(a), jnp.array([1.0, 1.0]))[0]

    a0 = 2.0
    g = jax.grad(root0)(a0)
    eps = 1e-6
    fd = (root0(a0 + eps) - root0(a0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_simulate_vmap_batch():
    """Batched rollouts via vmap match individual rollouts."""
    from knode_cosserat_tpu import calc_controls, simulate
    from knode_cosserat_tpu.core.stepper import simulate_scan
    p = apply_mod(None)
    ctls = np.stack([calc_controls("sine", 1.0, float(p.del_t), 8),
                     calc_controls("step", 1.0, float(p.del_t), 8)])
    batched = jax.vmap(lambda c: simulate_scan(p, c).traj)(jnp.asarray(ctls))
    for i in range(2):
        single = np.asarray(simulate(p, ctls[i]))
        np.testing.assert_allclose(np.asarray(batched)[i], single,
                                   rtol=1e-9, atol=1e-9)
