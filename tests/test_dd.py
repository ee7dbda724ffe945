"""Double-double reductions (ops/dd.py) + the Gauss-Newton/Fisher paths
they serve (training/sysid.identifiability(hessian="gn"),
design_experiment(fisher="gn")).

Why this exists: the joint (E, r, L, rho, Bbt) curvature spectrum spans
~9 orders of magnitude; a single-f32 J^T J (or f32 autodiff Hessian)
inflates the smallest eigenvalue ~2000x and scrambles the parameter
correlations, while TPUs cannot run the f64 exact path. dd accumulation
+ never-form-J^T-J SVD criteria keep identification honest on chip
(VERDICT-r3 #3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu.controls import calc_controls
from knode_cosserat_tpu.core.params import experimental_rod
from knode_cosserat_tpu.core.stepper import simulate_scan
from knode_cosserat_tpu.models.mlp import MLPSpec
from knode_cosserat_tpu.ops.dd import (dd_gram, dd_sum, dd_to_float64,
                                       two_prod, two_sum)
from knode_cosserat_tpu.training.loss import (teacher_forced_loss,
                                              teacher_forced_residuals)
from knode_cosserat_tpu.training.sysid import (design_experiment,
                                               identifiability)

JOINT_FIELDS = ("E", "r", "L", "rho", "Bbt")


def test_two_sum_two_prod_are_error_free():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=256), jnp.float32)
    b = jnp.asarray(rng.normal(size=256) * 1e-4, jnp.float32)
    s, e = two_sum(a, b)
    exact = (np.asarray(a, np.float64) + np.asarray(b, np.float64))
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), exact)
    p, e = two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact)


def test_dd_sum_beats_f32_by_orders():
    """Summing n numbers with alternating magnitudes: dd keeps ~2^-48
    relative error where plain f32 keeps ~2^-24 * n."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=4096) * np.where(rng.random(4096) < 0.5, 1.0, 1e-5)
    x32 = jnp.asarray(x, jnp.float32)
    hi, lo = dd_sum(x32, jnp.zeros_like(x32))
    exact = np.sum(np.asarray(x32, np.float64))
    dd_err = abs(float(dd_to_float64(hi, lo)) - exact)
    f32_err = abs(float(jnp.sum(x32)) - exact)
    assert dd_err < 1e-10 * max(abs(exact), 1.0)
    assert dd_err < f32_err / 100 or f32_err < 1e-12


def test_dd_gram_matches_f64_on_ill_conditioned_matrix():
    """J with singular values spanning 1e6: the dd Gram matches the f64
    contraction of the SAME f32 J to ~1e-15, and its smallest eigenvalue
    (sigma_min^2 ~ 1e-12) is recovered; the f32 Gram's is noise."""
    rng = np.random.default_rng(0)
    U, _ = np.linalg.qr(rng.normal(size=(500, 7)))
    V, _ = np.linalg.qr(rng.normal(size=(7, 7)))
    s = np.logspace(0, -6, 7)
    J32 = jnp.asarray((U * s) @ V.T, jnp.float32)
    J64 = np.asarray(J32, np.float64)
    G_dd = dd_to_float64(*jax.jit(dd_gram)(J32))
    G_64 = J64.T @ J64
    assert np.abs(G_dd - G_64).max() < 1e-14
    w_dd = np.linalg.eigvalsh(G_dd)
    w_64 = np.linalg.eigvalsh(G_64)
    np.testing.assert_allclose(w_dd[0], w_64[0], rtol=1e-3)
    # and the plain f32 contraction really is ~8 orders worse (guards
    # against the test silently passing on a too-easy matrix)
    G_f32 = np.asarray(J32.T @ J32, np.float64)
    assert np.abs(G_f32 - G_64).max() > 1e3 * np.abs(G_dd - G_64).max()

    with pytest.raises(ValueError):
        dd_gram(J32[:, 0])


def test_residuals_decompose_teacher_loss():
    p = experimental_rod(dtype=jnp.float64)
    ctl = jnp.asarray(calc_controls("sine", 1.0, float(p.del_t), 12),
                      jnp.float64)
    traj = simulate_scan(p, ctl).traj[:, :, :25]
    # perturbed params so the residuals are NOT ~0
    p_bad = experimental_rod("youngs", dtype=jnp.float64)
    spec = MLPSpec.for_knode()
    for skip in (False, True):
        L = float(teacher_forced_loss(p_bad, spec, None, traj, ctl,
                                      skip_first=skip))
        r = teacher_forced_residuals(p_bad, spec, None, traj, ctl,
                                     skip_first=skip)
        np.testing.assert_allclose(float(jnp.sum(r * r)), L, rtol=1e-12)


def test_gn_f32_identifiability_matches_exact_f64():
    """The round-3 verdict's f32-breaks case: the joint 5-field Hessian
    spectrum spans 8e-11 .. 1e-1. hessian="gn" (dd Gram of the residual
    Jacobian) at f32 must reproduce the f64 exact eigenvalues INCLUDING
    the degenerate one; the f32 exact Hessian famously cannot (smallest
    eigenvalue inflated ~2000x — the motivating measurement)."""
    p64 = experimental_rod(dtype=jnp.float64)
    ctl64 = jnp.asarray(calc_controls("sine", 0.5, float(p64.del_t), 30),
                        jnp.float64)
    traj64 = simulate_scan(p64, ctl64).traj[:, :, :25]
    rep64 = identifiability(p64, traj64, ctl64, fields=JOINT_FIELDS,
                            hessian="exact")

    p32 = experimental_rod(dtype=jnp.float32)
    ctl32 = jnp.asarray(ctl64, jnp.float32)
    traj32 = simulate_scan(p32, ctl32).traj[:, :, :25]
    rep32 = identifiability(p32, traj32, ctl32, fields=JOINT_FIELDS)
    assert rep32.labels == rep64.labels

    w64 = np.asarray(rep64.eigvals)
    w32 = np.asarray(rep32.eigvals)
    assert w64[0] < 1e-9 * w64[-1]          # the spectrum really is wild
    # every eigenvalue within 5% incl. the ~8e-11 one (f32 exact: ~2000x)
    np.testing.assert_allclose(w32, w64, rtol=5e-2)
    # correlations agree where the f32 exact path scrambled them
    np.testing.assert_allclose(rep32.correlation, rep64.correlation,
                               atol=5e-2)


def test_design_gn_svd_criterion_tracks_exact():
    """fisher="gn" computes the D-criterion from singular values of J
    (never forming J^T J); on a well-conditioned single-field design it
    must track the exact-Hessian criterion and still show the
    information gain that test_design_experiment_gains_information pins
    for the exact path."""
    p64 = experimental_rod(dtype=jnp.float64)
    ex = design_experiment(p64, fields=("E",), horizon=6, steps=6, lr=0.3,
                           key=jax.random.PRNGKey(0), fisher="exact")
    gn = design_experiment(p64, fields=("E",), horizon=6, steps=6, lr=0.3,
                           key=jax.random.PRNGKey(0), fisher="gn")
    # same criterion up to the Gauss-Newton truncation (residuals of the
    # nominal one-step predictions are small but nonzero)
    assert abs(gn.info_final - ex.info_final) < 0.5
    with pytest.raises(ValueError, match="fisher"):
        design_experiment(p64, fields=("E",), horizon=4, fisher="nope")


def test_identifiability_rejects_bad_hessian_mode():
    p = experimental_rod(dtype=jnp.float32)
    ctl = jnp.asarray(calc_controls("sine", 1.0, float(p.del_t), 6),
                      jnp.float32)
    traj = simulate_scan(p, ctl).traj[:, :, :25]
    with pytest.raises(ValueError, match="hessian"):
        identifiability(p, traj, ctl, fields=("E",), hessian="wat")
