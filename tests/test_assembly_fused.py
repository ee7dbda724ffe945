"""Fused coupled-assembly mega-kernel (ops/pallas_assembly.py) vs the XLA
path — interpret mode on CPU; the compiled kernel is pinned in the tpu
tier (tests/test_tpu_kernels.py). No reference analogue (the reference has
no assemblies); the parity target is this package's own
core/assembly.simulate_assembly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu.controls import calc_controls
from knode_cosserat_tpu.core.assembly import (make_ring_assembly,
                                              simulate_assembly,
                                              with_contact_plane)


def _controls(asm, T, args=(0.7, 1.0, 1.3)):
    dt = float(np.asarray(jax.tree.map(lambda x: x[0], asm.rods).del_t))
    return jnp.asarray(np.stack(
        [np.asarray(calc_controls("sine", a, dt, T))
         for a in args[:asm.M]], axis=1), jnp.float32)


def test_fused_matches_xla_against_f64_truth():
    """Both f32 solvers carry an inherent G looseness from the
    ill-conditioned arrowhead (f32 residual noise / smallest singular
    value); the fused kernel must sit INSIDE the XLA path's own envelope
    vs the f64 ground truth, not merely near the XLA f32 root."""
    T = 8
    asm64 = make_ring_assembly(n_rods=3, base_radius=0.05, N=10,
                               dtype=jnp.float64)
    ctl64 = jnp.asarray(_controls(asm64, T), jnp.float64)
    truth = simulate_assembly(asm64, ctl64, tol=1e-24)

    asm32 = make_ring_assembly(n_rods=3, base_radius=0.05, N=10,
                               dtype=jnp.float32)
    ctl32 = jnp.asarray(ctl64, jnp.float32)
    xla = simulate_assembly(asm32, ctl32)
    fus = simulate_assembly(asm32, ctl32, fused="interpret")

    tG = np.asarray(truth.Gs)
    tp = np.asarray(truth.plate_pose)
    errG_x = np.max(np.abs(np.asarray(xla.Gs) - tG))
    errG_f = np.max(np.abs(np.asarray(fus.Gs) - tG))
    errp_x = np.max(np.abs(np.asarray(xla.plate_pose) - tp))
    errp_f = np.max(np.abs(np.asarray(fus.plate_pose) - tp))
    # same accuracy class (measured: G 1.5e-3 vs 1.6e-3, plate ~5e-7)
    assert errG_f < 3.0 * errG_x + 1e-6, (errG_f, errG_x)
    assert errp_f < 3.0 * errp_x + 1e-7, (errp_f, errp_x)
    assert np.asarray(fus.residual_norm).max() < 1e-4
    assert np.all(np.asarray(fus.newton_iters)[1:] >= 1)


def test_fused_two_rod_ring_plate_pose():
    """M=2 exercises the U=19 odd-size solve; plate pose must agree with
    the XLA path to solver tolerance."""
    asm = make_ring_assembly(n_rods=2, base_radius=0.04, N=8,
                             dtype=jnp.float32)
    ctl = _controls(asm, 6, args=(0.8, 1.2))
    xla = simulate_assembly(asm, ctl)
    fus = simulate_assembly(asm, ctl, fused="interpret")
    np.testing.assert_allclose(np.asarray(fus.plate_pose),
                               np.asarray(xla.plate_pose), atol=5e-5)


def test_fused_massive_plate():
    """Nonzero plate mass/inertia turns on the dynamic plate rows (the
    massless case has a structurally zero plate diagonal — the pivoted
    in-kernel solve must handle both)."""
    asm = make_ring_assembly(n_rods=3, base_radius=0.05, N=8,
                             plate_mass=0.05,
                             plate_inertia=1e-4 * np.eye(3),
                             dtype=jnp.float32)
    ctl = _controls(asm, 6)
    xla = simulate_assembly(asm, ctl)
    fus = simulate_assembly(asm, ctl, fused="interpret")
    np.testing.assert_allclose(np.asarray(fus.plate_pose),
                               np.asarray(xla.plate_pose), atol=5e-5)


def test_fused_rejects_unsupported_configs():
    asm = make_ring_assembly(n_rods=2, N=5, dtype=jnp.float32)
    ctl = _controls(asm, 3, args=(0.7, 1.0))
    with pytest.raises(NotImplementedError, match="contact"):
        simulate_assembly(with_contact_plane(asm, [0, 0, 1.0], -0.1),
                          ctl, fused="interpret")
    with pytest.raises(NotImplementedError, match="KNODE"):
        simulate_assembly(asm, ctl, fused="interpret",
                          nn_fn=lambda x: 0.0 * x[..., :25])
    # the layer guard itself: solve_fn + NN at assembly_step_carry would
    # make custom_root differentiate an NN-augmented residual at an
    # NN-free root (silently wrong cotangents) — must raise even for
    # callers that bypass simulate_assembly (e.g. rollout_plate)
    from knode_cosserat_tpu.core.assembly import (AssemblyCarry,
                                                  assembly_step_carry)
    with pytest.raises(ValueError, match="solve_fn"):
        assembly_step_carry(asm, AssemblyCarry.initial(asm), ctl[0],
                            nn_fn=lambda x: 0.0 * x[..., :25],
                            solve_fn=lambda *a: None)


def test_fused_differentiable_gradient_matches_xla():
    """fused + differentiable: the mega-kernel solves each root, the
    implicit function theorem supplies gradients through the XLA residual
    — d(plate pose)/d(controls) must match the pure-XLA custom_root path
    (the MPC planning structure, control/assembly_mpc.rollout_plate)."""
    asm = make_ring_assembly(n_rods=2, base_radius=0.04, N=5,
                             dtype=jnp.float32)
    ctl = _controls(asm, 4, args=(0.8, 1.2))

    def tip_z(c, fused):
        out = simulate_assembly(asm, c, differentiable=True,
                                fused="interpret" if fused else False,
                                tol=1e-12)
        return jnp.sum(out.plate_pose[-1, :3])

    g_xla = jax.grad(lambda c: tip_z(c, False))(ctl)
    g_fus = jax.grad(lambda c: tip_z(c, True))(ctl)
    # same IFT tangent solve at (slightly) different f32 roots
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_xla),
                               rtol=2e-2, atol=1e-4)
