"""Energy-budget validation (core/energy.py).

These are end-to-end PHYSICS checks on the whole BDF-2 + shooting stack,
independent of the golden-trajectory oracles: a released (zero-tension)
rod has only dissipative non-conservative terms (material damping Bse/Bbt,
square-law drag C), so its total mechanical energy must decrease
monotonically — any solver bug that pumps energy fails here even if it
matches no golden file.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu.controls import calc_controls
from knode_cosserat_tpu.core.energy import energy_summary, rod_energies
from knode_cosserat_tpu.core.params import experimental_rod
from knode_cosserat_tpu.core.stepper import initial_state, simulate_scan


def test_rest_rod_energies_analytic():
    """Straight rod at rest: zero elastic (v = v*, u = 0), zero kinetic,
    potential = rhoA g L^2 / 2 (trapezoid over z in [0, L] is exact for
    the linear integrand)."""
    p = experimental_rod(dtype=jnp.float64)
    y0, z0 = initial_state(p)
    traj = jnp.concatenate([y0, z0], axis=-1)[None]    # (1, N, 25)
    e = rod_energies(p, traj)
    assert float(e["elastic"][0]) == pytest.approx(0.0, abs=1e-12)
    assert float(e["kinetic"][0]) == pytest.approx(0.0, abs=1e-12)
    rhoA = float(np.asarray(p.rhoA))
    L = float(np.asarray(p.L))
    assert float(e["potential"][0]) == pytest.approx(
        rhoA * 9.81 * L ** 2 / 2, rel=1e-10)


def test_released_rod_dissipates_monotonically():
    """Drive the rod with sine tensions, then release (zero tension,
    continuing from the final state via simulate_scan(initial=)): with
    tendons slack every non-conservative term is dissipative, so total
    mechanical energy must be non-increasing."""
    p = experimental_rod(dtype=jnp.float64)
    ctl = jnp.asarray(calc_controls("sine", 1.0, float(p.del_t), 30),
                      p.dtype)
    driven = simulate_scan(p, ctl)
    y_end = driven.traj[-1, :, :19]
    z_end = driven.traj[-1, :, 19:25]

    release = simulate_scan(p, jnp.zeros((60, 4), p.dtype),
                            initial=(y_end, z_end))
    e = rod_energies(p, release.traj)
    total = np.asarray(e["total"])
    assert np.all(np.isfinite(total))
    # skip the first 2 steps: the restarted BDF-2 history is self-seeded
    # (the reference quirk), an approximation that can wiggle step 1
    d = np.diff(total[2:])
    tol = 1e-10 * np.max(np.abs(total))
    assert np.all(d <= tol), (d.max(), tol)
    # and it genuinely dissipates, not just stays constant
    assert total[-1] < total[2] - 1e-6 * abs(total[2])


def test_energy_validation_and_summary():
    p = experimental_rod(dtype=jnp.float64)
    with pytest.raises(ValueError, match="traj"):
        rod_energies(p, jnp.zeros((4, 10)))
    ctl = jnp.asarray(calc_controls("sine", 1.0, float(p.del_t), 6), p.dtype)
    out = simulate_scan(p, ctl)
    s = energy_summary(p, out.traj)          # 50-channel rows accepted
    assert "elastic" in s and "->" in s
    e = rod_energies(p, out.traj)
    assert e["total"].shape == (6,)
    # driving with tension raises total mechanical energy above rest
    assert float(e["total"][-1]) > float(e["total"][0]) - 1e-9


def test_assembly_release_dissipates():
    """Coupled-assembly energy budget (rods + massive plate, plate
    velocities reconstructed with the solver's own BDF-2 differences):
    after a tension pulse, the released assembly must lose total
    mechanical energy monotonically — an end-to-end physics check on the
    coupled Newton + plate BDF-2 dynamics."""
    import jax

    from knode_cosserat_tpu.core.assembly import (make_ring_assembly,
                                                  simulate_assembly)
    from knode_cosserat_tpu.core.energy import assembly_energies

    asm = make_ring_assembly(n_rods=2, base_radius=0.04, N=8,
                             plate_mass=0.05, dtype=jnp.float64)
    T_pulse, T_rel = 10, 40
    ctl = np.zeros((T_pulse + T_rel, 2, 4))
    ctl[:T_pulse, 0, 0] = 6.0            # one-sided pulse: bend + swing
    out = jax.jit(lambda c: simulate_assembly(asm, c))(jnp.asarray(ctl))
    assert np.asarray(out.residual_norm).max() < 1e-6

    e = assembly_energies(asm, out.traj, out.plate_pose)
    total = np.asarray(e["total"])
    assert np.all(np.isfinite(total))
    # pulse injected energy
    assert total[T_pulse] > total[0] + 1e-9
    # release phase: monotone decay (solver-precision velocities)
    d = np.diff(total[T_pulse + 2:])
    tol = 1e-9 * np.max(np.abs(total))
    assert np.all(d <= tol), (float(d.max()), float(tol))
    assert total[-1] < total[T_pulse + 2] - 1e-9
    # plate terms are populated and finite
    assert np.all(np.isfinite(np.asarray(e["plate_kinetic"])))
    assert float(np.asarray(e["plate_potential"])[0]) != 0.0


def test_assembly_energies_refuses_contact():
    """The smoothed contact springs store energy the budget does not
    count; a contact assembly must be refused instead of reporting a
    silently-wrong dissipation identity."""
    import jax.numpy as jnp2

    from knode_cosserat_tpu.core.assembly import (make_ring_assembly,
                                                  with_contact_plane)
    from knode_cosserat_tpu.core.energy import assembly_energies

    asm = make_ring_assembly(n_rods=2, base_radius=0.04, N=6,
                             plate_mass=0.05, dtype=jnp.float64)
    asm_c = with_contact_plane(asm, np.array([0.0, -1.0, 0.0]), -0.2)
    with pytest.raises(ValueError, match="contact"):
        assembly_energies(asm_c, jnp2.zeros((3, 2, 6, 25)),
                          jnp2.zeros((3, 7)))
