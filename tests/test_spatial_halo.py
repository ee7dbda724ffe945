"""Explicit halo-exchange spatial sharding (parallel/spatial.py).

Runs on the 8 virtual CPU devices from conftest. Parity target: the
GSPMD-free shard_map rollout solves the SAME discrete equations as
core/multiple_shooting.simulate_scan_ms(solver="structured") — which is
itself pinned against the sequential stepper — so trajectories must
agree to solver tolerance, and the Newton solves must converge.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from knode_cosserat_tpu.controls import calc_controls
from knode_cosserat_tpu.core.multiple_shooting import simulate_scan_ms
from knode_cosserat_tpu.core.params import make_rod
from knode_cosserat_tpu.parallel.spatial import simulate_scan_ms_halo


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} (virtual) devices")
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("seq",))


def test_halo_rollout_matches_structured_ms():
    mesh = _mesh(8)
    rod = make_rod(N=65, dtype=jnp.float64)
    ctl = jnp.asarray(calc_controls("sine", 0.5, float(rod.del_t), 8),
                      jnp.float64)
    S = 32                                    # 4 segments x 8 devices
    ref = simulate_scan_ms(rod, ctl, S, tol=1e-24, solver="structured")
    out = jax.jit(lambda c: simulate_scan_ms_halo(rod, c, S, mesh,
                                                  tol=1e-24))(ctl)
    assert out.traj.shape == ref.traj.shape
    err = np.max(np.abs(np.asarray(out.traj) - np.asarray(ref.traj)))
    assert err < 1e-9, err
    assert np.asarray(out.residuals).max() < 1e-10
    # warm starts keep steady-state Newton cheap, like the reference path
    assert np.asarray(out.newton_iters)[2:].mean() < 6


def test_halo_rollout_single_device_degenerates():
    """D=1 exercises every collective as the identity — the shard_map
    program must still match (guards the masking/halo arithmetic)."""
    mesh = _mesh(1)
    rod = make_rod(N=33, dtype=jnp.float64)
    ctl = jnp.asarray(calc_controls("step", 2.0, float(rod.del_t), 6),
                      jnp.float64)
    ref = simulate_scan_ms(rod, ctl, 8, tol=1e-24, solver="structured")
    out = simulate_scan_ms_halo(rod, ctl, 8, mesh, tol=1e-24)
    err = np.max(np.abs(np.asarray(out.traj) - np.asarray(ref.traj)))
    assert err < 1e-9, err


def test_halo_segments_per_device_one():
    """Sd = 1 (segments == devices): the local-prefix degenerate case the
    identity-masked last map must handle."""
    mesh = _mesh(8)
    rod = make_rod(N=17, dtype=jnp.float64)
    ctl = jnp.asarray(calc_controls("sine", 0.5, float(rod.del_t), 6),
                      jnp.float64)
    ref = simulate_scan_ms(rod, ctl, 8, tol=1e-24, solver="structured")
    out = simulate_scan_ms_halo(rod, ctl, 8, mesh, tol=1e-24)
    err = np.max(np.abs(np.asarray(out.traj) - np.asarray(ref.traj)))
    assert err < 1e-9, err


@pytest.mark.slow
def test_halo_fine_rod_n641():
    """A genuinely fine rod (N=641, S=64) — the regime the design is for;
    parity vs the structured single-program path."""
    mesh = _mesh(8)
    rod = make_rod(N=641, dtype=jnp.float64)
    ctl = jnp.asarray(calc_controls("sine", 0.5, float(rod.del_t), 4),
                      jnp.float64)
    S = 64
    ref = simulate_scan_ms(rod, ctl, S, tol=1e-24, solver="structured")
    out = jax.jit(lambda c: simulate_scan_ms_halo(rod, c, S, mesh,
                                                  tol=1e-24))(ctl)
    err = np.max(np.abs(np.asarray(out.traj) - np.asarray(ref.traj)))
    assert err < 1e-8, err
    assert np.asarray(out.residuals).max() < 1e-10
