"""Multiple shooting with the segment axis sharded over a device mesh.

Runs on the 8 virtual CPU devices from conftest — the single-box stand-in
for a pod slice. Parity: the sharded rollout equals the unsharded one
(same program, plus sharding constraints the partitioner honors).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from knode_cosserat_tpu.controls import calc_controls
from knode_cosserat_tpu.core.multiple_shooting import simulate_scan_ms
from knode_cosserat_tpu.core.params import make_rod


@pytest.mark.parametrize("solver", ["structured", "dense"])
def test_sharded_segments_match_unsharded(solver):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("seq",))
    rod = make_rod(N=65, dtype=jnp.float64)
    ctl = jnp.asarray(calc_controls("sine", 0.5, float(rod.del_t), 8),
                      jnp.float64)
    S = 32                                     # 4 segments per device
    ref = simulate_scan_ms(rod, ctl, S, tol=1e-24, solver=solver)
    out = jax.jit(lambda c: simulate_scan_ms(rod, c, S, tol=1e-24,
                                             solver=solver, mesh=mesh))(ctl)
    err = np.max(np.abs(np.asarray(out.traj) - np.asarray(ref.traj)))
    assert err < 1e-9, err
    assert np.asarray(out.residuals).max() < 1e-10
