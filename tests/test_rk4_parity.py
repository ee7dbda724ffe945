"""RK4 spatial-sweep parity vs the reference getResidualRK4 oracle
(cosserat_ode.py:215-255), including the linear history-midpoint
interpolation quirk (knode.py:80-81)."""
import sys

import jax.numpy as jnp
import numpy as np

from knode_cosserat_tpu import apply_mod, calc_controls, simulate
from knode_cosserat_tpu.core.spatial import integrate_rk4, residual_rk4

REF = "/root/reference/knode_cosserat"


def test_rk4_residual_matches_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from cosserat_ode import CosseratRod     # reference oracle
    from knode import setup_robot            # reference oracle

    p = apply_mod(None)
    robot = CosseratRod(use_fsolve=True)
    setup_robot(robot)

    # a mid-rollout state from our simulator (reference layout for them)
    ctl = calc_controls("sine", 1.0, float(p.del_t), 8)
    traj = np.asarray(simulate(p, ctl, reference_layout=True))
    t = 5
    y = traj[t, 0:19, :].copy()
    z = traj[t, 19:25, :].copy()
    yh = traj[t, 25:44, :].copy()
    zh = traj[t, 44:50, :].copy()
    yh_int = 0.5 * (yh[:, :-1] + yh[:, 1:])
    zh_int = 0.5 * (zh[:, :-1] + zh[:, 1:])
    G = traj[t, 7:13, 0].copy()
    robot.tendon_tensions = np.asarray(ctl[t - 1], np.float64)

    # note: the oracle integrates IN PLACE into y/z — keep the references
    ref_res = robot.getResidualRK4(G.copy(), y, z, yh.copy(),
                                   yh_int.copy(), zh.copy(), zh_int.copy())

    tf = jnp.asarray(ctl[t - 1]) @ p.tendon_dirs
    ours = residual_rk4(p, jnp.asarray(G), jnp.asarray(yh.T),
                        jnp.asarray(zh.T), jnp.asarray(yh_int.T),
                        jnp.asarray(zh_int.T), tf)
    np.testing.assert_allclose(np.asarray(ours), ref_res, rtol=1e-9,
                               atol=1e-10)

    # the integrated rod states must match too (y mutated in place by the
    # reference call above)
    y_ours, _ = integrate_rk4(p, jnp.asarray(G), jnp.asarray(yh.T),
                              jnp.asarray(zh.T), jnp.asarray(yh_int.T),
                              jnp.asarray(zh_int.T), tf)
    np.testing.assert_allclose(np.asarray(y_ours), y.T, rtol=1e-9,
                               atol=1e-10)
