"""Marginal per-step cost of the assembly rollout paths: time T=101 and
T=1001 rollouts; the difference isolates per-step work from per-call
overhead (dispatch, transfer, cache checks)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from knode_cosserat_tpu.core.assembly import (make_ring_assembly,
                                              simulate_assembly)
from knode_cosserat_tpu.controls import calc_controls


def wall(fn, ctl, budget=3.0):
    jax.block_until_ready(fn(ctl))
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < budget:
        jax.block_until_ready(fn(ctl))
        n += 1
    return (time.perf_counter() - t0) / n


def main():
    print("backend:", jax.default_backend())
    asm = make_ring_assembly(n_rods=3, base_radius=0.05, N=10,
                             dtype=jnp.float32)
    dt = float(np.asarray(jax.tree.map(lambda x: x[0], asm.rods).del_t))

    def ctl_for(T):
        return jnp.asarray(np.stack(
            [np.asarray(calc_controls("sine", a, dt, T))
             for a in (0.7, 1.0, 1.3)], axis=1), jnp.float32)

    for name, kw in (("xla", {}), ("fused", {"fused": True})):
        f = jax.jit(lambda c, kw=kw: simulate_assembly(asm, c, **kw).traj)
        w101 = wall(f, ctl_for(101))
        w1001 = wall(f, ctl_for(1001))
        marg = (w1001 - w101) / 900
        print("%s: T=101 %.1f ms, T=1001 %.1f ms -> marginal %.0f us/step "
              "(%.0f steps/s), fixed %.1f ms" % (
                  name, w101 * 1e3, w1001 * 1e3, marg * 1e6, 1.0 / marg,
                  (w101 - 100 * marg) * 1e3))


if __name__ == "__main__":
    main()
