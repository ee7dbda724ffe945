"""Rod-simulator throughput: batched TPU rollouts vs reference scipy-fsolve.

Measures BDF-2 shooting steps/sec at N nodes (BASELINE.md: "rod sim
steps/sec at N=40"). One TPU program rolls out a whole batch of rods via
vmap(simulate_scan); the reference does one rod per process with
scipy.optimize.fsolve.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_ours(N=40, B=256, T=50, dtype="float32"):
    import jax
    import jax.numpy as jnp
    from knode_cosserat_tpu import experimental_rod, calc_controls
    from knode_cosserat_tpu.core.stepper import simulate_scan

    p = experimental_rod(N=N, dtype=jnp.dtype(dtype))
    ctls = np.stack([
        calc_controls("sine", 0.5 + 0.01 * i, float(p.del_t), T)
        for i in range(B)]).astype(dtype)
    ctls = jnp.asarray(ctls)

    roll = jax.jit(jax.vmap(lambda c: simulate_scan(p, c).traj))
    t0 = time.perf_counter()
    out = roll(ctls)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = roll(ctls)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    steps = B * (T - 1)
    assert np.isfinite(np.asarray(out)).all()
    return steps / dt, compile_s


def bench_reference(N=40, T=20):
    sys.path.insert(0, "/root/reference/knode_cosserat")
    from cosserat_ode import CosseratRod
    from knode import setup_robot, simulate
    from physics_controls import calc_controls

    robot = CosseratRod(use_fsolve=True)
    setup_robot(robot)
    robot.N = N
    robot.compute_intermediate_terms()
    controls = np.array(calc_controls("sine", 0.5, robot.del_t, T))
    t0 = time.perf_counter()
    simulate(robot, controls)
    dt = time.perf_counter() - t0
    return (T - 1) / dt


if __name__ == "__main__":
    for N in (10, 40):
        ours, comp = bench_ours(N=N)
        ref = bench_reference(N=N)
        print(f"N={N}: ours {ours:,.0f} steps/s (compile {comp:.0f}s)  "
              f"reference scipy {ref:,.1f} steps/s  -> {ours/ref:,.0f}x")
