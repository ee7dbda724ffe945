"""Probe the BATCHED assembly-planning workload on the chip.

The bench's assembly_batched_steps_per_sec_b256 (41k steps/s, round 4)
vmaps simulate_assembly(solver="auto"->dense) over 256 tension schedules.
VERDICT-r4 noted the chip is idle there, not saturated. Two questions:

  1. solver choice at batch: "auto" picks dense on TPU from a B=1
     (latency-bound) measurement, but at B=256 the program is
     THROUGHPUT-bound, where the structured arrowhead Jacobian
     (6 tangents/rod + cheap algebra vs 6M+7 tangents through every
     sweep) should win on FLOPs. Measure both at several B.
  2. batch scaling: where does throughput stop growing?

Usage: python scripts/probe_assembly_batched.py [T] [B ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from knode_cosserat_tpu.core.assembly import (make_ring_assembly,
                                              simulate_assembly)


def timeit(fn, *args):
    out = jax.block_until_ready(fn(*args))
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < 3.0:
        out = jax.block_until_ready(fn(*args))
        n += 1
    return (time.perf_counter() - t0) / n, out


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 101
    Bs = [int(b) for b in sys.argv[2:]] or [64, 256, 1024]
    print("backend:", jax.default_backend())
    asm = make_ring_assembly(n_rods=3, base_radius=0.05, N=10,
                             dtype=jnp.float32)
    for B in Bs:
        bctl = 5.0 + jax.random.uniform(jax.random.PRNGKey(0),
                                        (B, T, 3, 4), jnp.float32)
        for solver in ("dense", "structured"):
            run = jax.jit(jax.vmap(lambda c: simulate_assembly(
                asm, c, tol=1e-8, solver=solver).plate_pose))
            t0 = time.perf_counter()
            dt, out = timeit(run, bctl)
            print("B=%4d solver=%-10s  %8.0f steps/s  (compile+first "
                  "%.1fs)" % (B, solver, B * (T - 1) / dt,
                              time.perf_counter() - t0), flush=True)
            assert np.isfinite(np.asarray(out)).all()


if __name__ == "__main__":
    main()
