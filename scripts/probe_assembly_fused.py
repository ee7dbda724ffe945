"""Measure the fused assembly mega-kernel vs the XLA path on the chip.

Usage: python scripts/probe_assembly_fused.py [T]
Prints steps/s for both paths plus agreement diagnostics.
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
from knode_cosserat_tpu.controls import calc_controls


def timeit(fn, *args):
    out = jax.block_until_ready(fn(*args))
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < 2.0:
        out = jax.block_until_ready(fn(*args))
        n += 1
    return (time.perf_counter() - t0) / n, out


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 101
    print("backend:", jax.default_backend())
    asm = make_ring_assembly(n_rods=3, base_radius=0.05, N=10,
                             dtype=jnp.float32)
    dt = float(np.asarray(jax.tree.map(lambda x: x[0], asm.rods).del_t))
    ctl = jnp.asarray(np.stack(
        [np.asarray(calc_controls("sine", 0.7, dt, T)),
         np.asarray(calc_controls("sine", 1.0, dt, T)),
         np.asarray(calc_controls("sine", 1.3, dt, T))], axis=1),
        jnp.float32)

    xla = jax.jit(lambda c: simulate_assembly(asm, c))
    t0 = time.perf_counter()
    dt_x, out_x = timeit(xla, ctl)
    print("xla compile+first: %.1fs  %.0f steps/s" % (
        time.perf_counter() - t0, (T - 1) / dt_x))

    fus = jax.jit(lambda c: simulate_assembly(asm, c, fused=True))
    t0 = time.perf_counter()
    dt_f, out_f = timeit(fus, ctl)
    print("fused compile+first: %.1fs  %.0f steps/s  (%.1fx)" % (
        time.perf_counter() - t0, (T - 1) / dt_f, dt_x / dt_f))

    print("plate diff: %.3e" % np.max(np.abs(
        np.asarray(out_x.plate_pose) - np.asarray(out_f.plate_pose))))
    print("xla iters:", np.asarray(out_x.newton_iters)[:12].tolist(),
          "res max %.2e" % np.asarray(out_x.residual_norm).max())
    print("fus iters:", np.asarray(out_f.newton_iters)[:12].tolist(),
          "res max %.2e" % np.asarray(out_f.residual_norm).max())


if __name__ == "__main__":
    main()
