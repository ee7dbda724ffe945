"""Strong-scaling study for the halo-exchange spatial sharding
(parallel/spatial.simulate_scan_ms_halo) on the 8-virtual-CPU-device
mesh (VERDICT-r3 #7 "Done =" measurement).

What can honestly be measured on a ONE-core box: wall clock cannot show
a speedup (the 8 virtual devices time-slice the core), but it CAN show
the two facts that determine real-slice scaling:

  * per-device compiled cost (XLA cost_analysis flops) falls ~1/D while
    the collective payload stays O(D * 19^2) — the strong-scaling shape;
  * TOTAL time-sliced wall clock stays ~flat vs D (total work does not
    blow up), so on D real chips the per-step wall is ~1/D of the
    single-device structured path up to the (constant-size) collectives.

Usage: python scripts/halo_scaling_study.py [--n 4097] [--steps 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                           + os.environ.get("XLA_FLAGS", ""))

import jax

jax.config.update("jax_platforms", "cpu")   # axon ignores JAX_PLATFORMS
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from knode_cosserat_tpu.controls import calc_controls
from knode_cosserat_tpu.core.multiple_shooting import simulate_scan_ms
from knode_cosserat_tpu.core.params import make_rod
from knode_cosserat_tpu.parallel.spatial import simulate_scan_ms_halo


def bench(fn, *args, reps=3):
    out = fn(*args)                       # compile + warm
    jax.block_until_ready(out.traj)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out.traj)
    return (time.perf_counter() - t0) / reps, out


def cost_flops(jitted, *args):
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", float("nan")))
    except Exception as e:                                   # noqa: BLE001
        return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4097)
    ap.add_argument("--segments", type=int, default=128)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    N, S, T = args.n, args.segments, args.steps
    rod = make_rod(N=N, dtype=jnp.float64)
    ctl = jnp.asarray(calc_controls("sine", 0.5, float(rod.del_t), T),
                      jnp.float64)
    devs = jax.devices()
    print(f"N={N} S={S} T={T} dtype=f64 devices={len(devs)}")

    # single-device structured baseline (the path halo replaces)
    f_ref = jax.jit(lambda c: simulate_scan_ms(rod, c, S, tol=1e-24,
                                               solver="structured"))
    wall_ref, out_ref = bench(f_ref, ctl, reps=args.reps)
    fl_ref = cost_flops(f_ref, ctl)
    print(f"structured D=1: wall/step {1e3 * wall_ref / T:9.1f} ms  "
          f"flops/step {fl_ref / T:.3e}  resid {np.max(out_ref.residuals):.1e}")

    ref_traj = np.asarray(out_ref.traj)
    for D in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(devs[:D]).reshape(D), ("seq",))
        f = jax.jit(lambda c, m=mesh: simulate_scan_ms_halo(
            rod, c, S, m, tol=1e-24))
        wall, out = bench(f, ctl, reps=args.reps)
        fl = cost_flops(f, ctl)
        err = float(np.max(np.abs(np.asarray(out.traj) - ref_traj)))
        print(f"halo D={D}: total wall/step {1e3 * wall / T:9.1f} ms  "
              f"per-device flops/step {fl / T:.3e}  "
              f"parity vs structured {err:.1e}  "
              f"resid {np.max(out.residuals):.1e}")


if __name__ == "__main__":
    main()
