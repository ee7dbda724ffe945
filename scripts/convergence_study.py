"""Spatial discretization study: Euler vs RK4 tip error vs node count.

The reference always runs first-order spatial Euler at N=10
(knode.py:89, cosserat_ode.py:16). This quantifies what that costs:
tip-position error at t_end vs the richest solution (RK4, N=160), f64.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from knode_cosserat_tpu import experimental_rod, calc_controls, simulate

T = 20
rows = []
ref_p = experimental_rod(N=160)
ctl = calc_controls("sine", 1.0, float(ref_p.del_t), T)
ref_tip = np.asarray(simulate(ref_p, ctl, method="rk4"))[-1, -1, :3]
print(f"reference tip (RK4, N=160): {np.round(ref_tip, 6)}")
for N in (10, 20, 40, 80):
    p = experimental_rod(N=N)
    row = [N]
    for method in ("euler", "rk4"):
        tip = np.asarray(simulate(p, ctl, method=method))[-1, -1, :3]
        row.append(float(np.linalg.norm(tip - ref_tip)))
    rows.append(row)
    print(f"N={N:3d}  euler err {row[1]*1000:8.3f} mm   rk4 err {row[2]*1000:8.4f} mm", flush=True)

with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "RESULTS.md"), "a") as f:
    f.write("\n\n## Spatial convergence (tip error vs RK4 @ N=160, f64, "
            "sine 1.0, t=1 s)\n\n| N | Euler error | RK4 error |\n|---|---|---|\n")
    for N, e1, e2 in rows:
        f.write(f"| {N} | {e1*1000:.3f} mm | {e2*1000:.4f} mm |\n")
    f.write("\nThe reference's fixed choice (Euler, N=10) carries ~cm-level "
            "spatial truncation; this framework runs any N at full speed "
            "(fast rollout is launch-bound, N=40 costs the same as N=10) "
            "and offers RK4.\n")
print("appended to docs/RESULTS.md")
