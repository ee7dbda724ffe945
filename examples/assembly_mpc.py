"""Example: plate-pose MPC on a parallel continuum robot.

A 3-rod assembly (core/assembly.py) is steered by its rigid end plate.
The planner (control/assembly_mpc.py) optimizes per-rod tendon-tension
schedules against plate position targets; every horizon step is one
coupled (6M+7)-dim implicit solve, so the whole Adam plan is ONE jitted
program with implicit-function-theorem gradients. No reference
counterpart: hsiehScalAR/KNODE-Cosserat has neither assemblies nor
planning (scipy fsolve blocks gradients).

Run: python examples/assembly_mpc.py  (CPU or TPU; ~2 min of compiles)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main(horizon: int = 6, n_steps: int = 8):
    from knode_cosserat_tpu.control import (AssemblyCarry,
                                            AssemblyMPCController,
                                            rollout_plate)
    from knode_cosserat_tpu.core.assembly import make_ring_assembly

    asm = make_ring_assembly(n_rods=3, base_radius=0.05, N=10,
                             dtype=jnp.float32)

    # a reachable target: the plate pose left by a "secret" coordinated
    # pull (every rod's tendon 0) — ~7 mm of lateral plate motion
    u_true = np.full((horizon, 3, 4), 5.0, np.float32)
    u_true[:, :, 0] = 12.0
    plates, _ = rollout_plate(asm, AssemblyCarry.initial(asm),
                              jnp.asarray(u_true))
    target = np.broadcast_to(np.asarray(plates)[-1, :3],
                             (horizon, 3)).copy()
    print("target plate position:", np.round(target[0], 4))

    ctl = AssemblyMPCController(asm, horizon=horizon, first_iters=60,
                                replan_iters=20, opt_lr=0.4, u_max=20.0,
                                w_du=1e-6)
    base = float(np.linalg.norm(
        np.asarray(AssemblyCarry.initial(asm).pp) - target[0]))
    print(f"uncontrolled plate error: {base*1000:.2f} mm")
    for k in range(n_steps):
        u0, info = ctl.act(target)
        err = float(np.linalg.norm(
            np.asarray(info["plate_pose"][:3]) - target[0]))
        print(f"step {k:2d}  plate err {err*1000:.3f} mm  "
              f"plan cost {info['cost']:.2e}")
    print(f"final error {err*1000:.3f} mm ({err/base:.1%} of uncontrolled)")
    return err


if __name__ == "__main__":
    main()
