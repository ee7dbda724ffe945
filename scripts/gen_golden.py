"""Generate golden trajectories from the reference implementation.

Runs the UNMODIFIED reference code at /root/reference as an oracle (imported,
not copied) and saves its outputs under tests/golden/ for parity regression
tests. Also prints an immediate comparison against our JAX core when
--compare is given.
"""
import argparse
import os
import sys

import numpy as np

REF = "/root/reference/knode_cosserat"
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_reference(kind: str, arg: float, T: int, mod=None, original=False):
    sys.path.insert(0, REF)
    from cosserat_ode import CosseratRod            # noqa: reference oracle
    from knode import setup_robot, simulate         # noqa: reference oracle
    from physics_controls import calc_controls      # noqa: reference oracle

    robot = CosseratRod(use_fsolve=True)
    setup_robot(robot, mod, original)
    controls = np.array(calc_controls(kind, arg, robot.del_t, T))
    traj = simulate(robot, controls)
    return controls, traj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compare", action="store_true")
    args = ap.parse_args()

    os.makedirs(os.path.join(HERE, "tests", "golden"), exist_ok=True)
    cases = [
        ("sine", 0.5, 30, None),
        ("sine", 1.25, 40, None),
        ("step", 1.0, 40, None),
        ("random", 0.0, 30, None),
        ("sine", 1.0, 30, "nsw"),
        ("sine", 1.0, 30, "youngs"),
    ]
    for kind, arg, T, mod in cases:
        controls, traj = run_reference(kind, arg, T, mod)
        name = f"{kind}_{arg}_{T}_{mod}".replace(".", "_")
        out = os.path.join(HERE, "tests", "golden", name + ".npz")
        np.savez_compressed(out, controls=controls, traj=traj,
                            mod=str(mod))
        print("wrote", out, traj.shape)

        if args.compare:
            import jax
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_enable_x64", True)
            sys.path.insert(0, HERE)
            from knode_cosserat_tpu import apply_mod, simulate as jsim
            p = apply_mod(mod)
            ours = np.asarray(jsim(p, controls, reference_layout=True))
            rmse = np.sqrt(np.mean((ours - traj) ** 2))
            print(f"  RMSE vs reference: {rmse:.3e}")


if __name__ == "__main__":
    main()
