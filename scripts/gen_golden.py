"""Generate golden trajectories from the reference implementation.

Runs the UNMODIFIED reference code at /root/reference as an oracle (imported,
not copied) and saves its outputs under tests/golden/ for parity regression
tests. Also prints an immediate comparison against our JAX core when
--compare is given.

Coverage (round-5 verdict item 5): every sim mod the reference defines
(knode.py:22-47 — noair, nsw, short, damping, dampstiff, lengthstiff,
youngs), plus the realworld original-paper parameter set and its
`diameter` mod (prepare.py:35-73).
"""
import argparse
import os
import sys

import numpy as np

REF = "/root/reference/knode_cosserat"
REF_RW = "/root/reference/knode_cosserat_realworld"
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stub_missing_modules():
    """prepare.py imports bag/plot libs irrelevant to setup_robot_original;
    stub the ones this image lacks so the module is importable."""
    import types
    for name in ("bagpy", "seaborn", "fastdtw"):
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            if name == "bagpy":
                mod.bagreader = object
            if name == "fastdtw":
                mod.fastdtw = lambda *a, **k: (0.0, [])
            sys.modules[name] = mod


def run_reference(kind: str, arg: float, T: int, mod=None, original=False):
    sys.path.insert(0, REF)
    from cosserat_ode import CosseratRod            # noqa: reference oracle
    from knode import simulate                      # noqa: reference oracle
    from physics_controls import calc_controls      # noqa: reference oracle

    robot = CosseratRod(use_fsolve=True)
    if original:
        # setup_robot_original lives in the realworld tree
        # (prepare.py:35-73); the sim-side setup_robot hard-errors on
        # original=True (knode.py:8-9).
        _stub_missing_modules()
        if REF_RW not in sys.path:
            sys.path.append(REF_RW)   # append: keep REF's cosserat_ode first
        import prepare                              # noqa: reference oracle
        prepare.setup_robot_original(robot, mod)
    else:
        from knode import setup_robot               # noqa: reference oracle
        setup_robot(robot, mod, original)
    controls = np.array(calc_controls(kind, arg, robot.del_t, T))
    traj = simulate(robot, controls)
    return controls, traj


# (kind, arg, T, mod, original)
CASES = [
    ("sine", 0.5, 30, None, False),
    ("sine", 1.25, 40, None, False),
    ("step", 1.0, 40, None, False),
    ("random", 0.0, 30, None, False),
    ("sine", 1.0, 30, "nsw", False),
    ("sine", 1.0, 30, "youngs", False),
    # round-5 breadth: the remaining experimental mods ...
    ("sine", 1.0, 30, "noair", False),
    ("sine", 1.0, 30, "short", False),
    ("sine", 1.0, 30, "damping", False),
    ("sine", 1.0, 30, "dampstiff", False),
    ("sine", 1.0, 30, "lengthstiff", False),
    # ... and the realworld original-paper rod + its diameter mod
    ("sine", 1.0, 30, None, True),
    ("sine", 1.0, 30, "diameter", True),
]


def case_name(kind, arg, T, mod, original=False):
    name = f"{kind}_{arg}_{T}_{mod}".replace(".", "_")
    return name + ("_orig" if original else "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compare", action="store_true")
    ap.add_argument("--only-missing", action="store_true",
                    help="skip cases whose golden file already exists")
    args = ap.parse_args()

    os.makedirs(os.path.join(HERE, "tests", "golden"), exist_ok=True)
    for kind, arg, T, mod, original in CASES:
        name = case_name(kind, arg, T, mod, original)
        out = os.path.join(HERE, "tests", "golden", name + ".npz")
        if args.only_missing and os.path.exists(out):
            print("exists", out)
            continue
        controls, traj = run_reference(kind, arg, T, mod, original)
        np.savez_compressed(out, controls=controls, traj=traj,
                            mod=str(mod), original=original)
        print("wrote", out, traj.shape)

        if args.compare:
            import jax
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_enable_x64", True)
            sys.path.insert(0, HERE)
            from knode_cosserat_tpu import apply_mod, simulate as jsim
            p = apply_mod(mod, original=original)
            ours = np.asarray(jsim(p, controls, reference_layout=True))
            rmse = np.sqrt(np.mean((ours - traj) ** 2))
            print(f"  RMSE vs reference: {rmse:.3e}")


if __name__ == "__main__":
    main()
