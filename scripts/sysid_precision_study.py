"""f32-vs-f64 recovery study for gradient-based system identification.

VERDICT-r3 item 3: quantify the f32-vs-f64 recovery error per parameter
(E, Bbt, L, r, rho — the reference's fault-injection surface,
knode.py:22-47) so the identification product can run ON CHIP (f32)
where it is accurate enough, and fall back to f64 emulation / CPU only
where it is not.

Protocol per parameter: the plant is the true experimental rod; the
model starts from a faulted value (the reference mod where one exists —
youngs/damping/short — a x1.5 fault otherwise); sine telemetry is
simulated WITH THE RUN'S OWN dtype (the chip must stand on its own
data, not f64 ground truth); the fit is the CLI's default protocol.
Reported: relative recovery error |est - true| / true.

Also probes the ILL-CONDITIONED analysis paths: the identifiability
Hessian for the degenerate (E, r) pair — eigenvalue ratio ~1e6 — at both
precisions, since that is where f32 was expected to break.

One process per dtype (jax_enable_x64 is process-global):

    KNODE_PLATFORM=cpu python scripts/sysid_precision_study.py \
        --dtype float64 --out data/precision_f64.json
    KNODE_PLATFORM=cpu python scripts/sysid_precision_study.py \
        --dtype float32 --out data/precision_f32_cpu.json
    python scripts/sysid_precision_study.py --dtype float32 \
        --out data/precision_f32_tpu.json          # on chip
    python scripts/sysid_precision_study.py --report \
        data/precision_f64.json data/precision_f32_cpu.json \
        data/precision_f32_tpu.json                # markdown table
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_study(dtype_name: str, quick: bool = False, only=None,
              out_path=None) -> dict:
    import jax

    # honor KNODE_PLATFORM here (the CLI's env contract — the axon TPU
    # plugin ignores JAX_PLATFORMS, so jax.config is the only lever);
    # f64 defaults to CPU: large f64 implicit-rollout programs crash the
    # libtpu worker (see cli.cmd_sysid).
    plat = os.environ.get("KNODE_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    elif dtype_name == "float64":
        jax.config.update("jax_platforms", "cpu")
    if dtype_name == "float64":
        jax.config.update("jax_enable_x64", True)
    from knode_cosserat_tpu.cli import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from knode_cosserat_tpu.controls import calc_controls
    from knode_cosserat_tpu.core.params import derive, experimental_rod
    from knode_cosserat_tpu.core.stepper import simulate_scan
    from knode_cosserat_tpu.training.sysid import (fit_rod_params,
                                                   identifiability)

    dtype = jnp.float64 if dtype_name == "float64" else jnp.float32
    plant = experimental_rod(dtype=dtype)
    T = 60 if quick else 120
    steps = 120 if quick else 300
    ctl = jnp.asarray(
        calc_controls("sine", 0.5, float(plant.del_t), T), dtype)
    traj = simulate_scan(plant, ctl).traj[:, :, :25]

    # (field, faulted model, truth, objective, lr, steps)
    Bbt_true = float(np.asarray(plant.Bbt)[0, 0])
    cases = [
        ("E", experimental_rod("youngs", dtype=dtype),       # E=10e9 fault
         float(np.asarray(plant.E)), "teacher", 0.1, steps),
        ("L", experimental_rod("short", dtype=dtype),        # L=0.4 fault
         float(np.asarray(plant.L)), "teacher", 0.1, steps),
        ("r", derive(plant.replace(r=1.5 * plant.r)),
         float(np.asarray(plant.r)), "teacher", 0.1, steps),
        ("rho", derive(plant.replace(rho=1.5 * plant.rho)),
         float(np.asarray(plant.rho)), "teacher", 0.1, steps),
        ("Bbt", experimental_rod("damping", dtype=dtype),    # Bbt=0.2 fault
         Bbt_true, "rollout", 0.2, max(steps // 2, 60)),
    ]

    results = {"dtype": dtype_name, "backend": jax.default_backend(),
               "T": T, "cases": {}}
    if out_path and os.path.exists(out_path):
        # crash-resilient: merge previously completed cases (the TPU
        # worker can die mid-study on the big rollout-objective program)
        with open(out_path) as f:
            prev = json.load(f)
        if (prev.get("dtype"), prev.get("backend")) == \
                (dtype_name, results["backend"]):
            results["cases"].update(prev.get("cases", {}))
            if "er_hessian" in prev:
                results["er_hessian"] = prev["er_hessian"]

    def checkpoint():
        if out_path:
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)

    for field, p0, true_val, objective, lr, nsteps in cases:
        if only is not None and field not in only:
            continue
        if field in results["cases"]:
            print(f"  {field}: already done, skipping")
            continue
        t0 = time.time()
        # on-chip rollout fits are chunked: the full-length single-scan
        # program crashes the libtpu worker (fit_rod_params docstring)
        chunk = (50 if objective == "rollout"
                 and jax.default_backend() == "tpu" else None)
        res = fit_rod_params(p0, traj, ctl, fields=(field,),
                             objective=objective, steps=nsteps, lr=lr,
                             chunk=chunk)
        est = np.asarray(res.values[field], np.float64)
        est_s = float(est if est.ndim == 0 else est.reshape(-1)[0])
        rel = abs(est_s - true_val) / abs(true_val)
        results["cases"][field] = {
            "objective": objective, "steps": nsteps,
            "true": true_val, "estimate": est_s,
            "rel_error": rel, "wall_s": time.time() - t0,
            "final_loss": float(np.asarray(res.loss_history)[-1]),
        }
        print(f"  {field:>4} [{objective:7}] {dtype_name}: "
              f"rel err {rel:.2e}  ({time.time() - t0:.1f} s)")
        checkpoint()

    if only is not None and "hessian" not in only:
        checkpoint()
        return results
    if "er_hessian" in results:
        print("  E-r Hessian: already done, skipping")
        return results
    # ill-conditioned analysis path: the documented E-r degeneracy
    t0 = time.time()
    rep = identifiability(plant, traj, ctl, fields=("E", "r"))
    w = np.asarray(rep.eigvals, np.float64)
    results["er_hessian"] = {
        "labels": list(rep.labels),
        "eigvals": w.tolist(),
        "cond": float(abs(w[-1]) / max(abs(w[0]), 1e-300)),
        "corr_Er": float(rep.correlation[0, 1]),
        "wall_s": time.time() - t0,
    }
    print(f"  E-r Hessian: eig ratio {results['er_hessian']['cond']:.2e}, "
          f"corr {results['er_hessian']['corr_Er']:+.4f}")
    return results


def report(paths):
    runs = []
    for path in paths:
        with open(path) as f:
            runs.append(json.load(f))
    fields = list(runs[0]["cases"])
    hdr = " | ".join(f"{r['dtype']}@{r['backend']}" for r in runs)
    print(f"| param | objective | {hdr} |")
    print("|---" * (2 + len(runs)) + "|")
    for field in fields:
        cells = " | ".join(f"{r['cases'][field]['rel_error']:.2e}"
                           for r in runs)
        print(f"| {field} | {runs[0]['cases'][field]['objective']} "
              f"| {cells} |")
    cells = " | ".join(
        (f"{r['er_hessian']['corr_Er']:+.4f} "
         f"(cond {r['er_hessian']['cond']:.1e})")
        if "er_hessian" in r else "crashed/absent" for r in runs)
    print(f"| E-r corr | hessian | {cells} |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", choices=["float32", "float64"],
                    default="float32")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    help="comma list of cases to run (E,L,r,rho,Bbt,"
                         "hessian) — one fragile case per process; "
                         "results merge into --out across runs")
    ap.add_argument("--report", nargs="+", default=None,
                    help="aggregate saved JSONs into a markdown table")
    args = ap.parse_args()
    if args.report:
        report(args.report)
        return
    only = set(args.only.split(",")) if args.only else None
    results = run_study(args.dtype, quick=args.quick, only=only,
                        out_path=args.out)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
