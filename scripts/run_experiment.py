"""Run the paper's sim-track KNODE study on TPU and write docs/RESULTS.md.

For each parameter perturbation ("mod"), train the KNODE residual on
reference-rod trajectories and report validation-DTW improvement vs the
no-NN baseline — the reference's headline table
(physics_multitrain.py:169-233), produced here by one process on one chip.
"""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np


def main(epochs=2000, hidden=512, mods=("nsw", "short", "youngs",
                                        "lengthstiff")):
    import jax
    from knode_cosserat_tpu import apply_mod
    from knode_cosserat_tpu.evaluation.metrics import pose_mse, tip_dtw, pct_error
    from knode_cosserat_tpu.training import (TrainConfig, make_training_data,
                                             make_validation_reference,
                                             train_knode)

    ref = apply_mod(None)
    print("generating data...")
    trajs, ctls = make_training_data(ref, [("sine", 0.5), ("sine", 1.0)],
                                     train_len=30)
    vc, vr = make_validation_reference(ref, ("sine", 1.25), eval_len=100)

    rows = []
    for mod in mods:
        p_mod = apply_mod(mod)
        cfg = TrainConfig(epochs=epochs, hidden=hidden, eval_every=200,
                          log_every=10 ** 9, dtype="float32")
        t0 = time.perf_counter()
        res = train_knode(p_mod, np.asarray(trajs), np.asarray(ctls), cfg,
                          vc, vr, eval_rod=p_mod, log=None)
        wall = time.perf_counter() - t0
        baseline = dict(res.dtw_history)[0]
        rows.append((mod, baseline, res.best_dtw,
                     pct_error(res.best_dtw, baseline), res.epochs_per_sec,
                     wall))
        print(f"{mod:12s} baseline DTW {baseline:8.3f} -> best "
              f"{res.best_dtw:8.3f} ({rows[-1][3]:+.1f}%)  "
              f"[{res.epochs_per_sec:,.0f} eps, wall {wall:.0f}s]")

    out = os.path.join(HERE, "docs", "RESULTS.md")
    with open(out, "w") as f:
        f.write("# Sim-track KNODE study (TPU v5e, single chip)\n\n")
        f.write(f"Training: 2 trajectories (sine 0.5 / sine 1.0), "
                f"train_len=30, keypoints [3,5,7,9], hidden={hidden}, "
                f"{epochs} epochs, f32, best-of-run selection by validation "
                f"DTW (sine 1.25, 100 steps) — the reference protocol "
                f"(physics_train.py) end to end on device.\n\n")
        f.write("| mod | baseline DTW | KNODE best DTW | change | "
                "epochs/s | wall |\n|---|---|---|---|---|---|\n")
        for mod, base, best, pct, eps, wall in rows:
            f.write(f"| {mod} | {base:.3f} | {best:.3f} | {pct:+.1f}% | "
                    f"{eps:,.0f} | {wall:.0f}s |\n")
        f.write("\nNegative change = KNODE corrected the deliberately wrong "
                "physics toward the reference dynamics.\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
