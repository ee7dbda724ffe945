"""Grid-trainer MFU study: per-epoch kernel time vs lane-tile width.

Duplicating the training trajectories widens the per-instance lane tile
(232 cells -> 256 lanes, x2 -> 512, x4 -> 1024) with the SAME per-epoch
serial chain — exactly the shape cell-packing (P cells per kernel
instance) would produce. If per-epoch time grows sublinearly in width,
packing P cells amortizes the fixed serial overhead P-fold; if it grows
linearly, packing cannot help and the 4% grid MFU is lane-proportional
work (the wide-study-grade proof VERDICT r4 item 3 asks for).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from knode_cosserat_tpu import apply_mod
from knode_cosserat_tpu.models import init_mlp
from knode_cosserat_tpu.ops.pallas_train import (_pick_tiling,
                                                 make_fused_grid_training_run)
from knode_cosserat_tpu.training import TrainConfig, make_training_data


def main():
    print("backend:", jax.default_backend())
    G, E = 40, 200
    ref = apply_mod(None)
    trajs, ctls = make_training_data(ref, [("sine", 0.5), ("sine", 1.0)],
                                     train_len=30)
    trajs, ctls = np.asarray(trajs, np.float32), np.asarray(ctls, np.float32)
    cfg = TrainConfig(epochs=E, hidden=512, dtype="float32")
    spec = cfg.spec()
    mods = ["nsw", "short", "youngs", "lengthstiff"]
    rods = [apply_mod(mods[i % 4]) for i in range(G)]
    rods_st = jax.tree.map(lambda *xs: jnp.stack(xs), *rods)
    params = [init_mlp(spec, jax.random.PRNGKey(i), jnp.float32)
              for i in range(G)]
    params_st = jax.tree.map(lambda *xs: jnp.stack(xs), *params)

    peak = 197e12
    for mult in (1, 2, 4, 8, 16):
        tj = jnp.asarray(np.concatenate([trajs] * mult))
        cj = jnp.asarray(np.concatenate([ctls] * mult))
        n_cells = tj.shape[0] * (tj.shape[1] - 1) * len(cfg.keypoints)
        n_tiles, tile = _pick_tiling(n_cells, 512, spec.dims[0])
        run = make_fused_grid_training_run(spec, cfg, E)
        tg, cg = jnp.stack([tj] * G), jnp.stack([cj] * G)
        _, lg, _ = run(rods_st, params_st, tg, cg)
        jax.block_until_ready(lg)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, lg, _ = run(rods_st, params_st, tg, cg)
            jax.block_until_ready(lg)
            best = min(best, time.perf_counter() - t0)
        per_epoch = best / (G * E)
        flops_epoch = 2.0 * n_tiles * tile * 512 * (2 * spec.dims[0] + 75)
        mfu = 100.0 * flops_epoch / per_epoch / peak
        print("cells=%4d tiles=%dx%d: %.2f us/epoch/cell  mfu=%.2f%%"
              % (n_cells, n_tiles, tile, per_epoch * 1e6, mfu))


if __name__ == "__main__":
    main()
