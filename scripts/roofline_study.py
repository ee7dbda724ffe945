"""Roofline + saturation study for the training and rollout kernels.

VERDICT-r3 item 2: the flagship bench shapes are tiny (0.54% MFU at the
reference config), so "1,447x the torch baseline" says the reference was
slow, not that the TPU is used. This study answers the honest question:
what does utilization look like as the workload grows, where does it
saturate, and what ceiling does the hardware + workload shape impose?

Three sweeps (all measured on chip, queued timing like bench.py):

  * training: epochs/s and MFU over hidden width x cell count, for both
    the XLA epoch scan and the fused whole-run Pallas kernel
    (reference workload shape: cosserat_ode_torch.py:401-437 — cells =
    B x (T-1) x keypoints teacher-forced one-step residuals).
  * grid: the vmapped multitrain kernel over grid size G
    (physics_multitrain.py:140-157's (data x mod x seed) sweep as one
    program).
  * rollout: mega-kernel steps/s over rod batch B at N=10/40.

Analytic ceilings (printed + saved):

  * thin-matmul MXU occupancy — every MXU op in this model has a
    contraction or output dim far below the 128-lane tile (din=53 in,
    25 state channels out), so even a VMEM-resident kernel cannot
    exceed the padding-weighted occupancy.
  * HBM activation traffic — the XLA path materializes the (cells,
    hidden) activations between matmuls; its arithmetic intensity caps
    MFU at AI x BW / peak regardless of schedule.

Usage (background the TPU run; the axon plugin ignores JAX_PLATFORMS):

    python scripts/roofline_study.py --out data/roofline.json
    python scripts/roofline_study.py --report data/roofline.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

KEYPOINTS = 4          # DEFAULT_KEYPOINTS_FAST
DIN = 53               # history-mode MLP input (28-mode is thinner still)
DOUT = 25


def matmul_flops(cells: int, hidden: int, din: int = DIN) -> float:
    """Model matmul FLOPs per epoch (MFU convention: fwd W1@x, W2@h;
    bwd dW2, dh, dW1 — same count bench.py uses)."""
    return 2.0 * cells * hidden * (2 * din + 3 * DOUT)


def thin_matmul_ceiling(din: int = DIN, dout: int = DOUT,
                        lane: int = 128) -> float:
    """FLOP-weighted MXU occupancy ceiling for this model's matmuls.

    Each 128x128 MXU tile is padded along any dim below 128: W1@x and
    dW1 contract/produce over din (occupancy din/lane); W2@h, dW2 and dh
    contract/produce over the 25 state channels (dout/lane). hidden and
    cells are large, so the other dims are full."""
    f_thin_din = 2 * din          # W1@x + dW1 (per 2*cells*hidden)
    f_thin_dout = 3 * dout        # W2@h + dW2 + dh
    occ = (f_thin_din * min(din / lane, 1.0)
           + f_thin_dout * min(dout / lane, 1.0))
    return occ / (f_thin_din + f_thin_dout)


def xla_traffic_ceiling(cells: int, hidden: int, bw: float, peak: float,
                        din: int = DIN) -> float:
    """MFU ceiling for the materializing (XLA) path from HBM traffic.

    Per epoch, the dominant traffic is the (cells, hidden) activation
    tensor: written fwd, read for dh, dh written, read for dW1 — ~4
    passes in f32 — plus the cell inputs and the weight tensors (small
    at large cells). AI = FLOPs / bytes; ceiling = AI * BW / peak."""
    act = 4.0 * cells * hidden * 4
    inputs = 2.0 * cells * (din + 60) * 4
    weights = 3.0 * (din * hidden + hidden * DOUT) * 4
    ai = matmul_flops(cells, hidden, din) / (act + inputs + weights)
    return min(1.0, ai * bw / peak)


DEVICE_SPECS = (
    # (substring, bf16 peak FLOP/s, HBM bytes/s)
    ("v6", 918e12, 1640e9),
    ("v5p", 459e12, 2765e9),
    ("v5", 197e12, 819e9),       # v5e / v5litepod
    ("v4", 275e12, 1228e9),
)


def device_specs():
    import jax
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, peak, bw in DEVICE_SPECS:
        if key in kind:
            return kind, peak, bw
    return kind or "unknown", 197e12, 819e9


def timeit_queued(fn, n=5, reps=3):
    import jax
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[-1])
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def sweep_training(epochs: int = 50):
    import jax
    import jax.numpy as jnp
    from knode_cosserat_tpu import apply_mod
    from knode_cosserat_tpu.models import init_mlp
    from knode_cosserat_tpu.ops.pallas_train import (
        MAX_CELLS, _pick_tiling, fused_trainer_supported,
        make_fused_training_run)
    from knode_cosserat_tpu.training import TrainConfig
    from knode_cosserat_tpu.training.train import (make_epoch_scan,
                                                   make_optimizer)

    kind, peak, bw = device_specs()
    p_mod = apply_mod("nsw")
    N = 10
    rows = []

    # (hidden, B, T): hidden sweep at the train-real cell count (1904 =
    # 4 x 119 x 4, train_segment.py's sinesinestepstep config), then a
    # cells sweep at hidden=4096, up to ~122k cells.
    configs = [(h, 4, 120) for h in (512, 1024, 2048, 4096, 8192)]
    configs += [(4096, B, 120) for B in (1, 16, 64, 256)]
    configs += [(8192, B, 120) for B in (64, 256)]
    seen = set()
    for hidden, B, T in configs:
        if (hidden, B, T) in seen:
            continue
        seen.add((hidden, B, T))
        cells = B * (T - 1) * KEYPOINTS
        cfg = TrainConfig(epochs=epochs, hidden=hidden, dtype="float32")
        spec = cfg.spec()
        params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)
        key = jax.random.PRNGKey(1)
        tj = jax.random.normal(key, (B, T, N, 25), jnp.float32) * 0.01
        cj = jnp.abs(jax.random.normal(key, (B, T, 4), jnp.float32)) + 5.0

        for path in ("xla", "fused"):
            if path == "fused":
                if not (fused_trainer_supported(spec, cells)
                        and jax.default_backend() != "cpu"):
                    continue
                n_tiles, tile = _pick_tiling(cells, hidden, spec.dims[0])
                flops = matmul_flops(n_tiles * tile, hidden, spec.dims[0])
                run_f = make_fused_training_run(p_mod, spec, cfg, epochs)
                fn = lambda: run_f(params, tj, cj)   # noqa: E731
            else:
                flops = matmul_flops(cells, hidden, spec.dims[0])
                opt = make_optimizer(cfg)
                opt_state = opt.init(params)
                run_x = make_epoch_scan(p_mod, spec, opt, cfg.keypoints,
                                        True, epochs)
                fn = lambda: run_x(params, opt_state, tj, cj)  # noqa: E731
            try:
                t0 = time.perf_counter()
                jax.block_until_ready(jax.tree.leaves(fn())[-1])
                compile_s = time.perf_counter() - t0
                dt = timeit_queued(fn)
            except Exception as e:      # OOM/unsupported is a data point
                rows.append(dict(hidden=hidden, B=B, T=T, cells=cells,
                                 path=path, error=str(e)[:200]))
                print(f"  h={hidden} cells={cells} [{path}]: "
                      f"REFUSED {str(e)[:120]}")
                continue
            eps = epochs / dt
            mfu = flops * eps / peak
            rows.append(dict(
                hidden=hidden, B=B, T=T, cells=cells, path=path,
                epochs_per_sec=round(eps, 1), mfu_pct=round(100 * mfu, 3),
                gflops_per_epoch=round(flops / 1e9, 3),
                compile_s=round(compile_s, 1),
                ceiling_traffic_pct=round(
                    100 * xla_traffic_ceiling(cells, hidden, bw, peak), 1)
                if path == "xla" else None))
            print(f"  h={hidden} cells={cells} [{path}]: {eps:.1f} eps, "
                  f"MFU {100 * mfu:.2f}%")
    return rows


def sweep_grid(epochs: int = 50):
    import jax
    import jax.numpy as jnp
    from knode_cosserat_tpu import apply_mod
    from knode_cosserat_tpu.models import init_mlp
    from knode_cosserat_tpu.ops.pallas_train import (
        _pick_tiling, make_fused_grid_training_run)
    from knode_cosserat_tpu.training import TrainConfig

    kind, peak, bw = device_specs()
    if jax.default_backend() == "cpu":
        return []
    rows = []
    B, T, N = 2, 15, 10      # the reference multitrain cell shape
    cells = B * (T - 1) * KEYPOINTS
    cfg = TrainConfig(epochs=epochs, hidden=512, dtype="float32")
    spec = cfg.spec()
    mods = ["nsw", "short", "youngs", "lengthstiff"]
    for G in (40, 160, 640):
        rods = [apply_mod(mods[i % 4]) for i in range(G)]
        rods_st = jax.tree.map(lambda *xs: jnp.stack(xs), *rods)
        params = [init_mlp(spec, jax.random.PRNGKey(i), jnp.float32)
                  for i in range(G)]
        params_st = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
        key = jax.random.PRNGKey(1)
        tj = jax.random.normal(key, (G, B, T, N, 25), jnp.float32) * 0.01
        cj = jnp.abs(jax.random.normal(key, (G, B, T, 4), jnp.float32)) + 5.0
        run = make_fused_grid_training_run(spec, cfg, epochs)
        fn = lambda: run(rods_st, params_st, tj, cj)     # noqa: E731
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(jax.tree.leaves(fn())[-1])
            compile_s = time.perf_counter() - t0
            dt = timeit_queued(fn, n=3)
        except Exception as e:
            rows.append(dict(G=G, error=str(e)[:200]))
            print(f"  grid G={G}: REFUSED {str(e)[:120]}")
            continue
        n_tiles, tile = _pick_tiling(cells, cfg.hidden, spec.dims[0])
        flops = G * matmul_flops(n_tiles * tile, cfg.hidden, spec.dims[0])
        mxeps = G * epochs / dt
        mfu = flops * (epochs / dt) / peak
        rows.append(dict(G=G, cells_each=cells,
                         models_x_epochs_per_sec=round(mxeps),
                         mfu_pct=round(100 * mfu, 3),
                         compile_s=round(compile_s, 1)))
        print(f"  grid G={G}: {mxeps:.0f} model-epochs/s, "
              f"MFU {100 * mfu:.2f}%")
    return rows


def sweep_rollout():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from knode_cosserat_tpu import calc_controls, experimental_rod
    from knode_cosserat_tpu.core.fast_rollout import make_fast_rollout

    if jax.default_backend() == "cpu":
        return []
    rows = []
    T = 50
    for N in (10, 40):
        pN = experimental_rod(N=N, dtype=jnp.float32)
        for B in (16, 64, 256, 1024, 4096):
            ctls = jnp.asarray(np.stack([
                calc_controls("sine", 0.5 + 0.01 * (i % 100),
                              float(pN.del_t), T)
                for i in range(B)]), jnp.float32)
            fast = jax.jit(make_fast_rollout(pN, tol=1e-10, block_b=256,
                                             impl="mega"))
            fn = lambda: fast(ctls)                      # noqa: E731
            try:
                jax.block_until_ready(jax.tree.leaves(fn())[-1])
                dt = timeit_queued(fn, n=3)
            except Exception as e:
                rows.append(dict(N=N, B=B, error=str(e)[:200]))
                print(f"  rollout N={N} B={B}: REFUSED {str(e)[:120]}")
                continue
            sps = B * (T - 1) / dt
            rows.append(dict(N=N, B=B, steps_per_sec=round(sps)))
            print(f"  rollout N={N} B={B}: {sps:.0f} steps/s")
    return rows


def report(path):
    with open(path) as f:
        d = json.load(f)
    print(f"device {d['device']}  peak {d['peak_flops'] / 1e12:.0f} TF/s "
          f"bf16  HBM {d['hbm_bytes_per_sec'] / 1e9:.0f} GB/s")
    print(f"thin-matmul MXU occupancy ceiling: "
          f"{100 * d['thin_matmul_ceiling']:.1f}%")
    print("\n| hidden | cells | path | epochs/s | MFU % | traffic ceiling % |")
    print("|---|---|---|---|---|---|")
    for r in d["training"]:
        if "error" in r:
            print(f"| {r['hidden']} | {r['cells']} | {r['path']} | "
                  f"refused | — | — |")
            continue
        ceil = (f"{r['ceiling_traffic_pct']}"
                if r.get("ceiling_traffic_pct") else "—")
        print(f"| {r['hidden']} | {r['cells']} | {r['path']} | "
              f"{r['epochs_per_sec']} | {r['mfu_pct']} | {ceil} |")
    print("\n| G | model-epochs/s | MFU % |")
    print("|---|---|---|")
    for r in d["grid"]:
        if "error" in r:
            continue
        print(f"| {r['G']} | {r['models_x_epochs_per_sec']} | "
              f"{r['mfu_pct']} |")
    print("\n| N | B | steps/s |")
    print("|---|---|---|")
    for r in d["rollout"]:
        if "error" in r:
            continue
        print(f"| {r['N']} | {r['B']} | {r['steps_per_sec']} |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="data/roofline.json")
    ap.add_argument("--report", type=str, default=None)
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["training", "grid", "rollout"])
    args = ap.parse_args()
    if args.report:
        report(args.report)
        return

    from knode_cosserat_tpu.cli import enable_compile_cache
    enable_compile_cache()
    import jax
    kind, peak, bw = device_specs()
    print(f"backend={jax.default_backend()} device={kind}")
    out = {"device": kind, "peak_flops": peak, "hbm_bytes_per_sec": bw,
           "thin_matmul_ceiling": thin_matmul_ceiling(),
           "training": [], "grid": [], "rollout": []}
    if "training" not in args.skip:
        print("== training sweep ==")
        out["training"] = sweep_training()
    if "grid" not in args.skip:
        print("== grid sweep ==")
        out["grid"] = sweep_grid()
    if "rollout" not in args.skip:
        print("== rollout sweep ==")
        out["rollout"] = sweep_rollout()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
