"""Scaling studies beyond the reference's workload sizes.

1. Training-throughput scaling with batch (trajectories) x rollout length x
   MLP width — the reference trains 2 trajectories of 30 steps at hidden=512
   (physics_train.py:33-43); this measures how far the one-program epoch
   scan is from saturating the chip (it is latency-bound at reference scale,
   so batch is nearly free).
2. grid_train on a 1-device vs an 8-virtual-device mesh — validates that
   sharding the experiment grid over the "data" mesh axis neither changes
   results nor adds meaningful overhead. NOTE: virtual CPU devices all share
   this box's single physical core, so this measures *sharding overhead*,
   not speedup; on a real 8-chip slice the grid axis scales linearly because
   the cells are embarrassingly parallel (one psum-free vmap lane each).

Usage: python scripts/bench_scaling.py [--grid]
"""
import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def bench_training_scaling():
    import jax
    import jax.numpy as jnp
    from knode_cosserat_tpu import apply_mod
    from knode_cosserat_tpu.models import init_mlp
    from knode_cosserat_tpu.training import TrainConfig
    from knode_cosserat_tpu.training.train import (make_epoch_scan,
                                                   make_optimizer)

    p_mod = apply_mod("nsw")
    N = 10
    epochs = 50
    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}")
    print("hidden  B    T    epochs/s  state-evals/s  GFLOP/program")
    for hidden, B, T in [(512, 2, 30), (512, 64, 128),
                         (2048, 32, 128), (4096, 64, 128)]:
        cfg = TrainConfig(epochs=epochs, hidden=hidden, dtype="float32")
        spec = cfg.spec()
        opt = make_optimizer(cfg)
        params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)
        opt_state = opt.init(params)
        run = make_epoch_scan(p_mod, spec, opt, cfg.keypoints, True, epochs)
        key = jax.random.PRNGKey(1)
        # synthetic rollout-shaped data: content is irrelevant to throughput
        tj = jax.random.normal(key, (B, T, N, 25), jnp.float32) * 0.01
        cj = jnp.abs(jax.random.normal(key, (B, T, 4), jnp.float32)) + 5.0
        out = run(params, opt_state, tj, cj)
        jax.block_until_ready(out[2])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(params, opt_state, tj, cj)
            jax.block_until_ready(out[2])
            best = min(best, time.perf_counter() - t0)
        eps = epochs / best
        evals = B * (T - 1) * len(cfg.keypoints)
        try:
            cost = run.lower(params, opt_state, tj, cj).compile(
            ).cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            gflop = float(cost.get("flops", 0.0)) / 1e9
        except Exception:
            gflop = float("nan")
        print(f"{hidden:6d} {B:4d} {T:4d} {eps:9.1f} "
              f"{eps * evals:13.3e} {gflop:10.2f}")


def bench_grid_mesh():
    # must set up virtual devices before any backend touch
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from knode_cosserat_tpu.parallel import make_mesh
    from knode_cosserat_tpu.parallel.grid import build_grid, grid_train
    from knode_cosserat_tpu.training import TrainConfig

    cells = build_grid(["sine 0.5"], [None, "nsw", "noair", "short"], 2)
    cfg = TrainConfig(epochs=100, hidden=64, dtype="float32", log_every=100)
    for mesh in (None, make_mesh(data=8)):
        label = "unsharded" if mesh is None else "8-dev mesh"
        t0 = time.perf_counter()
        res = grid_train(cells, cfg, mesh=mesh, train_len=10)
        dt = time.perf_counter() - t0
        print(f"grid_train {len(cells)} cells x {cfg.epochs} epochs "
              f"[{label}]: {dt:.1f}s wall, final losses "
              f"{res.loss_history[-1].round(6)}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", action="store_true",
                    help="run the grid-over-mesh check (CPU, virtual "
                         "devices) instead of the TPU scaling table")
    args = ap.parse_args()
    if args.grid:
        bench_grid_mesh()
    else:
        bench_training_scaling()
