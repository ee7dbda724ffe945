"""Headline benchmark: batched KNODE training throughput on TPU vs the
reference PyTorch-CPU fast path (BASELINE.md target: >= 50x).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload parity: both sides run the physics_multitrain.py training config —
2 trajectories ("sine sine 0.5 1.0"), train_len=30, keypoints [3,5,7,9],
hidden=512, Adam + plateau scheduler + weight clamp — one full epoch =
forward+backward over all (trajectory, timestep, keypoint) cells plus the
optimizer update. The torch baseline is measured live from the reference at
/root/reference when present, else a stored measurement is used.
"""
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

STORED_BASELINE_FILE = os.path.join(HERE, "bench_baseline_torch_cpu.json")

EPOCHS_MEASURE = 200
TRAIN_LEN = 30
HIDDEN = 512
SPECS = [("sine", 0.5), ("sine", 1.0)]


def measure_torch_cpu_epoch():
    """Time the reference fast-path epoch (physics_train.py:306-408) on CPU,
    driving the unmodified reference code as an oracle."""
    import torch
    sys.path.insert(0, "/root/reference/knode_cosserat")
    from cosserat_ode_torch import CosseratRodTorch
    from knode import setup_robot
    from Utils.transformations import quaternion_to_euler as q2e

    torch.set_num_threads(1)  # physics_train.py:179
    torch.manual_seed(0)
    robot = CosseratRodTorch("cpu", HIDDEN)
    setup_robot(robot, "nsw")
    robot.use_nn = True

    # training data: load the same trajectories our side trains on
    data = np.load(os.path.join(HERE, "tests", "golden",
                                "bench_data.npz"))
    traj_list = [torch.tensor(t).float() for t in data["trajs"]]
    ctl_list = [torch.tensor(c).float() for c in data["controls"]]

    optimizer = torch.optim.Adam(robot.nn_models.parameters(), lr=1e-2)
    scheduler = torch.optim.lr_scheduler.ReduceLROnPlateau(
        optimizer, "min", patience=80, factor=0.5)
    loss_func = torch.nn.MSELoss()
    kp = np.array([3, 5, 7, 9])

    def epoch():
        grow_loss = 0
        for traj, controls in zip(traj_list, ctl_list):
            bl = traj.shape[0]
            ys = traj[: bl - 1, 0:19, :]
            zs = traj[: bl - 1, 19:, :]
            y_prevs = torch.cat((ys[:1], ys[:-1]))
            z_prevs = torch.cat((zs[:1], zs[:-1]))
            Gs = traj[1:bl]
            grow_trajs = robot.parallelGetNextSegmentEuler(Gs, kp, {
                "yh": robot.c1 * ys + robot.c2 * y_prevs,
                "zh": robot.c1 * zs + robot.c2 * z_prevs,
                "tendon_tensions": controls[: bl - 1],
            })
            for i in range(bl - 1):
                g, t = grow_trajs[i], traj[i + 1]
                grow_loss = grow_loss + (
                    loss_func(g[:3], t[:3, kp])
                    + loss_func(g[7:19], t[7:19, kp])
                    + loss_func(q2e(g[3:7]), q2e(t[3:7, kp]))
                    + loss_func(g[19:], t[19:, kp - 1]))
        total = grow_loss / (bl - 1)
        optimizer.zero_grad()
        total.backward()
        optimizer.step()
        scheduler.step(total)
        for name, param in robot.nn_models.named_parameters():
            if "weight" in name:
                with torch.no_grad():
                    param.clamp_(min=0)

    epoch()  # warmup
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        epoch()
    dt = (time.perf_counter() - t0) / n
    return 1.0 / dt  # epochs/sec


def main():
    import jax
    import jax.numpy as jnp
    from knode_cosserat_tpu import apply_mod
    from knode_cosserat_tpu.training import (TrainConfig, make_training_data)
    from knode_cosserat_tpu.training.train import make_optimizer

    ref = apply_mod(None)
    p_mod = apply_mod("nsw")

    # data comes from the f64 CPU-exact golden generator when available so
    # both sides train on identical inputs
    bench_data = os.path.join(HERE, "tests", "golden", "bench_data.npz")
    if os.path.exists(bench_data):
        d = np.load(bench_data)
        trajs = np.moveaxis(d["trajs"], 2, 3)  # (B, T, 25, N) -> (B, T, N, 25)
        ctls = d["controls"]
    else:
        trajs, ctls = make_training_data(ref, SPECS, train_len=TRAIN_LEN)
        trajs, ctls = np.asarray(trajs), np.asarray(ctls)
        np.savez_compressed(bench_data,
                            trajs=np.moveaxis(trajs, 2, 3), controls=ctls)

    cfg = TrainConfig(epochs=EPOCHS_MEASURE, hidden=HIDDEN, dtype="float32")
    optimizer = make_optimizer(cfg)
    from knode_cosserat_tpu.models import init_mlp
    from knode_cosserat_tpu.training.train import make_epoch_scan
    spec = cfg.spec()
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)
    opt_state = optimizer.init(params)
    run = make_epoch_scan(p_mod, spec, optimizer, cfg.keypoints, True,
                          EPOCHS_MEASURE)

    tj = jnp.asarray(trajs, jnp.float32)
    cj = jnp.asarray(ctls, jnp.float32)

    # warmup/compile
    p1, o1, losses = run(params, opt_state, tj, cj)
    jax.block_until_ready(losses)

    t0 = time.perf_counter()
    p1, o1, losses = run(params, opt_state, tj, cj)
    jax.block_until_ready(losses)
    ours = EPOCHS_MEASURE / (time.perf_counter() - t0)
    assert np.isfinite(np.asarray(losses)).all()

    # torch CPU baseline. The denominator is the FASTEST torch measurement
    # ever recorded (CPU contention can only slow torch down, so taking the
    # max keeps the reported speedup conservative/fair).
    torch_eps = None
    stored = None
    if os.path.exists(STORED_BASELINE_FILE):
        with open(STORED_BASELINE_FILE) as f:
            stored = json.load(f)["torch_cpu_epochs_per_sec"]
    try:
        if os.path.isdir("/root/reference/knode_cosserat"):
            torch_eps = measure_torch_cpu_epoch()
    except Exception as e:
        print(f"# live torch baseline failed: {e}", file=sys.stderr)
    torch_eps = max(x for x in (torch_eps, stored) if x is not None) \
        if (torch_eps or stored) else None
    if torch_eps is not None:
        with open(STORED_BASELINE_FILE, "w") as f:
            json.dump({"torch_cpu_epochs_per_sec": torch_eps,
                       "config": {"trajs": 2, "train_len": TRAIN_LEN,
                                  "hidden": HIDDEN}}, f)

    vs = (ours / torch_eps) if torch_eps else None
    print(json.dumps({
        "metric": "knode_batched_training_throughput",
        "value": round(ours, 3),
        "unit": "epochs/sec",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
