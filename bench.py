"""Headline benchmark: batched KNODE training throughput on TPU vs the
reference PyTorch-CPU fast path (BASELINE.md target: >= 50x).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The primary metric is the training throughput; "extra" carries the other
regression-guarded numbers (also written to BENCH_DETAIL.json):
  rollout_xla_steps_per_sec_n10     — vmapped lax.scan rollout, B=256
  rollout_fused_steps_per_sec_n10   — fused Pallas sweep rollout (unrolled)
  rollout_fused_steps_per_sec_n40   — fused Pallas sweep rollout (pipelined)
  serving_latency_ms                — single-rod fused BDF-2 step
  parity_tip_rmse_m                 — f32 rollout vs the f64 CPU golden
  training_mfu_pct                  — epoch-program FLOPs / time / bf16 peak
Set KNODE_BENCH_FAST=1 to emit only the headline (skips the extras).

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


# ------------------------------------------------------------------------
# Perf-regression tripwire (round-3 verdict item 5): every bench run
# compares its metrics against the most recent driver-recorded BENCH_r*.json
# and emits a "regressions" report — warn at >=10% loss, fail at >=25% —
# so drifts like the round-2->3 N=40 mega-kernel -3% become visible the
# round they happen. tests/test_tpu_kernels.py asserts fail is empty.

_HIGHER_BETTER = ("per_sec", "epochs_per_sec", "mfu_pct")
_LOWER_BETTER = ("latency", "wall_s", "rmse")
_SKIP = ("compile_s",)   # compile walls are cache-state, not perf
# Sub-millisecond latency metrics ride the axon tunnel's host-round-trip
# jitter (measured 2.3x spread within ONE session, round 4) — escalate to
# fail only past the observed noise envelope.
_NOISY = {"serving_latency_ms": 0.60}


def _load_previous_bench(history_dir):
    """Latest BENCH_r*.json with a parsed metric line, or (None, None)."""
    import glob
    for path in sorted(glob.glob(os.path.join(history_dir,
                                              "BENCH_r*.json")),
                       reverse=True):
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = doc.get("parsed") or doc
        if isinstance(parsed, dict) and parsed.get("extra"):
            return parsed, os.path.basename(path)
    return None, None


def detect_regressions(value, extras, history_dir=HERE,
                       warn_at=0.10, fail_at=0.25):
    """Compare this run's metrics to the previous round's bench record.

    Returns {"baseline", "warn": {metric: -pct}, "fail": {metric: -pct}};
    only metrics with a known goodness direction are compared, and compile
    walls are excluded (they measure cache state)."""
    prev, src = _load_previous_bench(history_dir)
    report = {"baseline": src, "warn": {}, "fail": {}}
    if prev is None:
        return report
    old_metrics = dict(prev.get("extra") or {})
    old_metrics["headline_epochs_per_sec"] = prev.get("value")
    new_metrics = dict(extras)
    new_metrics["headline_epochs_per_sec"] = value
    for name, new in new_metrics.items():
        old = old_metrics.get(name)
        if (not isinstance(old, (int, float))
                or not isinstance(new, (int, float))
                or isinstance(old, bool) or isinstance(new, bool)
                or not old or any(k in name for k in _SKIP)):
            continue
        if any(k in name for k in _HIGHER_BETTER):
            change = (new - old) / abs(old)    # negative = got worse
        elif any(k in name for k in _LOWER_BETTER):
            change = (old - new) / abs(old)
        else:
            continue
        metric_fail_at = _NOISY.get(name, fail_at)
        if change <= -metric_fail_at:
            report["fail"][name] = round(change * 100, 1)
        elif change <= -warn_at:
            report["warn"][name] = round(change * 100, 1)
    return report


# bf16 peak FLOP/s by device kind substring (MFU denominator). The point of
# reporting MFU on this workload is honesty: the rod problem is tiny and
# launch-bound, so the number is small — it tells you scaling headroom.
PEAK_FLOPS = (
    ("v6", 918e12), ("v5p", 459e12), ("v5", 197e12), ("v4", 275e12),
)


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, val in PEAK_FLOPS:
        if key in kind:
            return val
    return 197e12


def _timeit(fn, *args, iters=5, windows=3):
    """Best-of-``windows`` averaged timing windows (after one compile/
    warmup call). The tunneled chip occasionally stalls a single window;
    min-of-windows reports steady-state throughput instead of the stall
    (the headline trainer metric already does the same)."""
    import jax
    import time as _t
    t0 = _t.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = _t.perf_counter() - t0
    best = float("inf")
    for _ in range(windows):
        t0 = _t.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (_t.perf_counter() - t0) / iters)
    return best, compile_s


def measure_extras(ref, golden_trajs, golden_ctls):
    """Secondary regression metrics (rollout, serving, parity, MFU inputs).
    Each is cheap to measure but guards a distinct code path."""
    import jax
    import jax.numpy as jnp
    from knode_cosserat_tpu import calc_controls, experimental_rod
    from knode_cosserat_tpu.core.fast_rollout import make_fast_rollout
    from knode_cosserat_tpu.core.stepper import simulate_scan

    on_cpu = jax.default_backend() == "cpu"
    # mega = whole Newton shooting step in one kernel launch
    # (ops/pallas_step.py) — the fastest fused path on TPU
    impl = "xla" if on_cpu else "mega"
    extras = {}
    B, T = 256, 50

    # --- XLA scan rollout, N=10 ---
    p10 = experimental_rod(N=10, dtype=jnp.float32)
    ctls = jnp.asarray(np.stack([
        calc_controls("sine", 0.5 + 0.01 * i, float(p10.del_t), T)
        for i in range(B)]), jnp.float32)
    xla = jax.jit(jax.vmap(lambda c: simulate_scan(p10, c, tol=1e-10).traj))
    dt, _ = _timeit(xla, ctls)
    extras["rollout_xla_steps_per_sec_n10"] = round(B * (T - 1) / dt)

    # --- fused rollouts (mega step kernel; block_b=256 measured best) ---
    for N in (10, 40):
        pN = experimental_rod(N=N, dtype=jnp.float32)
        fast = jax.jit(make_fast_rollout(pN, tol=1e-10,
                                         block_b=256, impl=impl))
        dt, compile_s = _timeit(fast, ctls)
        extras[f"rollout_fused_steps_per_sec_n{N}"] = round(B * (T - 1) / dt)
        extras[f"rollout_fused_compile_s_n{N}"] = round(compile_s, 1)

    # --- parallel-in-space multiple shooting: fine-rod latency path ---
    # (core/multiple_shooting.py). Single-rollout steps/s at N=161, S=80
    # with the structured (block-bidiagonal) Newton vs the sequential
    # sweep's ~33 — the SURVEY §5 "parallel-in-space Newton" capability,
    # regression-guarded.
    if not on_cpu:
        from knode_cosserat_tpu.core.multiple_shooting import \
            simulate_scan_ms
        p161 = experimental_rod(N=161, dtype=jnp.float32)
        ctl1 = ctls[0]
        ms = jax.jit(lambda c: simulate_scan_ms(p161, c, 80,
                                                tol=1e-10).traj)
        dt, _ = _timeit(ms, ctl1)
        extras["rollout_ms_steps_per_sec_n161"] = round((T - 1) / dt)

    # --- multi-rod assembly: coupled parallel-continuum rollout ---
    # (core/assembly.py — no reference counterpart). 3 rods + rigid plate,
    # one Newton system over [per-rod reactions, plate pose] per step.
    if not on_cpu:
        from knode_cosserat_tpu.core.assembly import (make_ring_assembly,
                                                      simulate_assembly)
        asm = make_ring_assembly(n_rods=3, base_radius=0.05, N=10,
                                 dtype=jnp.float32)
        actl = jnp.broadcast_to(jnp.asarray(ctls[0], jnp.float32)[:, None, :],
                                (T, 3, 4))
        arun = jax.jit(lambda c: simulate_assembly(asm, c).traj)
        dt, _ = _timeit(arun, actl)
        extras["assembly_steps_per_sec_3rods"] = round((T - 1) / dt)

        # batched assemblies: the MPC/planning workload (many candidate
        # tension schedules through the coupled solve at once) — vmap
        # turns the latency-bound 25-dim Newton into throughput
        # (measured 29x from B=1 to B=256, docs/BENCHMARKS.md)
        Ba = 256
        bctl = 5.0 + jax.random.uniform(jax.random.PRNGKey(0),
                                        (Ba, T, 3, 4), jnp.float32)
        brun = jax.jit(jax.vmap(
            lambda c: simulate_assembly(asm, c, tol=1e-8).plate_pose))
        dt, _ = _timeit(brun, bctl)
        extras["assembly_batched_steps_per_sec_b256"] = round(
            Ba * (T - 1) / dt)

    # --- sysid: teacher-objective Adam steps/s (f32, one jitted scan) ---
    # regression metric for the identification subsystem (training/sysid):
    # plant = reference rod, model = 'youngs' fault, fit log E.
    if not on_cpu:
        from knode_cosserat_tpu.core.params import experimental_rod
        from knode_cosserat_tpu.training.sysid import fit_rod_params
        ps_true = experimental_rod(dtype=jnp.float32)
        s_ctl = jnp.asarray(ctls[0][:30], jnp.float32)
        s_traj = jax.jit(lambda c: simulate_scan(ps_true, c).traj)(
            s_ctl)[:, :, :25]
        p_fault = experimental_rod("youngs", dtype=jnp.float32)
        SYS_STEPS = 200

        def _sysid_run():
            return fit_rod_params(p_fault, s_traj, s_ctl, fields=("E",),
                                  steps=SYS_STEPS, lr=0.1).loss_history

        # best-of-3: the ~1 s wall rides host re-trace + tunnel jitter
        # (drifted -21% on a single sample between r03 and r04 runs)
        _sysid_run()                              # populate compile cache
        dt, hist = float("inf"), None
        for _ in range(3):
            t0 = time.perf_counter()
            hist = _sysid_run()
            dt = min(dt, time.perf_counter() - t0)
        # end-to-end wall of a 200-step E-fit (each call re-traces the
        # fresh jit closure; XLA compile is cache-hit) — the user-visible
        # "how long does an identification run take" regression number
        if np.isfinite(np.asarray(hist)).all():
            extras["sysid_fit200_wall_s"] = round(dt, 2)

    # --- serving latency: one rod, one BDF-2 step (AOT stepper) ---
    # reps=10: the axon tunnel's host-round-trip jitter spreads a single
    # best-of-3 measurement 0.49-1.11 ms WITHIN one session (measured
    # round 4); the min over 10 loops is the stable dispatch+device floor
    from knode_cosserat_tpu.serving import CompiledStepper
    stepper = CompiledStepper(p10, fast=not on_cpu)
    extras["serving_latency_ms"] = round(
        stepper.benchmark(100, reps=10)["latency_ms"], 3)

    # --- parity: f32 device rollout vs the f64 CPU-exact golden ---
    # golden_trajs: (B, T, N, 25) state-last
    if golden_trajs is not None:
        ctl0 = jnp.asarray(golden_ctls[0], jnp.float32)
        traj = np.asarray(jax.jit(
            lambda c: simulate_scan(ref, c, tol=1e-16).traj)(ctl0))
        tip = traj[:, -1, :3]
        gold_tip = np.asarray(golden_trajs[0])[:, -1, :3]
        extras["parity_tip_rmse_m"] = float(
            np.sqrt(np.mean((tip - gold_tip[: len(tip)]) ** 2)))
    return extras


def main():
    import jax
    if os.environ.get("KNODE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["KNODE_PLATFORM"])
    from knode_cosserat_tpu.cli import enable_compile_cache
    enable_compile_cache()
    # The axon TPU tunnel occasionally fails to acquire the chip for a
    # minute or so after another process releases it, and JAX then falls
    # back to CPU silently — which would record garbage numbers. Re-exec
    # until the accelerator comes back (unless CPU was asked for).
    retries = int(os.environ.get("KNODE_BENCH_TPU_RETRIES", "5"))
    if (jax.default_backend() == "cpu"
            and not os.environ.get("KNODE_PLATFORM") and retries > 0):
        print(f"# TPU backend unavailable (transient axon lease?); "
              f"re-exec in 60s ({retries} retries left)", file=sys.stderr)
        time.sleep(60)
        os.environ["KNODE_BENCH_TPU_RETRIES"] = str(retries - 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
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

    # Queued timing (5 runs per sync), best of 3: a per-run sync charges
    # the axon tunnel's ~30 ms host round trip to the chip — measured
    # ~85% of the old headline was tunnel latency, not device time. A
    # locally attached TPU does not pay it. best-of guards against
    # transient lease stalls (observed 2.7x outliers).
    def timeit_queued(fn, n=5, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn()
            jax.block_until_ready(jax.tree.leaves(out)[-1])
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    train_seconds = timeit_queued(
        lambda: run(params, opt_state, tj, cj))
    xla_eps = EPOCHS_MEASURE / train_seconds
    ours = xla_eps
    _, _, losses = run(params, opt_state, tj, cj)
    assert np.isfinite(np.asarray(losses)).all()

    # fused whole-training-run kernel (ops/pallas_train.py): the entire
    # 200-epoch run is ONE kernel launch; headline when supported. This is
    # also the path `knode train` takes on TPU (training/train.py routes
    # chunks through it — cfg.fused="auto").
    extras_train = {"training_xla_epochs_per_sec": round(xla_eps, 1)}
    try:
        from knode_cosserat_tpu.ops.pallas_train import (
            fused_trainer_supported, make_fused_training_run)
        n_cells = int(tj.shape[0] * (tj.shape[1] - 1) * len(cfg.keypoints))
        if (fused_trainer_supported(spec, n_cells, cfg.weight_decay)
                and jax.default_backend() != "cpu"):
            run_f = make_fused_training_run(p_mod, spec, cfg,
                                            EPOCHS_MEASURE)
            fused_seconds = timeit_queued(lambda: run_f(params, tj, cj))
            fused_eps = EPOCHS_MEASURE / fused_seconds
            extras_train["training_fused_epochs_per_sec"] = round(
                fused_eps, 1)
            _, lf, _ = run_f(params, tj, cj)
            assert np.isfinite(np.asarray(lf)).all()
            if fused_eps > ours:
                ours = fused_eps
                train_seconds = fused_seconds
    except Exception as e:
        print(f"# fused trainer unavailable: {e}", file=sys.stderr)

    # --- MFU: ANALYTIC model FLOPs / time / bf16 peak ------------------
    # Standard MFU convention (model matmul FLOPs only; optimizer and
    # elementwise excluded). XLA's cost_analysis undercounted this program
    # ~200x in round 2 (0.036 vs ~7 analytic GFLOP per 200 epochs), so the
    # count is now explicit: per epoch the trainer runs five MXU matmuls
    # over Cp padded cells — W1@x, W2@h fwd; dW2, dh, dW1 bwd.
    extras = dict(extras_train)

    def epoch_matmul_flops(n_cells, hidden, din):
        # mirrors ops/pallas_train.precompute's tile padding exactly
        from knode_cosserat_tpu.ops.pallas_train import _pick_tiling
        n_tiles, tile = _pick_tiling(n_cells, hidden, din)
        return 2.0 * n_tiles * tile * hidden * (2 * din + 3 * 25)

    peak = _peak_flops(jax.devices()[0])
    n_cells = int(tj.shape[0] * (tj.shape[1] - 1) * len(cfg.keypoints))
    flops_epoch = epoch_matmul_flops(n_cells, HIDDEN, spec.dims[0])
    extras["training_mfu_pct"] = round(
        100.0 * flops_epoch * (EPOCHS_MEASURE / train_seconds) / peak, 5)
    extras["training_program_gflops"] = round(
        flops_epoch * EPOCHS_MEASURE / 1e9, 3)

    # --- the multitrain grid on the chip: 40 models (the reference's
    # physics_multitrain workload at n_seeds=5) as ONE vmapped fused
    # program — utilization scales with grid size (round-2 verdict item 2)
    if jax.default_backend() != "cpu":
        try:
            from knode_cosserat_tpu.ops.pallas_train import (
                make_fused_grid_training_run)
            from knode_cosserat_tpu.models import init_mlp as _init
            G = 40
            mods = ["nsw", "short", "youngs", "lengthstiff"]
            rods = [apply_mod(mods[i % 4]) for i in range(G)]
            rods_st = jax.tree.map(lambda *xs: jnp.stack(xs), *rods)
            params_g = [_init(spec, jax.random.PRNGKey(i), jnp.float32)
                        for i in range(G)]
            params_st = jax.tree.map(lambda *xs: jnp.stack(xs), *params_g)
            tg = jnp.stack([tj] * G)
            cg = jnp.stack([cj] * G)
            grid_run = make_fused_grid_training_run(spec, cfg,
                                                    EPOCHS_MEASURE)
            pg, lg, _ = grid_run(rods_st, params_st, tg, cg)   # compile
            jax.block_until_ready(lg)
            assert np.isfinite(np.asarray(lg)).all()
            gsec = timeit_queued(
                lambda: grid_run(rods_st, params_st, tg, cg), n=2)
            extras["grid_models_x_epochs_per_sec"] = round(
                G * EPOCHS_MEASURE / gsec)
            extras["grid_mfu_pct"] = round(
                100.0 * flops_epoch * G * EPOCHS_MEASURE / gsec / peak, 4)
        except Exception as e:
            print(f"# grid bench failed: {e}", file=sys.stderr)

    # --- wide (HBM-streamed) fused trainer: the h=8192 train-real shape.
    # Guards the streamed Mosaic lowering's throughput, which clears the
    # materializing XLA path's ~9% MFU traffic ceiling (docs/BENCHMARKS.md
    # wide roofline; measured 11.9% at this config).
    if jax.default_backend() != "cpu":
        try:
            from knode_cosserat_tpu.ops.pallas_train_wide import (
                make_wide_training_run, wide_trainer_supported)
            rngw = np.random.default_rng(0)
            Bw, Tw, Hw = 4, 120, 8192
            cfg_w = TrainConfig(epochs=EPOCHS_MEASURE, hidden=Hw,
                                dtype="float32", history=True)
            spec_w = cfg_w.spec()
            cells_w = Bw * (Tw - 1) * len(cfg_w.keypoints)
            assert wide_trainer_supported(spec_w, cells_w)
            tw = jnp.asarray(rngw.normal(size=(Bw, Tw, int(p_mod.N), 25))
                             * 0.01, jnp.float32)
            cw = jnp.asarray(rngw.uniform(1, 3, size=(Bw, Tw, 4)),
                             jnp.float32)
            params_w = init_mlp(spec_w, jax.random.PRNGKey(0), jnp.float32)
            run_w = make_wide_training_run(p_mod, spec_w, cfg_w,
                                           EPOCHS_MEASURE)
            _, lw, _ = run_w(params_w, tw, cw)            # compile
            jax.block_until_ready(lw)
            assert np.isfinite(np.asarray(lw)).all()
            wsec = timeit_queued(lambda: run_w(params_w, tw, cw), n=2)
            weps = EPOCHS_MEASURE / wsec
            extras["training_wide_h8192_epochs_per_sec"] = round(weps, 1)
            extras["training_wide_h8192_mfu_pct"] = round(
                100.0 * 2.0 * cells_w * Hw * (2 * spec_w.dims[0] + 75)
                * weps / peak, 3)
        except Exception as e:
            print(f"# wide trainer bench failed: {e}", file=sys.stderr)

    if not os.environ.get("KNODE_BENCH_FAST"):
        try:
            extras.update(measure_extras(ref, trajs, ctls))
        except Exception as e:
            print(f"# extras failed: {e}", file=sys.stderr)

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

    reg = detect_regressions(round(ours, 3), extras)
    extras["regressions"] = reg
    for sev in ("warn", "fail"):
        for name, pct in reg[sev].items():
            print(f"# REGRESSION[{sev}] {name}: {pct}% vs {reg['baseline']}",
                  file=sys.stderr)

    vs = (ours / torch_eps) if torch_eps else None
    line = {
        "metric": "knode_batched_training_throughput",
        "value": round(ours, 3),
        "unit": "epochs/sec",
        "vs_baseline": round(vs, 2) if vs else None,
        "extra": extras,
    }
    with open(os.path.join(HERE, "BENCH_DETAIL.json"), "w") as f:
        json.dump({**line, "device": str(jax.devices()[0].device_kind),
                   "backend": jax.default_backend()}, f, indent=1)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
