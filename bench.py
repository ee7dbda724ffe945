"""Headline benchmark: batched KNODE training throughput on TPU vs the
reference PyTorch-CPU fast path (BASELINE.md target: >= 50x).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Output contract (round-5 restructure — the round-4 driver run timed out
with NOTHING on stdout, rc=124/parsed=null):
  * The headline JSON line prints IMMEDIATELY after the headline
    measurement (XLA + fused trainer) and is flushed — nothing that can
    be slow (extras, grid/wide benches, the live torch baseline) runs
    before it.
  * Everything else streams into BENCH_DETAIL.json incrementally, one
    write per finished metric, under a global wall-clock budget
    (KNODE_BENCH_BUDGET_S, default 420 s; carried across the axon-lease
    re-exec via KNODE_BENCH_DEADLINE). When the budget runs out the
    remaining extras are skipped and listed in extra["skipped"].
  * The axon-lease retry loop is capped against the same budget (15 s
    sleeps, stops while >= 180 s remain for the headline).

Secondary metrics in BENCH_DETAIL.json (regression-guarded):
  rollout_xla_steps_per_sec_n10     — vmapped lax.scan rollout, B=256
  rollout_fused_steps_per_sec_n10   — fused Pallas sweep rollout (unrolled)
  rollout_fused_steps_per_sec_n40   — fused Pallas sweep rollout (pipelined)
  serving_latency_ms                — single-rod fused BDF-2 step
  parity_tip_rmse_m                 — f32 rollout vs the f64 CPU golden
  training_mfu_pct                  — epoch-program FLOPs / time / bf16 peak
Set KNODE_BENCH_FAST=1 to emit only the headline (skips the extras).
KNODE_BENCH_STRICT=1 exits 2 on a fail-level regression (default: report
to stderr + BENCH_DETAIL.json, exit 0 — the driver gate must record the
numbers even on a regressed round; the tpu-tier test enforces the gate).

Workload parity: both sides run the physics_multitrain.py training config —
2 trajectories ("sine sine 0.5 1.0"), train_len=30, keypoints [3,5,7,9],
hidden=512, Adam + plateau scheduler + weight clamp — one full epoch =
forward+backward over all (trajectory, timestep, keypoint) cells plus the
optimizer update. The torch baseline is the stored max measurement
(bench_baseline_torch_cpu.json), refreshed live from /root/reference
AFTER the headline prints when budget allows.
"""
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

STORED_BASELINE_FILE = os.path.join(HERE, "bench_baseline_torch_cpu.json")
DETAIL_PATH = os.environ.get("KNODE_BENCH_DETAIL",
                             os.path.join(HERE, "BENCH_DETAIL.json"))

EPOCHS_MEASURE = int(os.environ.get("KNODE_BENCH_EPOCHS", "200"))
TRAIN_LEN = 30
HIDDEN = 512
SPECS = [("sine", 0.5), ("sine", 1.0)]

# Global wall budget. The deadline is ABSOLUTE (unix time) so the
# axon-lease re-exec cannot reset it.
BUDGET_S = float(os.environ.get("KNODE_BENCH_BUDGET_S", "420"))
DEADLINE = None  # pinned by _init_deadline() at run time, not at import


def _init_deadline() -> float:
    """Pin the absolute wall deadline. Called from main() — NOT at import,
    so importing bench.py for its helpers (tests do) never writes
    KNODE_BENCH_DEADLINE into a long-lived process whose later bench
    subprocesses would inherit an already-expired window and silently skip
    every extra. The env var still carries the deadline across the
    axon-lease re-exec (os.execv in main)."""
    global DEADLINE
    if "KNODE_BENCH_DEADLINE" not in os.environ:
        os.environ["KNODE_BENCH_DEADLINE"] = str(time.time() + BUDGET_S)
    DEADLINE = float(os.environ["KNODE_BENCH_DEADLINE"])
    return DEADLINE


def _remaining() -> float:
    if DEADLINE is None:  # helper-import use: a full budget, no env write
        return BUDGET_S
    return DEADLINE - time.time()


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
_LOWER_BETTER = ("latency", "wall_s", "rmse", "ms_per_step")
# compile walls measure cache state; the live torch oracle measures the
# 1-core HOST under contention (it is the baseline, not the framework) —
# neither is a framework perf signal, so neither may trip the gate
_SKIP = ("compile_s", "torch_cpu_epochs_per_sec_live")
# Sub-millisecond latency metrics ride the axon tunnel's host-round-trip
# jitter: identical code measured 0.519 -> 0.799 ms across round-4 runs
# (-54%) and a 2.3x spread (0.49-1.11 ms) within ONE session. A warn
# below that envelope is a guaranteed false positive every round, so
# noisy metrics carry their own (warn_at, fail_at) pair: warn past the
# cross-run identical-code spread, fail past the within-session spread.
_NOISY = {"serving_latency_ms": (0.60, 1.30)}
# HOST-bound metrics are dominated by host-CPU time (Python re-tracing),
# not device work, so they only compare fairly between runs on the SAME
# host. The workspace disk outlives VM migrations (CLAUDE.md): in round 5
# a migration to a ~3x slower CPU (torch oracle 26.1 -> 8.5 epochs/s on
# identical reference code) moved sysid_fit200_wall_s 1.0 -> 1.38 s while
# every device-side metric IMPROVED. Cross-host (or unknown-host
# baseline) fails on these metrics are therefore downgraded to warn; the
# device-dominated twin (sysid_fit_marginal_ms_per_step, a chunk-reuse
# T-differential that cancels trace time) keeps the hard gate.
_HOST_BOUND = ("sysid_fit200_wall_s",)


def _load_previous_bench(history_dir):
    """Most recent full metric record to regress against.

    Since round 5 the printed line (and therefore the driver's
    BENCH_r*.json "parsed") carries only the HEADLINE metrics; the full
    extras live in the committed BENCH_DETAIL.json. The baseline is the
    latest parsed BENCH_r*.json overlaid with the committed detail file's
    extras (when it is a non-CPU record) for every metric the official
    record is missing. Must be called BEFORE this run overwrites
    BENCH_DETAIL.json."""
    import glob
    prev, src = None, None
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
            prev, src = dict(parsed), os.path.basename(path)
            break
    detail_path = os.path.join(history_dir, "BENCH_DETAIL.json")
    try:
        with open(detail_path) as f:
            detail = json.load(f)
        if (isinstance(detail, dict) and detail.get("extra")
                and detail.get("backend") != "cpu"):
            if prev is None:
                prev, src = dict(detail), "BENCH_DETAIL.json"
            else:
                merged = dict(detail["extra"])
                merged.update(prev.get("extra") or {})
                prev["extra"] = merged
                if not prev.get("host"):
                    prev["host"] = detail.get("host")
                src = src + "+DETAIL"
    except (OSError, ValueError):
        pass
    return prev, src


def detect_regressions(value, extras, baseline=None,
                       warn_at=0.10, fail_at=0.25, host=None):
    """Compare this run's metrics to the previous round's bench record.

    baseline: (prev_dict, source_name) from _load_previous_bench — must be
    captured before BENCH_DETAIL.json is overwritten; when None it is
    loaded now (test convenience).

    host: this run's machine fingerprint. _HOST_BOUND metrics fail only
    when the baseline record carries the SAME host fingerprint; against a
    different or unknown host their fails downgrade to warn (listed in
    "host_downgraded") — host-CPU speed is not a framework regression.

    Returns {"baseline", "warn": {metric: -pct}, "fail": {metric: -pct}};
    only metrics with a known goodness direction are compared, and compile
    walls are excluded (they measure cache state)."""
    prev, src = baseline if baseline is not None \
        else _load_previous_bench(HERE)
    report = {"baseline": src, "warn": {}, "fail": {}}
    if prev is None:
        return report
    same_host = bool(host) and prev.get("host") == host
    report["baseline_host"] = prev.get("host")
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
        metric_warn_at, metric_fail_at = _NOISY.get(name, (warn_at, fail_at))
        if change <= -metric_fail_at:
            if name in _HOST_BOUND and not same_host:
                report["warn"][name] = round(change * 100, 1)
                report.setdefault("host_downgraded", []).append(name)
            else:
                report["fail"][name] = round(change * 100, 1)
        elif change <= -metric_warn_at:
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


def timeit_queued(fn, n=5, reps=3):
    """Queued timing (n runs per sync), best of reps: a per-run sync
    charges the axon tunnel's ~30 ms host round trip to the chip —
    measured ~85% of the old headline was tunnel latency, not device
    time. A locally attached TPU does not pay it. best-of guards against
    transient lease stalls (observed 2.7x outliers)."""
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


def extra_steps(ctx):
    """Yield (name, fn) secondary metric steps, roughly in descending
    guard-value-per-second order so a tight budget still measures the
    most important ones. Each fn returns a dict of metric updates."""
    import jax
    import jax.numpy as jnp
    from knode_cosserat_tpu import calc_controls, experimental_rod
    from knode_cosserat_tpu.core.fast_rollout import make_fast_rollout
    from knode_cosserat_tpu.core.stepper import simulate_scan

    on_cpu = jax.default_backend() == "cpu"
    # mega = whole Newton shooting step in one kernel launch
    # (ops/pallas_step.py) — the fastest fused path on TPU
    impl = "xla" if on_cpu else "mega"
    B, T = 256, 50

    p10 = experimental_rod(N=10, dtype=jnp.float32)
    ctls = jnp.asarray(np.stack([
        calc_controls("sine", 0.5 + 0.01 * i, float(p10.del_t), T)
        for i in range(B)]), jnp.float32)

    def fused_rollouts():
        out = {}
        for N in (10, 40):
            pN = experimental_rod(N=N, dtype=jnp.float32)
            fast = jax.jit(make_fast_rollout(pN, tol=1e-10,
                                             block_b=256, impl=impl))
            dt, compile_s = _timeit(fast, ctls)
            out[f"rollout_fused_steps_per_sec_n{N}"] = round(
                B * (T - 1) / dt)
            out[f"rollout_fused_compile_s_n{N}"] = round(compile_s, 1)
        return out

    yield "rollout_fused", fused_rollouts

    def xla_rollout():
        xla = jax.jit(jax.vmap(
            lambda c: simulate_scan(p10, c, tol=1e-10).traj))
        dt, _ = _timeit(xla, ctls)
        return {"rollout_xla_steps_per_sec_n10": round(B * (T - 1) / dt)}

    yield "rollout_xla", xla_rollout

    # --- sysid: end-to-end wall of a 200-step E-fit (f32, jitted scan) ---
    # regression metric for the identification subsystem (training/sysid):
    # plant = reference rod, model = 'youngs' fault, fit log E.
    def sysid():
        if on_cpu:
            return {}
        from knode_cosserat_tpu.training.sysid import fit_rod_params
        ps_true = experimental_rod(dtype=jnp.float32)
        s_ctl = jnp.asarray(ctls[0][:30], jnp.float32)
        s_traj = jax.jit(lambda c: simulate_scan(ps_true, c).traj)(
            s_ctl)[:, :, :25]
        p_fault = experimental_rod("youngs", dtype=jnp.float32)

        def _sysid_run():
            return fit_rod_params(p_fault, s_traj, s_ctl, fields=("E",),
                                  steps=200, lr=0.1).loss_history

        # best-of-3: the ~1 s wall rides host re-trace + tunnel jitter
        # (drifted -21% on a single sample between r03 and r04 runs)
        _sysid_run()                              # populate compile cache
        dt, hist = float("inf"), None
        for _ in range(3):
            t0 = time.perf_counter()
            hist = _sysid_run()
            dt = min(dt, time.perf_counter() - t0)
        # the user-visible "how long does an identification run take"
        # regression number. Since the round-5 trace cache
        # (training/sysid._cached_fit_programs) repeat fits skip host
        # re-tracing entirely, so this wall is now dispatch+device (was
        # ~95% re-trace, ~1.3 s). Kept in _HOST_BOUND so comparisons
        # against pre-cache cross-host baselines stay warn-only.
        out = {}
        if np.isfinite(np.asarray(hist)).all():
            out["sysid_fit200_wall_s"] = round(dt, 2)

        # device-dominated twin: chunk-reuse T-differential. With
        # chunk=200, fit(1000 steps) runs the SAME traced 200-step scan
        # program 5x vs fit(200)'s 1x — the extra 4 executions are pure
        # dispatch+device, so (wall_1000 - wall_200)/800 cancels the
        # host trace time that dominates the wall metric (same
        # methodology as the assembly marginal rate above).
        def chunked_wall(steps):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                h = fit_rod_params(p_fault, s_traj, s_ctl, fields=("E",),
                                   steps=steps, lr=0.1,
                                   chunk=200).loss_history
                np.asarray(h)            # sync
                best = min(best, time.perf_counter() - t0)
            return best
        w_lo, w_hi = chunked_wall(200), chunked_wall(1000)
        diff = w_hi - w_lo
        if diff > 0.05 * w_hi:
            out["sysid_fit_marginal_ms_per_step"] = round(
                diff / 800.0 * 1e3, 3)
        else:
            print(f"# sysid marginal: T-differential {diff * 1e3:.0f} ms "
                  f"is noise-level (walls {w_lo:.2f}/{w_hi:.2f} s); "
                  f"metric dropped", file=sys.stderr)
        return out

    yield "sysid", sysid

    # --- serving latency: one rod, one BDF-2 step (AOT stepper) ---
    def serving():
        from knode_cosserat_tpu.serving import CompiledStepper
        stepper = CompiledStepper(p10, fast=not on_cpu)
        rep = stepper.benchmark(100, reps=10)
        # dispatch floor (same loop, trivial program) splits the latency
        # into tunnel RTT vs device work; deliberately NOT a regression
        # metric — it measures the transport, not the framework
        return {"serving_latency_ms": round(rep["latency_ms"], 3),
                "serving_dispatch_floor_ms": round(
                    rep["dispatch_floor_ms"], 3)}

    yield "serving", serving

    # --- parity: f32 device rollout vs the f64 CPU-exact golden ---
    def parity():
        if ctx.get("golden_trajs") is None:
            return {}
        ctl0 = jnp.asarray(ctx["golden_ctls"][0], jnp.float32)
        traj = np.asarray(jax.jit(
            lambda c: simulate_scan(ctx["ref"], c, tol=1e-16).traj)(ctl0))
        tip = traj[:, -1, :3]
        gold_tip = np.asarray(ctx["golden_trajs"][0])[:, -1, :3]
        return {"parity_tip_rmse_m": float(
            np.sqrt(np.mean((tip - gold_tip[: len(tip)]) ** 2)))}

    yield "parity", parity

    # --- the multitrain grid on the chip: 40 models (the reference's
    # physics_multitrain workload at n_seeds=5) as ONE vmapped fused
    # program — utilization scales with grid size (round-2 verdict item 2)
    def grid():
        if on_cpu:
            return {}
        from knode_cosserat_tpu import apply_mod
        from knode_cosserat_tpu.models import init_mlp as _init
        from knode_cosserat_tpu.ops.pallas_train import (
            make_fused_grid_training_run)
        spec, cfg = ctx["spec"], ctx["cfg"]
        tj, cj = ctx["tj"], ctx["cj"]
        G = 40
        mods = ["nsw", "short", "youngs", "lengthstiff"]
        rods = [apply_mod(mods[i % 4]) for i in range(G)]
        rods_st = jax.tree.map(lambda *xs: jnp.stack(xs), *rods)
        params_g = [_init(spec, jax.random.PRNGKey(i), jnp.float32)
                    for i in range(G)]
        params_st = jax.tree.map(lambda *xs: jnp.stack(xs), *params_g)
        tg = jnp.stack([tj] * G)
        cg = jnp.stack([cj] * G)
        grid_run = make_fused_grid_training_run(spec, cfg, EPOCHS_MEASURE)
        pg, lg, _ = grid_run(rods_st, params_st, tg, cg)   # compile
        jax.block_until_ready(lg)
        assert np.isfinite(np.asarray(lg)).all()
        gsec = timeit_queued(
            lambda: grid_run(rods_st, params_st, tg, cg), n=2)
        return {
            "grid_models_x_epochs_per_sec": round(
                G * EPOCHS_MEASURE / gsec),
            "grid_mfu_pct": round(100.0 * ctx["flops_epoch"] * G
                                  * EPOCHS_MEASURE / gsec / ctx["peak"],
                                  4),
        }

    yield "grid", grid

    # --- multi-rod assembly: coupled parallel-continuum rollout ---
    # (core/assembly.py — no reference counterpart). 3 rods + rigid plate,
    # one Newton system over [per-rod reactions, plate pose] per step.
    def assembly():
        if on_cpu:
            return {}
        from knode_cosserat_tpu.controls import calc_controls
        from knode_cosserat_tpu.core.assembly import (make_ring_assembly,
                                                      simulate_assembly)
        out = {}
        asm = make_ring_assembly(n_rods=3, base_radius=0.05, N=10,
                                 dtype=jnp.float32)
        del_t = float(np.asarray(jax.tree.map(lambda x: x[0],
                                              asm.rods).del_t))

        def ctl_for(Ta):
            return jnp.asarray(np.stack(
                [np.asarray(calc_controls("sine", a, del_t, Ta))
                 for a in (0.7, 1.0, 1.3)], axis=1), jnp.float32)

        def marginal_rate(run, name):
            """Steady-state steps/s via the T-differential: every synced
            call pays the axon tunnel's ~30 ms round trip (see
            timeit_queued), which at T=101 dwarfs the fused rollout's
            device time — the T=1001 minus T=101 difference cancels it.
            Returns None (metric dropped) when the differential is not
            cleanly positive: a transient lease stall inflating one wall
            would otherwise record an absurd rate that merges into the
            NEXT round's regression baseline via BENCH_DETAIL.json."""
            def wall(c):
                jax.block_until_ready(run(c))      # compile/warm
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.block_until_ready(run(c))
                    best = min(best, time.perf_counter() - t0)
                return best
            w_lo, w_hi = wall(ctl_for(101)), wall(ctl_for(1001))
            diff = w_hi - w_lo
            if diff < 0.05 * w_hi:
                print(f"# {name}: T-differential {diff * 1e3:.1f} ms is "
                      f"noise-level (walls {w_lo * 1e3:.0f}/"
                      f"{w_hi * 1e3:.0f} ms); metric dropped",
                      file=sys.stderr)
                return None
            return round(900.0 / diff)

        # headline: the fused mega-kernel path (ops/pallas_assembly) —
        # one Pallas launch per coupled Newton solve
        rates = {
            "assembly_steps_per_sec_3rods": marginal_rate(
                jax.jit(lambda c: simulate_assembly(asm, c,
                                                    fused=True).traj),
                "assembly_steps_per_sec_3rods"),
            "assembly_xla_steps_per_sec_3rods": marginal_rate(
                jax.jit(lambda c: simulate_assembly(asm, c).traj),
                "assembly_xla_steps_per_sec_3rods"),
        }
        out.update({k: v for k, v in rates.items() if v is not None})

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
        out["assembly_batched_steps_per_sec_b256"] = round(
            Ba * (T - 1) / dt)
        return out

    yield "assembly", assembly

    # --- parallel-in-space multiple shooting: fine-rod latency path ---
    # (core/multiple_shooting.py). Single-rollout steps/s at N=161, S=80
    # with the structured (block-bidiagonal) Newton vs the sequential
    # sweep's ~33 — the SURVEY §5 "parallel-in-space Newton" capability,
    # regression-guarded.
    def multiple_shooting():
        if on_cpu:
            return {}
        from knode_cosserat_tpu.core.multiple_shooting import \
            simulate_scan_ms
        p161 = experimental_rod(N=161, dtype=jnp.float32)
        ms = jax.jit(lambda c: simulate_scan_ms(p161, c, 80,
                                                tol=1e-10).traj)
        dt, _ = _timeit(ms, ctls[0])
        return {"rollout_ms_steps_per_sec_n161": round((T - 1) / dt)}

    yield "multiple_shooting", multiple_shooting

    # --- wide (HBM-streamed) fused trainer: the h=8192 train-real shape.
    # Guards the streamed Mosaic lowering's throughput, which clears the
    # materializing XLA path's ~9% MFU traffic ceiling (docs/BENCHMARKS.md
    # wide roofline; measured 11.9% at this config).
    def wide():
        if on_cpu:
            return {}
        from knode_cosserat_tpu.models import init_mlp
        from knode_cosserat_tpu.ops.pallas_train_wide import (
            make_wide_training_run, wide_trainer_supported)
        from knode_cosserat_tpu.training import TrainConfig
        rngw = np.random.default_rng(0)
        Bw, Tw, Hw = 4, 120, 8192
        p_mod = ctx["p_mod"]
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
        # FLOP convention: ALGORITHMIC matmul flops (fwd 2·H·din + bwd
        # 2×, per cell, counting the 25-wide output layers as 75 rows) —
        # phase B's activation RECOMPUTE is excluded, matching the
        # roofline study's convention in docs/BENCHMARKS.md (which
        # rooflines the algorithmic work against HBM traffic). Executed
        # flops are ~1.5x this; do not compare against executed-flop MFU.
        return {
            "training_wide_h8192_epochs_per_sec": round(weps, 1),
            "training_wide_h8192_mfu_pct": round(
                100.0 * 2.0 * cells_w * Hw * (2 * spec_w.dims[0] + 75)
                * weps / ctx["peak"], 3),
        }

    yield "wide", wide

    # --- refresh the stored torch-CPU baseline (affects the NEXT run's
    # vs_baseline denominator; the max-ever logic keeps it conservative)
    def torch_refresh():
        if not os.path.isdir("/root/reference/knode_cosserat"):
            return {}
        live = measure_torch_cpu_epoch()
        stored = None
        if os.path.exists(STORED_BASELINE_FILE):
            with open(STORED_BASELINE_FILE) as f:
                stored = json.load(f)["torch_cpu_epochs_per_sec"]
        best = max(x for x in (live, stored) if x is not None)
        with open(STORED_BASELINE_FILE, "w") as f:
            json.dump({"torch_cpu_epochs_per_sec": best,
                       "config": {"trajs": 2, "train_len": TRAIN_LEN,
                                  "hidden": HIDDEN}}, f)
        return {"torch_cpu_epochs_per_sec_live": round(live, 2)}

    yield "torch_refresh", torch_refresh


def _write_detail(doc):
    tmp = DETAIL_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1)
    os.replace(tmp, DETAIL_PATH)


def main():
    _init_deadline()
    import jax
    if os.environ.get("KNODE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["KNODE_PLATFORM"])
    from knode_cosserat_tpu.cli import enable_compile_cache
    enable_compile_cache()
    # Baseline for the regression tripwire must be captured BEFORE this
    # run starts overwriting BENCH_DETAIL.json.
    baseline = _load_previous_bench(HERE)
    # The axon TPU tunnel occasionally fails to acquire the chip for a
    # minute or so after another process releases it, and JAX then falls
    # back to CPU silently — which would record garbage numbers. Re-exec
    # until the accelerator comes back (unless CPU was asked for), but
    # never spend the budget waiting: stop while the headline still fits.
    retries = int(os.environ.get("KNODE_BENCH_TPU_RETRIES", "8"))
    if (jax.default_backend() == "cpu"
            and not os.environ.get("KNODE_PLATFORM")
            and retries > 0 and _remaining() > 180):
        print(f"# TPU backend unavailable (transient axon lease?); "
              f"re-exec in 15s ({retries} retries left, "
              f"{_remaining():.0f}s budget left)", file=sys.stderr)
        time.sleep(15)
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
    extras = {"training_xla_epochs_per_sec": round(xla_eps, 1)}
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
            extras["training_fused_epochs_per_sec"] = round(fused_eps, 1)
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

    # torch CPU baseline for the printed line: the stored max measurement
    # (CPU contention can only slow torch down, so the max ever recorded
    # keeps the reported speedup conservative/fair). A live refresh runs
    # as the LAST extra, after the headline is safely on stdout.
    torch_eps = None
    if os.path.exists(STORED_BASELINE_FILE):
        with open(STORED_BASELINE_FILE) as f:
            torch_eps = json.load(f)["torch_cpu_epochs_per_sec"]

    # ---- headline prints NOW: nothing slow may precede this ----
    from knode_cosserat_tpu.cli import machine_fingerprint
    host = machine_fingerprint()
    vs = (ours / torch_eps) if torch_eps else None
    line = {
        "metric": "knode_batched_training_throughput",
        "value": round(ours, 3),
        "unit": "epochs/sec",
        "vs_baseline": round(vs, 2) if vs else None,
        "host": host,
        "extra": extras,
    }
    print(json.dumps(line), flush=True)

    detail = {**line,
              "extra": dict(extras),
              "device": str(jax.devices()[0].device_kind),
              "backend": jax.default_backend(),
              "host": host,
              "budget_s": BUDGET_S}
    _write_detail(detail)

    # ---- extras: stream into BENCH_DETAIL.json under the wall budget ----
    skipped = []
    if not os.environ.get("KNODE_BENCH_FAST"):
        ctx = {"ref": ref, "p_mod": p_mod, "spec": spec, "cfg": cfg,
               "tj": tj, "cj": cj, "flops_epoch": flops_epoch,
               "peak": peak, "golden_trajs": trajs, "golden_ctls": ctls}
        for name, fn in extra_steps(ctx):
            if _remaining() < 30:
                skipped.append(name)
                continue
            try:
                detail["extra"].update(fn())
            except Exception as e:
                print(f"# extra '{name}' failed: {e}", file=sys.stderr)
            detail["extra"]["skipped"] = skipped + ["..."]
            _write_detail(detail)

    reg = detect_regressions(line["value"], detail["extra"],
                             baseline=baseline, host=host)
    detail["extra"]["regressions"] = reg
    detail["extra"]["skipped"] = skipped
    _write_detail(detail)
    for sev in ("warn", "fail"):
        for name, pct in reg[sev].items():
            note = (" (host-bound metric, baseline from a different/"
                    "unknown host — fail downgraded)"
                    if name in reg.get("host_downgraded", ()) else "")
            print(f"# REGRESSION[{sev}] {name}: {pct}% vs "
                  f"{reg['baseline']}{note}", file=sys.stderr)
    if skipped:
        print(f"# budget exhausted; skipped extras: {skipped}",
              file=sys.stderr)
    # Exit status: 0 by default even on fail-level regressions — the
    # driver's gate must record the measured numbers either way, and the
    # tpu-tier test (tests/test_tpu_kernels.py) is where fails have
    # teeth. KNODE_BENCH_STRICT=1 opts into a hard exit for CI use.
    if reg["fail"] and os.environ.get("KNODE_BENCH_STRICT"):
        sys.exit(2)


if __name__ == "__main__":
    main()
