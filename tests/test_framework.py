"""Framework-level tests: checkpointing, eval tables, config, CLI, viz,
metrics, multi-device grid."""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu import apply_mod
from knode_cosserat_tpu.config import ExperimentConfig
from knode_cosserat_tpu.evaluation import (aggregate_seeds, dtw,
                                           evaluate_cells, fastdtw,
                                           format_table, pct_error, pose_mse,
                                           tip_dtw)
from knode_cosserat_tpu.models import MLPSpec, init_mlp
from knode_cosserat_tpu.parallel import build_grid
from knode_cosserat_tpu.training.checkpoint import (load_checkpoint,
                                                    save_checkpoint)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------- checkpoint ----------------

def test_checkpoint_roundtrip(tmp_path):
    import optax
    spec = MLPSpec.for_knode(16)
    params = init_mlp(spec, jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    tree = {"params": params, "opt": opt_state, "loss": np.arange(5.0),
            "note": "hello", "none": None}
    path = save_checkpoint(str(tmp_path / "ckpt"), tree,
                           meta={"epochs": 3})
    loaded, meta = load_checkpoint(path, like=tree)
    assert meta == {"epochs": 3}
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # structure preserved with like=
    assert isinstance(loaded["params"], tuple)
    assert loaded["note"] == "hello"


def test_checkpoint_load_without_like(tmp_path):
    tree = {"a": jnp.ones(3), "b": [jnp.zeros(2), 5]}
    path = save_checkpoint(str(tmp_path / "c2"), tree)
    loaded, _ = load_checkpoint(path)
    np.testing.assert_array_equal(loaded["a"], np.ones(3))
    assert loaded["b"][1] == 5


def test_async_checkpoint_writer(tmp_path):
    """Background-thread writes are ordered (last save wins), durable
    after wait(), and load back identically."""
    from knode_cosserat_tpu.training.checkpoint import AsyncCheckpointWriter
    path = str(tmp_path / "async_ckpt")
    with AsyncCheckpointWriter() as w:
        for step in range(4):
            w.save(path, {"x": jnp.full(3, float(step))},
                   meta={"step": step})
        w.wait()
        loaded, meta = load_checkpoint(path)
    assert meta == {"step": 3}
    np.testing.assert_array_equal(loaded["x"], np.full(3, 3.0))


def test_async_checkpoint_writer_orbax(tmp_path):
    from knode_cosserat_tpu.training.checkpoint import AsyncCheckpointWriter
    path = str(tmp_path / "orbax_ckpt")
    with AsyncCheckpointWriter(use_orbax=True) as w:
        w.save(path, {"x": jnp.arange(4.0)}, meta={"step": 7})
        w.wait()
        loaded, meta = load_checkpoint(path)
    assert meta == {"step": 7}
    np.testing.assert_array_equal(np.asarray(loaded["x"]), np.arange(4.0))


def test_async_checkpoint_snapshots_mutable_containers(tmp_path):
    """save() must freeze mutable containers at enqueue time: the training
    loop keeps appending to its live dtw-history list (and stamping meta)
    while the worker thread serializes — a checkpoint stamped epoch E must
    not contain entries from epochs > E."""
    from knode_cosserat_tpu.training.checkpoint import AsyncCheckpointWriter
    path = str(tmp_path / "snap_ckpt")
    live = [(0, 1.0)]
    meta = {"epoch": 10}
    with AsyncCheckpointWriter() as w:
        w.save(path, {"dtw": live}, meta=meta)
        live.append((99, 2.0))      # post-enqueue mutations...
        meta["epoch"] = 999
        w.wait()
        loaded, m = load_checkpoint(path)
    assert m == {"epoch": 10}       # ...must not leak into the snapshot
    np.testing.assert_array_equal(np.asarray(loaded["dtw"]),
                                  [[0.0, 1.0]])


def test_async_checkpoint_surfaces_errors(tmp_path):
    from knode_cosserat_tpu.training.checkpoint import AsyncCheckpointWriter
    w = AsyncCheckpointWriter()
    w.save("/proc/definitely/not/writable/ckpt", {"x": jnp.ones(2)})
    with pytest.raises(BaseException):
        w.wait()


# ---------------- metrics ----------------

def test_dtw_identical_is_zero():
    x = np.random.RandomState(0).randn(50, 3)
    assert dtw(x, x)[0] == 0.0
    assert fastdtw(x, x)[0] == 0.0


def test_dtw_known_value():
    x = np.array([[0.0], [1.0], [2.0]])
    y = np.array([[0.0], [2.0]])
    # alignment (0,0),(1,0|1),(2,1): best = |1-0| + ... = 1.0
    d, path = dtw(x, y)
    assert d == pytest.approx(1.0)
    assert path[0] == (0, 0) and path[-1] == (2, 1)


def test_fastdtw_close_to_exact():
    rng = np.random.RandomState(1)
    x = np.cumsum(rng.randn(120, 3), axis=0)
    y = np.cumsum(rng.randn(100, 3), axis=0)
    exact = dtw(x, y)[0]
    approx = fastdtw(x, y)[0]
    assert approx >= exact - 1e-9
    assert approx <= exact * 1.3


def test_pose_mse_layouts_agree():
    rng = np.random.RandomState(2)
    a = rng.randn(6, 25, 10)
    a[:, 3:7] += 2.0
    b = a + 0.01
    ours_ref_layout = pose_mse(b, a)
    ours_state_last = pose_mse(np.swapaxes(b, 1, 2), np.swapaxes(a, 1, 2))
    assert ours_ref_layout == pytest.approx(ours_state_last)


def test_pct_error():
    assert pct_error(110, 100) == pytest.approx(10)
    assert pct_error(0, 0) == 0
    assert pct_error(1, 0) == float("inf")


# ---------------- eval tables ----------------

def test_evaluate_cells_and_table(tmp_path):
    cells = build_grid(["sine 0.5"], ["nsw"], 1)
    spec = MLPSpec.for_knode(16)
    params = [jax.tree.map(lambda x: x * 1e-3,
                           init_mlp(spec, jax.random.PRNGKey(0),
                                    jnp.float64))]
    records = evaluate_cells(cells, params, spec, ["sine 1.5"],
                             eval_len=12, save_dir=str(tmp_path))
    assert len(records) == 2  # baseline + 1 cell
    base = [r for r in records if r.label.startswith("baseline")][0]
    cell = [r for r in records if not r.label.startswith("baseline")][0]
    assert cell.dtw_pct is not None
    table = format_table(records)
    assert "baseline nsw" in table and "sine 1.5 DTW" in table
    agg = aggregate_seeds(records)
    assert len(agg) == 2
    assert len(list(tmp_path.glob("*.npz"))) == 2


def test_evaluate_cells_mega_and_dtw_impls(tmp_path):
    """Eval sweeps on the mega step kernel (interpret) == the XLA scan, and
    device-DTW scoring == the host fastdtw metric on these trajectories."""
    cells = build_grid(["sine 0.5"], ["nsw", "youngs"], 1)
    spec = MLPSpec.for_knode(16)
    params = [jax.tree.map(lambda x: x * 1e-3,
                           init_mlp(spec, jax.random.PRNGKey(s),
                                    jnp.float64)) for s in range(2)]
    kw = dict(eval_len=10, keep_arrays=True)
    recs_xla = evaluate_cells(cells, params, spec, ["sine 1.5"],
                              impl="xla", dtw_impl="host", **kw)
    recs_mega = evaluate_cells(cells, params, spec, ["sine 1.5"],
                               impl="mega-interpret", dtw_impl="device",
                               **kw)
    assert len(recs_xla) == len(recs_mega)
    for rx, rm in zip(recs_xla, recs_mega):
        assert rx.label == rm.label
        # converged rollouts agree to solver tolerance; exact device DTW
        # == host fastdtw on these smooth short tip trajectories
        np.testing.assert_allclose(rm.dtw, rx.dtw, rtol=1e-5, atol=1e-10)
        np.testing.assert_allclose(rm.predicted, rx.predicted, rtol=1e-5,
                                   atol=1e-8)


def test_tip_generalization_plot(tmp_path):
    """C11 closure: the per-mod tip-X figure renders from saved eval records
    (physics_multigraphs.py:186-231)."""
    import matplotlib
    matplotlib.use("Agg")
    from knode_cosserat_tpu.viz.visualizer import tip_generalization_plot

    cells = build_grid(["sine 0.5"], ["nsw", "youngs"], 1)
    spec = MLPSpec.for_knode(16)
    params = [jax.tree.map(lambda x: x * 1e-3,
                           init_mlp(spec, jax.random.PRNGKey(s),
                                    jnp.float64)) for s in range(2)]
    evaluate_cells(cells, params, spec, ["sine 1.5"], eval_len=10,
                   save_dir=str(tmp_path))
    out = str(tmp_path / "figs" / "tipx.png")
    fig = tip_generalization_plot(str(tmp_path), "sine 1.5",
                                  ["nsw", "youngs"], ["sine 0.5"], save=out)
    assert fig is not None and os.path.exists(out)
    # every mod axis carries the reference + baseline + training-set lines
    for ax in fig.axes:
        assert len(ax.lines) == 3


# ---------------- config ----------------

def test_experiment_config_roundtrip(tmp_path):
    cfg = ExperimentConfig()
    cfg.data.specs = [("sine", 0.5), ("random", 0.0)]
    cfg.train.epochs = 7
    path = str(tmp_path / "cfg.json")
    cfg.save(path)
    cfg2 = ExperimentConfig.load(path)
    assert cfg2.data.specs == [("sine", 0.5), ("random", 0.0)]
    assert cfg2.train.epochs == 7
    assert cfg2.short_name().startswith("physics_sine-random")


# ---------------- viz (headless) ----------------

def test_viz_smoke(tmp_path, monkeypatch):
    monkeypatch.setenv("MPLBACKEND", "Agg")
    from knode_cosserat_tpu import calc_controls, simulate
    from knode_cosserat_tpu.viz import (ContinuumRobotVisualizer, plot_2d,
                                        plot_training_curves, visualize_2d)
    p = apply_mod(None)
    traj = np.asarray(simulate(p, calc_controls("sine", 1.0,
                                                float(p.del_t), 5)))
    f = visualize_2d(p, traj[2], 2, out_dir=str(tmp_path))
    assert os.path.exists(f)
    fig = plot_2d([traj[:, :, :25]], legend=["sim"], markers=["."],
                  title=str(tmp_path / "t"), save=False)
    assert fig is not None
    fig2 = plot_training_curves(np.random.rand(3, 20))
    assert fig2 is not None
    gif = ContinuumRobotVisualizer(traj[:, :, :25], p).save_as_gif(
        str(tmp_path / "anim.gif"), max_frames=3)
    assert os.path.exists(gif)


# ---------------- CLI (subprocess smoke) ----------------

@pytest.mark.parametrize("argv", [
    ["simulate", "--type", "sine", "--arg", "1.0", "--steps", "5"],
])
def test_cli_simulate(tmp_path, argv):
    env = dict(os.environ)
    env["KNODE_PLATFORM"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "knode_cosserat_tpu", *argv,
         "--save", str(tmp_path / "out.npz")],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert (tmp_path / "out.npz").exists()


def test_cli_simulate_rejects_conflicting_solver_flags(tmp_path):
    """--segments with --model or --fast used to be silently ignored by
    the elif dispatch; now it must refuse with an explanation."""
    env = dict(os.environ)
    env["KNODE_PLATFORM"] = "cpu"
    for extra in (["--model", "x.npz", "--segments", "3"],
                  ["--fast", "--segments", "3"]):
        out = subprocess.run(
            [sys.executable, "-m", "knode_cosserat_tpu", "simulate",
             "--type", "sine", "--arg", "1.0", "--steps", "5", *extra,
             "--save", str(tmp_path / "out.npz")],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=300)
        assert out.returncode != 0
        assert "--segments" in out.stderr


def test_cli_simulate_assembly_contact_plane(tmp_path):
    env = dict(os.environ)
    env["KNODE_PLATFORM"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "knode_cosserat_tpu", "simulate-assembly",
         "--rods", "2", "--nodes", "6", "--steps", "4",
         "--contact_plane", "0", "-1", "0", "-0.2",
         "--save", str(tmp_path / "asm.npz")],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    data = np.load(tmp_path / "asm.npz")
    assert np.isfinite(data["plate_pose"]).all()


def test_cli_sysid(tmp_path):
    """`knode sysid`: generated-plant fault recovery, then fitting from a
    saved rollout file via --data/--trim."""
    env = dict(os.environ)
    env["KNODE_PLATFORM"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "knode_cosserat_tpu", "sysid",
         "--mod", "youngs", "--fit", "E", "--steps", "30", "--length", "10"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "E:" in out.stdout and "true" in out.stdout

    sim = subprocess.run(
        [sys.executable, "-m", "knode_cosserat_tpu", "simulate",
         "--type", "sine", "--arg", "1.0", "--steps", "10",
         "--save", str(tmp_path / "obs.npz")],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300)
    assert sim.returncode == 0, sim.stderr[-2000:]
    out = subprocess.run(
        [sys.executable, "-m", "knode_cosserat_tpu", "sysid",
         "--mod", "youngs", "--fit", "E", "--steps", "5",
         "--data", str(tmp_path / "obs.npz"), "--trim", "2"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "E:" in out.stdout


def test_cli_design(tmp_path):
    """`knode design`: Fisher-optimal input design saves a schedule that
    `sysid --data`-compatible tooling can consume."""
    env = dict(os.environ)
    env["KNODE_PLATFORM"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "knode_cosserat_tpu", "design",
         "--fit", "E", "--horizon", "6", "--steps", "5",
         "--save", str(tmp_path / "des.npz")],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Fisher" in out.stdout
    d = np.load(tmp_path / "des.npz")
    assert d["controls"].shape == (6, 4)
    assert np.isfinite(d["objective_history"]).all()


def test_cli_train_tiny(tmp_path):
    env = dict(os.environ)
    env["KNODE_PLATFORM"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "knode_cosserat_tpu", "train",
         "sine", "0.5", "--epochs", "2", "--layers", "8", "--no-eval",
         "--train_len", "6", "--save_dir", str(tmp_path)],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert list(tmp_path.glob("*.npz")), out.stdout


def test_train_resume_roundtrip(tmp_path):
    """RESUME_TRAINING parity: checkpoint mid-run, resume, and match an
    uninterrupted run."""
    from knode_cosserat_tpu.training import (TrainConfig, make_training_data,
                                             train_knode)
    ref = apply_mod(None)
    p_mod = apply_mod("nsw")
    trajs, ctls = make_training_data(ref, [("sine", 0.5)], train_len=6)
    base = dict(hidden=16, dtype="float64", log_every=10**9, seed=0)

    full = train_knode(p_mod, trajs, ctls,
                       TrainConfig(epochs=9, **base), log=None)

    ck = str(tmp_path / "mid")
    first = train_knode(p_mod, trajs, ctls,
                        TrainConfig(epochs=4, checkpoint_every=5, **base),
                        log=None, checkpoint_path=ck)
    resumed = train_knode(p_mod, trajs, ctls,
                          TrainConfig(epochs=4, **base), log=None,
                          resume_from=ck)
    assert len(resumed.loss_history) == len(full.loss_history)
    np.testing.assert_allclose(resumed.loss_history, full.loss_history,
                               rtol=1e-9)
    for a, b in zip(jax.tree.leaves(resumed.params),
                    jax.tree.leaves(full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9)


def test_distributed_helpers_single_host():
    from knode_cosserat_tpu.parallel import (init_distributed, is_multihost,
                                             process_summary)
    assert init_distributed() is False  # no coordinator configured
    assert not is_multihost()
    assert "process 0/1" in process_summary()


def test_sysid_traj_layout_coercion():
    """coerce_traj_layout: auto-detection works for unambiguous shapes,
    REFUSES the N in (25, 50) ambiguity, and honors explicit --layout
    (advisor finding, round 3: a (T, C, N) file for an N=25 rod was
    silently mis-transposed)."""
    from knode_cosserat_tpu.cli import coerce_traj_layout

    t_state_last = np.zeros((7, 10, 25))
    t_reference = np.zeros((7, 25, 10))
    out = coerce_traj_layout(t_state_last, 10)
    assert out.shape == (7, 10, 25)
    out = coerce_traj_layout(t_reference, 10)
    assert out.shape == (7, 10, 25)

    ambiguous = np.zeros((7, 25, 25))
    with pytest.raises(SystemExit, match="ambiguous"):
        coerce_traj_layout(ambiguous, 25)
    # explicit layout resolves it — both readings accepted
    assert coerce_traj_layout(ambiguous, 25, "state-last").shape == (7, 25, 25)
    assert coerce_traj_layout(ambiguous, 25, "reference").shape == (7, 25, 25)
    ambiguous50 = np.zeros((7, 50, 50))
    with pytest.raises(SystemExit, match="ambiguous"):
        coerce_traj_layout(ambiguous50, 50)

    with pytest.raises(SystemExit, match="not state-last"):
        coerce_traj_layout(t_reference, 10, "state-last")
    with pytest.raises(SystemExit, match="not reference"):
        coerce_traj_layout(t_state_last, 10, "reference")
    with pytest.raises(SystemExit, match="neither"):
        coerce_traj_layout(np.zeros((7, 4, 4)), 10)
    with pytest.raises(SystemExit, match="3-D"):
        coerce_traj_layout(np.zeros((7, 25)), 10)


def test_bench_regression_tripwire(tmp_path):
    """bench.detect_regressions: warns at >=10%, fails at >=25%, respects
    metric direction, and skips cache-state metrics (compile walls)."""
    import json as _json

    sys.path.insert(0, str(REPO))
    from bench import _load_previous_bench, detect_regressions

    prev = {"parsed": {
        "metric": "knode_batched_training_throughput",
        "value": 30000.0,
        "extra": {
            "rollout_fused_steps_per_sec_n40": 800000,
            "serving_latency_ms": 0.5,
            "rollout_fused_compile_s_n40": 1.2,
            "parity_tip_rmse_m": 1e-8,
            "training_program_gflops": 6.9,
        },
    }}
    (tmp_path / "BENCH_r03.json").write_text(_json.dumps(prev))

    # healthy run: small drift both ways -> clean report
    rep = detect_regressions(29000.0, {
        "rollout_fused_steps_per_sec_n40": 790000,   # -1.25%
        "serving_latency_ms": 0.52,
        "rollout_fused_compile_s_n40": 150.0,        # cold cache: ignored
        "parity_tip_rmse_m": 1.05e-8,
        "training_program_gflops": 6.9,
    }, baseline=_load_previous_bench(str(tmp_path)))
    assert rep["baseline"] == "BENCH_r03.json"
    assert rep["warn"] == {} and rep["fail"] == {}

    # degraded run: throughput -12% warns, rmse 2x fails; serving latency
    # 2x is INSIDE the measured within-session tunnel spread (0.49-1.11
    # ms, round 4) -> warn, not fail (bench._NOISY carries its own pair)
    rep = detect_regressions(30000.0, {
        "rollout_fused_steps_per_sec_n40": 700000,   # -12.5% -> warn
        "serving_latency_ms": 1.0,                   # 2x -> noisy: warn
        "parity_tip_rmse_m": 2e-8,                   # 2x -> fail
    }, baseline=_load_previous_bench(str(tmp_path)))
    assert "rollout_fused_steps_per_sec_n40" in rep["warn"]
    assert "serving_latency_ms" in rep["warn"]
    assert "parity_tip_rmse_m" in rep["fail"]
    # headline drop beyond 25% fails too
    rep = detect_regressions(20000.0, {}, baseline=_load_previous_bench(str(tmp_path)))
    assert "headline_epochs_per_sec" in rep["fail"]

    # jitter-class metric (bench._NOISY): -40% serving latency is within
    # the cross-run identical-code spread (0.519 -> 0.799 ms, round 4) ->
    # silent; past 60% warns; only past the 130% within-session envelope
    # does it fail
    rep = detect_regressions(30000.0, {"serving_latency_ms": 0.7},
                             baseline=_load_previous_bench(str(tmp_path)))
    assert "serving_latency_ms" not in rep["warn"]
    assert "serving_latency_ms" not in rep["fail"]
    rep = detect_regressions(30000.0, {"serving_latency_ms": 1.25},
                             baseline=_load_previous_bench(str(tmp_path)))
    assert "serving_latency_ms" in rep["fail"]

    # the live torch oracle measures the contended 1-core HOST, not the
    # framework — it must never trip the gate even when halved
    prev2 = {"parsed": {"value": 30000.0, "extra": {
        "torch_cpu_epochs_per_sec_live": 20.0}}}
    (tmp_path / "BENCH_r04.json").write_text(_json.dumps(prev2))
    rep = detect_regressions(
        30000.0, {"torch_cpu_epochs_per_sec_live": 9.0},
        baseline=_load_previous_bench(str(tmp_path)))
    assert "torch_cpu_epochs_per_sec_live" not in rep["fail"]
    assert "torch_cpu_epochs_per_sec_live" not in rep["warn"]

    # no history -> empty report, never crashes
    (tmp_path / "empty").mkdir()
    rep = detect_regressions(
        1.0, {}, baseline=_load_previous_bench(str(tmp_path / "empty")))
    assert rep["baseline"] is None and rep["fail"] == {}

    # host-bound metrics (bench._HOST_BOUND): trace-dominated walls only
    # compare fairly on the SAME host. Round-5 evidence: a VM migration to
    # a ~3x slower CPU (torch oracle 26.1 -> 8.5 eps on identical code)
    # moved sysid_fit200_wall_s -38% while every device metric improved.
    hostdir = tmp_path / "host"
    hostdir.mkdir()
    prev = {"parsed": {
        "metric": "knode_batched_training_throughput",
        "value": 30000.0,
        "host": "hostA",
        "extra": {"sysid_fit200_wall_s": 1.0,
                  "sysid_fit_marginal_ms_per_step": 2.0},
    }}
    (hostdir / "BENCH_r05.json").write_text(_json.dumps(prev))
    base = _load_previous_bench(str(hostdir))
    assert base[0]["host"] == "hostA"
    # different host: the -40% fail downgrades to warn, annotated
    rep = detect_regressions(30000.0, {"sysid_fit200_wall_s": 1.4},
                             baseline=base, host="hostB")
    assert "sysid_fit200_wall_s" in rep["warn"] and rep["fail"] == {}
    assert rep["host_downgraded"] == ["sysid_fit200_wall_s"]
    assert rep["baseline_host"] == "hostA"
    # same host: a real slowdown still fails
    rep = detect_regressions(30000.0, {"sysid_fit200_wall_s": 1.4},
                             baseline=base, host="hostA")
    assert "sysid_fit200_wall_s" in rep["fail"]
    # unknown-host baseline (pre-round-5 records): also downgraded
    rep = detect_regressions(30000.0, {"sysid_fit200_wall_s": 1.4},
                             baseline=(dict(base[0], host=None), "x"),
                             host="hostB")
    assert "sysid_fit200_wall_s" in rep["warn"] and rep["fail"] == {}
    # the device-dominated twin is NOT host-gated: fails on any host
    rep = detect_regressions(30000.0,
                             {"sysid_fit_marginal_ms_per_step": 3.0},
                             baseline=base, host="hostB")
    assert "sysid_fit_marginal_ms_per_step" in rep["fail"]
