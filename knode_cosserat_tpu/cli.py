"""Command-line interface — one `knode` entry point whose subcommands cover
every reference script:

  simulate    rollout + save + optional animation   (simulate.py)
  train       sim-data KNODE training               (physics_train.py)
  multitrain  (data x mod x seed) grid + eval table (physics_multitrain.py)
  graphs      cross-seed aggregation tables         (physics_multigraphs.py)
  prepare     experiment ingestion -> datas/*.npz   (prepare.py)
  estimate    pose-only -> full-state estimation    (estimate_state.py)
  train-real  real-data KNODE training              (train_segment.py)
  bench       headline benchmark JSON line          (bench.py)

Run as `python -m knode_cosserat_tpu <cmd> ...`.
"""
from __future__ import annotations

import argparse
import os
import sys
from functools import partial

import numpy as np


def _parse_mesh(spec):
    """'data,seq,model' -> jax.sharding.Mesh (None passes through)."""
    if not spec:
        return None
    from .parallel import make_mesh
    d, s, m = (int(x) for x in spec.split(","))
    return make_mesh(data=d, seq=s, model=m)


def _add_train_args(sp):
    sp.add_argument("control_type_arg", nargs="+",
                    help='trajectories, e.g. "sine sine 0.5 1.0"')
    sp.add_argument("--mod", type=str, default=None)
    sp.add_argument("--original", action="store_true")
    sp.add_argument("--epochs", type=int, default=2000)
    sp.add_argument("--weight_decay", type=float, default=0.0)
    sp.add_argument("--noise_traj", type=float, default=0.0)
    sp.add_argument("--noise_controls", type=float, default=0.0)
    sp.add_argument("--layers", type=int, default=512)
    sp.add_argument("--validation", type=str, default=None)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--eval", action=argparse.BooleanOptionalAction,
                    default=True)
    sp.add_argument("--save_dir", type=str, default="saved_models")
    sp.add_argument("--train_len", type=int, default=30)
    sp.add_argument("--dtype", type=str, default="float32")
    sp.add_argument("--resume", type=str, default=None,
                    help="checkpoint to resume from")
    sp.add_argument("--mesh", type=str, default=None,
                    help='multi-chip mesh "data,seq,model", e.g. "4,2,1"')


def cmd_train(args):
    import jax
    from .config import DataConfig, EvalConfig, ExperimentConfig, RodConfig
    from .core.params import apply_mod
    from .training import (TrainConfig, make_training_data,
                           make_validation_reference, parse_traj_specs,
                           train_knode)
    from .training.checkpoint import save_checkpoint

    specs = parse_traj_specs(args.control_type_arg)
    validation = args.validation or ("sine 0.1" if args.original
                                     else "sine 1.25")
    vkind, varg = validation.split(" ")

    cfg = ExperimentConfig(
        rod=RodConfig(mod=args.mod, original=args.original),
        data=DataConfig(specs=specs, train_len=args.train_len,
                        noise_traj=args.noise_traj,
                        noise_controls=args.noise_controls),
        train=TrainConfig(epochs=args.epochs, hidden=args.layers,
                          weight_decay=args.weight_decay, seed=args.seed,
                          dtype=args.dtype),
        eval=EvalConfig(validation=(vkind, float(varg))),
    )
    ref = apply_mod(None, original=args.original)
    p_mod = cfg.rod.build()
    trajs, ctls = make_training_data(
        ref, specs, train_len=args.train_len, noise_traj=args.noise_traj,
        noise_controls=args.noise_controls,
        key=jax.random.PRNGKey(args.seed))
    vc = vr = None
    if args.eval:
        vc, vr = make_validation_reference(ref, (vkind, float(varg)))
    mesh = _parse_mesh(args.mesh)
    path = os.path.join(args.save_dir, cfg.short_name())
    res = train_knode(p_mod, trajs, ctls, cfg.train, vc, vr, eval_rod=p_mod,
                      resume_from=args.resume, checkpoint_path=path,
                      mesh=mesh)

    save_checkpoint(path, {
        "params": res.best_params if args.eval else res.params,
        "loss": res.loss_history,
        "dtw": res.dtw_history,
    }, meta=cfg.to_dict())
    print(f"saved {path}.npz (best DTW {res.best_dtw})")


def cmd_simulate(args):
    from .controls import calc_controls
    from .core.params import apply_mod
    from .core.stepper import simulate
    from .models import MLPSpec
    from .training.checkpoint import load_checkpoint
    from .training.train import rollout_with_nn

    p = apply_mod(args.mod, original=args.original, N=args.nodes)
    if args.real_data:
        data = np.load(args.real_data, allow_pickle=True)
        controls = np.asarray(data["controls"])[: args.steps]
    else:
        controls = calc_controls(args.type, args.arg, float(p.del_t),
                                 args.steps)
    # refuse silently-ignored flag combinations: the elif chain below
    # dispatches exactly one rollout implementation
    if args.segments and args.model:
        raise SystemExit("simulate: --segments (multiple shooting) does not "
                         "support --model hybrid rollouts yet; drop one")
    if args.segments and args.fast:
        raise SystemExit("simulate: --segments and --fast pick different "
                         "solvers (multiple shooting vs the fused kernel "
                         "driver); drop one")
    if args.model:
        import jax
        import jax.numpy as jnp
        ckpt, meta = load_checkpoint(args.model)
        hidden = meta.get("train", {}).get("hidden", 512)
        spec = MLPSpec.for_knode(int(hidden))
        params = tuple({"w": jnp.asarray(l["w"], p.dtype),
                        "b": jnp.asarray(l["b"], p.dtype)}
                       for l in ckpt["params"])
        # --model --fast composes: the hybrid rollout rides the mega step
        # kernel (whole Newton solve per launch) on TPU
        impl = ("mega" if (args.fast and jax.default_backend() != "cpu")
                else "xla")
        traj = np.asarray(rollout_with_nn(p, jnp.asarray(controls, p.dtype),
                                          spec, params, impl=impl))
    elif args.segments:
        # parallel-in-space Newton (multiple shooting) — the fine-rod
        # (N >> 100) latency path; see core/multiple_shooting.py
        import jax
        import jax.numpy as jnp
        from .core.multiple_shooting import simulate_scan_ms
        out = jax.jit(partial(simulate_scan_ms,
                              n_segments=args.segments))(
                                  p, jnp.asarray(controls, p.dtype))
        traj = np.asarray(out.traj)
    elif args.fast:
        import jax
        import jax.numpy as jnp
        from .core.fast_rollout import make_fast_rollout
        on_cpu = jax.default_backend() == "cpu"
        # pallas compiles only on TPU; CPU falls back to the same FD-Newton
        # driver over XLA sweeps
        roll = jax.jit(make_fast_rollout(p, impl="xla" if on_cpu else "mega"))
        traj3, _, _ = roll(jnp.asarray(controls, p.dtype)[None])
        traj = np.asarray(traj3[0])
    else:
        traj = np.asarray(simulate(p, controls))
    os.makedirs(os.path.dirname(args.save) or ".", exist_ok=True)
    extra = {}
    if args.energy:
        from .core.energy import energy_summary, rod_energies
        extra = {f"energy_{k}": np.asarray(v)
                 for k, v in rod_energies(p, traj).items()}
        print(energy_summary(p, traj))
    np.savez_compressed(args.save, traj=traj, controls=controls, **extra)
    print(f"saved {args.save}: traj {traj.shape}")
    if args.gif:
        from .viz.visualizer import ContinuumRobotVisualizer
        out = ContinuumRobotVisualizer(traj[:, :, :25], p).save_as_gif(
            args.gif, max_frames=100)
        print(f"saved {out}")


def cmd_simulate_assembly(args):
    """Coupled multi-rod (parallel continuum robot) rollout — a capability
    with no reference counterpart (core/assembly.py)."""
    import jax
    import jax.numpy as jnp

    from .controls import calc_controls
    from .core.assembly import (make_ring_assembly, simulate_assembly,
                                with_contact_plane)

    asm = make_ring_assembly(n_rods=args.rods, base_radius=args.base_radius,
                             plate_mass=args.plate_mass, N=args.nodes)
    if args.contact_plane is not None:
        nx, ny, nz, off = args.contact_plane
        asm = with_contact_plane(asm, [nx, ny, nz], off)
    ctl1 = calc_controls(args.type, args.arg,
                         float(np.asarray(asm.rods.del_t)[0]), args.steps)
    controls = np.tile(np.asarray(ctl1)[:, None, :], (1, args.rods, 1))
    if args.pull_rod >= 0:
        controls[:, args.pull_rod, 0] += args.pull_extra
    out = jax.jit(lambda c: simulate_assembly(asm, c))(
        jnp.asarray(controls, asm.dtype))
    traj = np.asarray(out.traj)
    plate = np.asarray(out.plate_pose)
    os.makedirs(os.path.dirname(args.save) or ".", exist_ok=True)
    np.savez_compressed(args.save, traj=traj, plate_pose=plate,
                        controls=controls)
    print(f"saved {args.save}: traj {traj.shape}, plate_pose {plate.shape}")
    print(f"plate tip: start {plate[0, :3]}, end {plate[-1, :3]}; "
          f"max Newton iters {int(np.asarray(out.newton_iters).max())}")


def cmd_multitrain(args):
    import time as _time

    from .core.params import apply_mod
    from .evaluation.tables import evaluate_cells, format_table
    from .parallel.grid import build_grid, grid_train
    from .training import TrainConfig
    from .training.checkpoint import save_checkpoint

    datas = (["sine sine 0.05 0.15", "sine sine random 0.05 0.15 0.0"]
             if args.original else
             ["sine sine 0.5 1.0", "sine sine random 0.5 1.0 0.0"])
    eval_set = (["sine 0.2", "step 1.5"] if args.original
                else ["sine 1.5", "step 1.5"])
    mods = ["nsw", "short", "youngs", "lengthstiff"]

    cells = build_grid(datas, mods, args.n_seeds)
    cfg = TrainConfig(epochs=args.epochs, hidden=args.layers,
                      dtype=args.dtype)
    ref = apply_mod(None, original=args.original)
    t0 = _time.perf_counter()
    res = grid_train(cells, cfg, reference_rod=ref, original=args.original,
                     mesh=_parse_mesh(args.mesh),
                     log=print if args.verbose else None)
    t1 = _time.perf_counter()
    os.makedirs(args.save_dir, exist_ok=True)
    for cell, params in zip(res.cells, res.params):
        name = (f"{cell.data}_{cell.mod}_{cell.seed}").replace(" ", "-")
        save_checkpoint(os.path.join(args.save_dir, name),
                        {"params": params})
    t2 = _time.perf_counter()
    if args.eval:
        records = evaluate_cells(res.cells, res.params, res.spec, eval_set,
                                 reference_rod=ref, original=args.original,
                                 save_dir=args.evals_dir)
        print(format_table(records))
    t3 = _time.perf_counter()
    phases = (f"phases: datagen+train {t1 - t0:.1f}s, save {t2 - t1:.1f}s"
              + (f", eval {t3 - t2:.1f}s" if args.eval else ""))
    print(phases)


def cmd_graphs(args):
    from .evaluation.metrics import pose_mse, tip_dtw
    from .evaluation.tables import EvalRecord, aggregate_seeds, format_table

    records = []
    evals, labels = set(), set()
    for fname in sorted(os.listdir(args.evals_dir)):
        if not fname.endswith(".npz"):
            continue
        d = np.load(os.path.join(args.evals_dir, fname))
        stem = fname[:-4]
        evall, label = stem.split("+", 1)
        evall = evall.replace("physics_original_", "").replace(
            "physics_", "").replace("_", " ")
        label = label.replace("_", " ")
        evals.add(evall)
        labels.add(label)
        records.append(EvalRecord(
            label=label, eval_name=evall,
            dtw=tip_dtw(d["predicted"], d["reference"]),
            mse=pose_mse(d["predicted"], d["reference"])))
    print(format_table(aggregate_seeds(records)))

    if args.tipx:
        # tip-X generalization figures (physics_multigraphs.py:186-231);
        # mods/datas inferred from the trained-cell record labels
        from .viz.visualizer import tip_generalization_plot
        mods, datas = set(), set()
        for label in labels:
            if label.startswith("baseline"):
                mods.add(label.split(" ", 1)[1])
            else:
                parts = label.split(" ")
                datas.add(" ".join(parts[:-2]))
        for evall in sorted(evals):
            out = os.path.join(args.figs_dir,
                               f"tipx_{evall.replace(' ', '_')}.png")
            tip_generalization_plot(args.evals_dir, evall, sorted(mods),
                                    sorted(datas), save=out)
            print(f"saved {out}")


def cmd_prepare(args):
    from .core.params import apply_mod
    from .core.stepper import simulate
    from .evaluation.metrics import fastdtw
    from .realworld.bag import read_bag, read_topic_csvs

    p = apply_mod(None)
    if os.path.isdir(args.experiment):
        data = read_topic_csvs(args.experiment, float(p.del_t),
                               args.experiment)
    else:
        data = read_bag(args.experiment, float(p.del_t))
    traj = np.asarray(simulate(p, data["controls"]))
    name = os.path.basename(args.experiment.rstrip("/"))
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, f"{name}.npz")
    np.savez_compressed(out, t=data["t"], traj=traj,
                        controls=data["controls"],
                        interpolated=data["interpolated"],
                        positions=data["positions"])
    tip = data["interpolated"][:, 0:3, 9]
    T = min(len(traj), len(tip))
    print("DTW Distance XYZ",
          fastdtw(np.asarray(traj)[:T, -1, :3], tip[:T])[0])
    print(f"saved {out}")


def cmd_playback(args):
    """Animated 3D playback of ingested mocap data (plot_bag.py parity)."""
    from .viz.mocap import MocapPlayback

    d = np.load(args.data, allow_pickle=True)
    positions = np.asarray(d["positions"])          # (T, n_links, 3)
    quats = None
    if "interpolated" in d:
        interp = np.asarray(d["interpolated"])      # (T, 7, N)
        marker_nodes = [0, 3, 5, 7, 9]
        quats = np.stack([interp[:, 3:7, i] for i in marker_nodes], axis=1)
    out = MocapPlayback(positions, quats).save_as_gif(
        args.gif, max_frames=args.max_frames)
    print(f"saved {out}")


def cmd_estimate(args):
    from .core.params import make_rod
    from .realworld.curve import fit_curve
    from .realworld.estimate import estimate_state

    rod = make_rod()  # the reference uses CosseratRod() defaults here
    d = np.load(os.path.join(args.data_dir, args.data_name + ".npz"),
                allow_pickle=True)
    interpolated = d["interpolated"]
    controls = d["controls"]
    measured_loc = [0, 3.23, 5.13, 7.07, 9]  # estimate_state.py:258
    partial = np.stack([interpolated[:, :, i] for i in [0, 3, 5, 7, 9]],
                       axis=2)
    full_grid = fit_curve(partial, measured_loc, rod.N)
    est, vstar = estimate_state(full_grid, controls, rod)
    out = os.path.join(args.data_dir, args.data_name + "_estimated.npz")
    np.savez_compressed(out, traj=est, controls=controls, vstar=vstar)
    print(f"saved {out}")


def cmd_train_real(args):
    import jax
    import jax.numpy as jnp
    from .core.params import apply_mod
    from .training import DEFAULT_KEYPOINTS_REAL, TrainConfig, train_knode
    from .training.checkpoint import save_checkpoint

    presets = {
        "sinesine": ["sin_1_0_amp_300", "sin_3_0_amp_300"],
        "sinesinerand": ["sin_1_0_amp_300", "sin_3_0_amp_300", "rand_0_60s"],
        "sinesinestep": ["sin_1_0_amp_300", "sin_3_0_amp_300",
                         "dir_a_tension_950"],
        "sinesinestepstep": ["sin_1_0_amp_300", "sin_3_0_amp_300",
                             "dir_a_tension_950", "dir_a_tension_1250"],
    }
    names = presets.get(args.data, [args.data])
    trajs, ctls = [], []
    trim = 100  # train_segment.py:36
    for n in names:
        d = np.load(os.path.join(args.data_dir, n + "_estimated.npz"),
                    allow_pickle=True)
        t = d["traj"][trim:args.train_len + trim, :25]
        trajs.append(np.moveaxis(t, 1, 2))       # -> (T, N, 25)
        ctls.append(d["controls"][trim:args.train_len + trim])
    trajs = jnp.asarray(np.stack(trajs))
    ctls = jnp.asarray(np.stack(ctls))
    key = jax.random.PRNGKey(args.seed)
    trajs = trajs + args.noise_traj * jax.random.normal(key, trajs.shape,
                                                        trajs.dtype)

    p = apply_mod(args.mod)
    cfg = TrainConfig(epochs=args.epochs, hidden=args.layers,
                      weight_decay=args.weight_decay, seed=args.seed,
                      keypoints=DEFAULT_KEYPOINTS_REAL, dtype=args.dtype)
    res = train_knode(p, trajs, ctls, cfg)
    save_checkpoint(args.save_path, {"params": res.params,
                                     "loss": res.loss_history})
    print(f"saved {args.save_path} (final loss {res.loss_history[-1]:.3e})")


def machine_fingerprint() -> str:
    """Short hash of the host CPU identity (arch + model name + flags).

    XLA:CPU persistent-cache entries embed AOT machine code for the
    COMPILING host's CPU features; JAX's cache key does not include them,
    so replaying a cache dir on a different host (e.g. after a VM
    migration) SIGSEGVs/SIGILLs inside the deserialized executable.
    The MODEL NAME matters, not just the feature flags: XLA derives
    per-microarchitecture tuning features (+prefer-no-scatter,
    +prefer-no-gather, amx variants) from the CPU model, and two hosts
    with identical cpuinfo flags but different models produce
    incompatible AOT results (observed as cpu_aot_loader feature-
    mismatch errors). Scoping the cache dir by this fingerprint makes
    foreign entries unreachable instead of fatal."""
    import hashlib
    import platform

    txt = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                low = line.lower()
                if low.startswith(("flags", "features", "model name",
                                   "hardware", "cpu part")):
                    txt += line
                if low.startswith("processor") and ": 1" in line:
                    break       # first core only — all cores identical
    except OSError:
        txt += platform.processor() or ""
    return hashlib.sha256(txt.encode()).hexdigest()[:12]


def install_atomic_cache_writes():
    """Make JAX's persistent-cache writes atomic (tempfile + os.replace).

    jax._src.lru_cache.LRUCache.put writes bytes DIRECTLY to the final
    cache path, and with eviction disabled (no max size configured, the
    default here) it takes no lock either — so when several processes
    share a cache dir, a reader can consume a half-written entry and
    SIGSEGV inside backend.deserialize_executable (observed mid-suite
    with three concurrent pytest processes). A same-directory tempfile
    renamed into place makes entries visible only when complete."""
    import os as _os

    try:
        from jax._src import lru_cache as _lru
    except ImportError:      # cache backend moved/absent: nothing to fix
        return
    orig_put = _lru.LRUCache.put
    if getattr(orig_put, "_knode_atomic", False):
        return

    def atomic_put(self, key, val):
        if not key:
            raise ValueError("key cannot be empty")
        if self.eviction_enabled:     # eviction path holds a file lock
            return orig_put(self, key, val)
        cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
        if cache_path.exists():
            return
        tmp = cache_path.with_name(f"{cache_path.name}.tmp{_os.getpid()}")
        try:
            tmp.write_bytes(val)
            _os.replace(tmp, cache_path)
        except OSError:               # cache write failure is never fatal
            try:
                tmp.unlink()
            except OSError:
                pass

    atomic_put._knode_atomic = True
    _lru.LRUCache.put = atomic_put


def enable_compile_cache():
    """Persistent XLA compile cache for every product entry point: repeat
    CLI/bench invocations skip the 20-150 s first-compile of the big jits
    (kernel grids, vmapped rollouts). The dir is scoped by
    machine_fingerprint() — see its docstring — and writes are made
    atomic (install_atomic_cache_writes). Opt out:
    KNODE_NO_COMPILE_CACHE=1."""
    if os.environ.get("KNODE_NO_COMPILE_CACHE"):
        return
    import jax
    install_atomic_cache_writes()
    cache = os.environ.get(
        "KNODE_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "knode_cosserat_tpu", "jax"))
    cache = os.path.join(cache, machine_fingerprint())
    try:
        os.makedirs(cache, exist_ok=True)
    except OSError:
        return  # unwritable HOME/dir: run without the cache, never crash
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def coerce_traj_layout(t, N, layout="auto"):
    """Return ``t`` in state-last (T, N, C) layout, C in (25, 50).

    layout: "state-last", "reference" ((T, C, N), transposed), or "auto".
    Auto-detection REFUSES the ambiguous case — a rod with N in (25, 50)
    nodes matches both patterns, and silently picking one would read
    channels as nodes (advisor finding, round 3)."""
    if t.ndim != 3:
        raise SystemExit(f"sysid: traj must be 3-D, got {t.shape}")
    state_last = t.shape[1] == N and t.shape[2] in (25, 50)
    ref_layout = t.shape[1] in (25, 50) and t.shape[2] == N
    if layout == "auto" and state_last and ref_layout:
        raise SystemExit(
            f"sysid: traj shape {t.shape} is ambiguous for a rod with "
            f"N={N} nodes (both layouts match); pass --layout "
            "state-last or --layout reference")
    if layout == "state-last" or (layout == "auto" and state_last):
        if not state_last:
            raise SystemExit(f"sysid: traj shape {t.shape} is not "
                             f"state-last (T, N={N}, 25|50)")
        return t
    if layout == "reference" or (layout == "auto" and ref_layout):
        if not ref_layout:
            raise SystemExit(f"sysid: traj shape {t.shape} is not "
                             f"reference layout (T, 25|50, N={N})")
        return np.moveaxis(t, 1, 2)
    raise SystemExit(
        f"sysid: traj shape {t.shape} matches neither (T, N={N}, "
        f"25|50) nor (T, 25|50, N={N}); check the file or --mod/"
        "--original node count")


def cmd_replicate(args):
    """One command, the whole physical workflow, no hardware: teleop
    joystick experiment -> C++ firmware PID -> simulated winch plant ->
    rosbag recording -> bag ingestion -> state estimation -> KNODE
    training (SURVEY.md §3.5 L7->L5->L3; VERDICT-r3 #8)."""
    from .hw.sil import replicate_workflow

    summary = replicate_workflow(
        args.out_dir, experiment=args.experiment, parameter=args.parameter,
        mod=args.mod, epochs=args.epochs, hidden=args.layers,
        trim=args.trim, train_len=args.train_len, seed=args.seed,
        settle=args.settle, tail=args.tail, noise_traj=args.noise_traj)
    print(f"replicate complete: model {summary['model']} "
          f"(loss {summary['loss_initial']:.3e} -> "
          f"{summary['loss_final']:.3e}, ingest DTW {summary['dtw']:.4f})")


def _resolve_sysid_dtype(requested: str) -> str:
    """Identification dtype policy (VERDICT-r3 #3: the product runs ON
    CHIP by default).

    "auto" (the default) -> float32 wherever the backend is free to be
    the TPU (f32 recovery is <0.1% for every fittable parameter —
    measured, docs/BENCHMARKS.md precision study); when the caller
    already pinned CPU via KNODE_PLATFORM the f64 precision is free, so
    take it. "float64" is the opt-in high-precision mode and pins CPU
    (TPUs have no f64 LinAlg lowerings and large f64 implicit-rollout
    programs crash the libtpu worker)."""
    if requested != "auto":
        return requested
    return ("float64" if os.environ.get("KNODE_PLATFORM") == "cpu"
            else "float32")


def cmd_sysid(args):
    import jax
    dtype_name = _resolve_sysid_dtype(args.dtype)
    if dtype_name == "float64":
        jax.config.update("jax_enable_x64", True)
        # see _resolve_sysid_dtype: explicit f64 is the off-chip mode
        if not os.environ.get("KNODE_PLATFORM"):
            jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from .controls import calc_controls
    from .core.params import apply_mod
    from .core.stepper import simulate_scan
    from .training.sysid import fit_rod_params, theta_init, theta_values

    dtype = jnp.float64 if dtype_name == "float64" else jnp.float32
    if getattr(args, "assembly", 0):
        return _sysid_assembly(args, dtype)
    p0 = apply_mod(args.mod, original=args.original, dtype=dtype)

    truth = None
    if args.data:
        data = np.load(args.data, allow_pickle=True)
        t = np.asarray(data["traj"])
        # disambiguate layout against the rod's node count: state-last is
        # (T, N, C) with C in (25, 50); reference layout is (T, C, N)
        t = coerce_traj_layout(t, int(p0.N), getattr(args, "layout", "auto"))
        traj = jnp.asarray(t[args.trim:, :, :25], dtype)
        controls = jnp.asarray(np.asarray(data["controls"])[args.trim:],
                               dtype)
    else:
        # canonical fault-injection experiment: the plant is the TRUE rod,
        # the model starts at the faulted mod and must recover it
        plant = apply_mod(None, original=args.original, dtype=dtype)
        controls = jnp.asarray(
            calc_controls(args.type, args.arg, float(plant.del_t),
                          args.length), dtype)
        traj = simulate_scan(plant, controls).traj[:, :, :25]
        truth = theta_values(theta_init(plant, args.fit))

    # full-length rollout-objective programs (custom_root through every
    # Newton solve x every fit step in ONE scan) crash the libtpu worker;
    # chunking the fit scan bounds program size with identical results
    # (training/sysid.fit_rod_params docstring). Teacher fits and CPU
    # runs keep the single-program fast path.
    chunk = args.chunk
    if chunk == 0:
        chunk = (50 if args.objective == "rollout"
                 and os.environ.get("KNODE_PLATFORM") != "cpu"
                 and dtype_name != "float64" else None)

    # external data windows start mid-motion (or at an unknown state):
    # drop the fabricated first transition from the teacher loss there
    res = fit_rod_params(p0, traj, controls, fields=tuple(args.fit),
                         objective=args.objective, steps=args.steps,
                         lr=args.lr, n_starts=args.n_starts,
                         skip_first=bool(args.data), chunk=chunk)
    if args.n_starts > 1:
        print("start losses:",
              " ".join(f"{v:.3e}" for v in np.asarray(res.start_losses)))
    start = theta_values(theta_init(p0, args.fit))
    print(f"objective {args.objective}: loss "
          f"{float(res.loss_history[0]):.3e} -> "
          f"{float(res.loss_history[-1]):.3e} in {args.steps} steps")
    for name in args.fit:
        line = f"  {name}: {start[name]} -> {res.values[name]}"
        if truth is not None:
            line += f"  (true {truth[name]})"
        print(line)


def _sysid_assembly(args, dtype):
    """`sysid --assembly M`: per-rod fault localization on an M-rod
    parallel continuum robot from end-plate pose observations only.

    The plant is an M-rod ring whose ROD 0 carries the --mod parameter
    fault (every other rod nominal); the fit starts all-nominal and must
    both recover the faulted value and point at the right rod — the
    no-per-rod-sensing damage-detection workflow
    (training/sysid.fit_assembly_params; no reference analogue)."""
    import jax
    import jax.numpy as jnp

    from .controls import calc_controls
    from .core.assembly import make_ring_assembly, simulate_assembly
    from .core.params import apply_mod
    from .training.sysid import (_unstack_rods, apply_theta,
                                 fit_assembly_params, theta_init,
                                 theta_values)

    M = int(args.assembly)
    if M < 2:
        raise SystemExit("--assembly needs M >= 2 rods")
    asm_nom = make_ring_assembly(n_rods=M, dtype=dtype)
    rods = _unstack_rods(asm_nom.rods, M)
    faulted = apply_mod(args.mod, original=args.original, dtype=dtype)
    fault_theta = theta_init(faulted, args.fit)
    rods_true = [apply_theta(rods[0], fault_theta)] + rods[1:]
    asm_true = asm_nom.replace(
        rods=jax.tree.map(lambda *xs: jnp.stack(xs), *rods_true))

    del_t = float(np.asarray(rods[0].del_t))
    # per-rod phase-shifted excitation separates the rods
    ctl = jnp.asarray(np.stack(
        [np.asarray(calc_controls(args.type, args.arg * (1 + 0.5 * i),
                                  del_t, args.length))
         for i in range(M)], axis=1), dtype)
    obs = simulate_assembly(asm_true, ctl)
    res = fit_assembly_params(asm_nom, obs.plate_pose, ctl,
                              fields=tuple(args.fit), steps=args.steps,
                              lr=args.lr, w_ori=args.w_ori,
                              chunk=args.chunk or None)
    truth = theta_values(
        jax.tree.map(lambda *xs: jnp.stack(xs),
                     *[theta_init(r, args.fit) for r in rods_true]))
    start = theta_values(
        jax.tree.map(lambda *xs: jnp.stack(xs),
                     *[theta_init(r, args.fit) for r in rods]))
    print(f"assembly sysid (M={M}, fault in rod 0 via mod "
          f"{args.mod!r}): loss {float(res.loss_history[0]):.3e} -> "
          f"{float(res.loss_history[-1]):.3e} in {args.steps} steps")
    for name in args.fit:
        fit_v = np.asarray(res.values[name])
        true_v = np.asarray(truth[name])
        rel = np.abs(fit_v - true_v) / np.maximum(np.abs(true_v), 1e-30)
        print(f"  {name} per rod: start {start[name]}")
        print(f"  {name} fit : {fit_v}")
        print(f"  {name} true: {true_v}  (max rel err {rel.max():.2e})")
        start_v = np.asarray(start[name])
        dev = np.abs(fit_v - start_v) / np.maximum(np.abs(start_v), 1e-30)
        flat = dev.reshape(M, -1).sum(axis=1)
        print(f"  localization: rod {int(np.argmax(flat))} moved most "
              f"(expected 0)")


def cmd_design(args):
    import jax
    dtype_name = _resolve_sysid_dtype(args.dtype)
    if dtype_name == "float64":
        jax.config.update("jax_enable_x64", True)
        if not os.environ.get("KNODE_PLATFORM"):
            jax.config.update("jax_platforms", "cpu")  # see cmd_sysid
    import jax.numpy as jnp

    from .core.params import apply_mod
    from .training.sysid import design_experiment

    dtype = jnp.float64 if dtype_name == "float64" else jnp.float32
    p = apply_mod(args.mod, original=args.original, dtype=dtype)
    res = design_experiment(p, fields=tuple(args.fit), horizon=args.horizon,
                            criterion=args.criterion, u_min=args.u_min,
                            u_max=args.u_max, steps=args.steps, lr=args.lr)
    crit = ("log det Fisher" if args.criterion == "D"
            else "min Fisher eigenvalue")
    print(f"{crit}: {res.info_initial:.3f} -> {res.info_final:.3f} "
          f"({args.steps} steps, fields {' '.join(args.fit)})")
    os.makedirs(os.path.dirname(args.save) or ".", exist_ok=True)
    np.savez_compressed(args.save, controls=np.asarray(res.controls),
                        objective_history=np.asarray(res.objective_history))
    print(f"saved {args.save}: controls {res.controls.shape} — run it with "
          f"`simulate --real_data {args.save}` or on the physical rig, "
          "then `sysid --data ...`")


def main(argv=None):
    # honor an explicit platform request (the axon TPU plugin ignores
    # JAX_PLATFORMS, so we route through jax.config)
    plat = os.environ.get("KNODE_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
        if os.environ.get("KNODE_X64"):
            jax.config.update("jax_enable_x64", True)
    enable_compile_cache()

    ap = argparse.ArgumentParser(prog="knode-cosserat-tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("train", help="sim-data KNODE training")
    _add_train_args(sp)
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("simulate", help="forward rollout")
    sp.add_argument("--type", type=str, default="sine")
    sp.add_argument("--arg", type=float, default=1.0)
    sp.add_argument("--steps", type=int, default=100)
    sp.add_argument("--mod", type=str, default=None)
    sp.add_argument("--original", action="store_true")
    sp.add_argument("--model", type=str, default=None)
    sp.add_argument("--real_data", type=str, default=None)
    sp.add_argument("--nodes", type=int, default=10,
                    help="rod node count N (default 10)")
    sp.add_argument("--segments", type=int, default=0,
                    help="parallel-in-space multiple shooting with S "
                         "segments (must divide N-1); the fine-rod path")
    sp.add_argument("--fast", action="store_true",
                    help="mega-kernel Pallas rollout (TPU); composes "
                         "with --model for hybrid rollouts")
    sp.add_argument("--save", type=str, default="data/quick_test.npz")
    sp.add_argument("--gif", type=str, default=None)
    sp.add_argument("--energy", action="store_true",
                    help="print + save mechanical-energy budgets "
                         "(core/energy.py)")
    sp.set_defaults(fn=cmd_simulate)

    sp = sub.add_parser("simulate-assembly",
                        help="coupled multi-rod (parallel continuum) rollout")
    sp.add_argument("--rods", type=int, default=3)
    sp.add_argument("--base_radius", type=float, default=0.05)
    sp.add_argument("--plate_mass", type=float, default=0.0)
    sp.add_argument("--nodes", type=int, default=10)
    sp.add_argument("--type", type=str, default="sine")
    sp.add_argument("--arg", type=float, default=1.0)
    sp.add_argument("--steps", type=int, default=100)
    sp.add_argument("--pull_rod", type=int, default=-1,
                    help="index of a rod to overpull (tendon 0)")
    sp.add_argument("--pull_extra", type=float, default=3.0)
    sp.add_argument("--contact_plane", type=float, nargs=4, default=None,
                    metavar=("NX", "NY", "NZ", "OFFSET"),
                    help="rigid plane n.x = offset the plate can touch "
                         "(smoothed penalty contact)")
    sp.add_argument("--save", type=str, default="data/assembly.npz")
    sp.set_defaults(fn=cmd_simulate_assembly)

    sp = sub.add_parser("multitrain", help="experiment grid + eval table")
    sp.add_argument("--epochs", type=int, default=1000)
    sp.add_argument("--n_seeds", type=int, default=1)
    sp.add_argument("--layers", type=int, default=512)
    sp.add_argument("--original", action="store_true")
    sp.add_argument("--eval", action=argparse.BooleanOptionalAction,
                    default=True)
    sp.add_argument("--verbose", action="store_true")
    sp.add_argument("--save_dir", type=str, default="saved_models")
    sp.add_argument("--evals_dir", type=str, default="evals")
    sp.add_argument("--dtype", type=str, default="float32")
    sp.add_argument("--mesh", type=str, default=None,
                    help='multi-chip mesh "data,seq,model" — shards the '
                         "grid axis over devices")
    sp.set_defaults(fn=cmd_multitrain)

    sp = sub.add_parser("graphs", help="aggregate eval records")
    sp.add_argument("--evals_dir", type=str, default="evals")
    sp.add_argument("--tipx", action="store_true",
                    help="write tip-X generalization figures")
    sp.add_argument("--figs_dir", type=str, default="figures")
    sp.set_defaults(fn=cmd_graphs)

    sp = sub.add_parser("prepare", help="ingest physical experiment data")
    sp.add_argument("experiment", type=str)
    sp.add_argument("--out_dir", type=str, default="datas")
    sp.set_defaults(fn=cmd_prepare)

    sp = sub.add_parser("playback", help="3D mocap playback gif")
    sp.add_argument("data", type=str, help="datas/<name>.npz from prepare")
    sp.add_argument("--gif", type=str, default="animations/playback.gif")
    sp.add_argument("--max_frames", type=int, default=200)
    sp.set_defaults(fn=cmd_playback)

    sp = sub.add_parser("estimate", help="full-state estimation")
    sp.add_argument("data_name", type=str)
    sp.add_argument("--data_dir", type=str, default="datas")
    sp.set_defaults(fn=cmd_estimate)

    sp = sub.add_parser(
        "sysid", help="gradient-based physical-parameter identification")
    sp.add_argument("--fit", nargs="+", default=["E"],
                    help="base parameters to fit (E L r rho Bbt C g ...)")
    sp.add_argument("--mod", type=str, default="youngs",
                    help="faulted starting point (the mods registry)")
    sp.add_argument("--original", action="store_true")
    sp.add_argument("--objective", choices=("teacher", "rollout"),
                    default="teacher")
    sp.add_argument("--steps", type=int, default=300)
    sp.add_argument("--lr", type=float, default=0.1)
    sp.add_argument("--n_starts", type=int, default=1,
                    help=">1: vmapped random-restart fits, best wins")
    sp.add_argument("--type", type=str, default="sine",
                    help="plant control signal (when no --data)")
    sp.add_argument("--arg", type=float, default=1.0)
    sp.add_argument("--length", type=int, default=60,
                    help="plant trajectory steps (when no --data)")
    sp.add_argument("--data", type=str, default=None,
                    help="npz with traj+controls (from `simulate`, prepare, "
                         "or estimate) instead of the generated plant; both "
                         "state-last and reference (T, C, N) layouts accepted")
    sp.add_argument("--trim", type=int, default=0,
                    help="drop the first TRIM steps (estimated real data "
                         "uses 100, train_segment.py:36)")
    sp.add_argument("--layout", choices=("auto", "state-last", "reference"),
                    default="auto",
                    help="traj axis layout of --data: state-last (T, N, C) "
                         "or reference (T, C, N); required explicitly when "
                         "N is 25 or 50 (ambiguous)")
    sp.add_argument("--dtype", choices=("auto", "float32", "float64"),
                    default="auto",
                    help="auto (default): f32 ON CHIP (recovery <0.1%% "
                         "per parameter, docs/BENCHMARKS.md), or f64 when "
                         "KNODE_PLATFORM=cpu; float64: opt-in high-"
                         "precision mode, pins CPU")
    sp.add_argument("--chunk", type=int, default=0,
                    help="fit-scan chunk size (program-size bound); 0 = "
                         "auto (50 for on-chip rollout fits, whole-run "
                         "otherwise)")
    sp.add_argument("--assembly", type=int, default=0, metavar="M",
                    help="fault localization on an M-rod parallel "
                         "continuum robot: the plant carries the --mod "
                         "fault in ROD 0 only, the fit recovers per-rod "
                         "values from END-PLATE pose alone "
                         "(training/sysid.fit_assembly_params)")
    sp.add_argument("--w_ori", type=float, default=1.0,
                    help="plate-orientation observation weight for "
                         "--assembly (0 = positions only; orientation is "
                         "what separates symmetric rods)")
    sp.set_defaults(fn=cmd_sysid)

    sp = sub.add_parser(
        "design", help="Fisher-optimal input design for sysid")
    sp.add_argument("--fit", nargs="+", default=["E"],
                    help="parameters the experiment should inform")
    sp.add_argument("--mod", type=str, default=None,
                    help="nominal rod the design linearizes around")
    sp.add_argument("--original", action="store_true")
    sp.add_argument("--horizon", type=int, default=30)
    sp.add_argument("--criterion", choices=("D", "E"), default="D")
    sp.add_argument("--u_min", type=float, default=0.0)
    sp.add_argument("--u_max", type=float, default=10.0)
    sp.add_argument("--steps", type=int, default=100)
    sp.add_argument("--lr", type=float, default=0.2)
    sp.add_argument("--save", type=str, default="data/designed_controls.npz")
    sp.add_argument("--dtype", choices=("auto", "float32", "float64"),
                    default="auto", help="see sysid --dtype")
    sp.set_defaults(fn=cmd_design)

    sp = sub.add_parser(
        "replicate",
        help="full physical workflow from synthetic hardware: teleop SIL "
             "-> firmware PID -> rosbag -> prepare -> estimate -> "
             "train-real, one command")
    sp.add_argument("--out_dir", type=str, default="runs/replicate")
    sp.add_argument("--experiment", type=str, default="sine",
                    choices=["step_x", "step_y", "sine", "random"],
                    help="joystick experiment (motor_joy_teleop:60-109)")
    sp.add_argument("--parameter", type=int, default=0,
                    help="experiment variant 0-15 (trigger/bumper bits)")
    sp.add_argument("--mod", type=str, default="nsw",
                    help="faulted physics the KNODE residual must correct")
    sp.add_argument("--epochs", type=int, default=30)
    sp.add_argument("--layers", type=int, default=32)
    sp.add_argument("--trim", type=int, default=5)
    sp.add_argument("--train_len", type=int, default=40)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--settle", type=float, default=1.0)
    sp.add_argument("--tail", type=float, default=1.0)
    sp.add_argument("--noise_traj", type=float, default=0.0)
    sp.set_defaults(fn=cmd_replicate)

    sp = sub.add_parser("train-real", help="real-data KNODE training")
    sp.add_argument("--data", type=str, default="sinesine")
    sp.add_argument("--data_dir", type=str, default="datas")
    sp.add_argument("--epochs", type=int, default=300)
    sp.add_argument("--layers", type=int, default=512)
    sp.add_argument("--weight_decay", type=float, default=1e-1)
    sp.add_argument("--train_len", type=int, default=120)
    sp.add_argument("--noise_traj", type=float, default=0.01)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--mod", type=str, default=None)
    sp.add_argument("--save_path", type=str,
                    default="saved_models/quick_test")
    sp.add_argument("--dtype", type=str, default="float32")
    sp.set_defaults(fn=cmd_train_real)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
