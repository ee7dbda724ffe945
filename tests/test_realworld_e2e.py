"""Real-world track, end to end on synthetic data: per-topic CSVs (as bagpy
would extract from a .bag) -> ingestion -> preprocessing -> simulate ->
state estimation -> KNODE training. Mirrors the reference chain
prepare.py -> estimate_state.py -> train_segment.py without hardware."""
import os
import subprocess
import sys

import numpy as np
import pytest
from scipy.spatial.transform import Rotation, Slerp

from knode_cosserat_tpu import apply_mod, calc_controls, simulate
from knode_cosserat_tpu.realworld import estimate_state, fit_curve
from knode_cosserat_tpu.realworld.bag import read_topic_csvs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_synthetic_csvs(tmp_path, T=60):
    """Simulate the experimental rod, then fake the mocap/tension topics a
    real experiment would record (5 Vicon markers at the marker arc
    fractions, tension QuaternionStamped, rosout command log)."""
    import pandas as pd
    p = apply_mod(None)
    del_t = float(p.del_t)
    controls = calc_controls("sine", 1.0, del_t, T)
    traj = np.asarray(simulate(p, controls, reference_layout=True))

    ts = np.arange(T) * del_t
    # markers sit at nodes ~ [0, 3, 5, 7, 9] of the N=10 grid
    marker_nodes = [0, 3, 5, 7, 9]
    links = ["base", "link0", "link1", "link2", "link3"]
    base_height = 0.0635

    for name, node in zip(links, marker_nodes):
        pos = traj[:, :3, node].copy()
        # undo adj_pos: world = rod + base offset; base marker not lifted
        if node != 0:
            pos[:, 2] -= base_height
        quat_sf = traj[:, 3:7, node]
        quat_xyzw = quat_sf[:, [1, 2, 3, 0]]
        df = pd.DataFrame({
            "Time": ts,
            "pose.position.x": pos[:, 0],
            "pose.position.y": pos[:, 1],
            "pose.position.z": pos[:, 2],
            "pose.orientation.x": quat_xyzw[:, 0],
            "pose.orientation.y": quat_xyzw[:, 1],
            "pose.orientation.z": quat_xyzw[:, 2],
            "pose.orientation.w": quat_xyzw[:, 3],
        })
        topic = ("vicon-continuum_base-pose" if name == "base"
                 else f"vicon-continuum_{name[-1]}-pose")
        df.to_csv(tmp_path / f"{topic}.csv", index=False)

    grams = np.asarray(controls) * 1000.0 / 9.81
    pd.DataFrame({
        "Time": ts,
        "quaternion.x": grams[:, 3],   # channel order quirk: [y,z,w,x]
        "quaternion.y": grams[:, 0],
        "quaternion.z": grams[:, 1],
        "quaternion.w": grams[:, 2],
    }).to_csv(tmp_path / "tension.csv", index=False)
    pd.DataFrame({
        "Time": ts,
        "msg": [("Serial Command: %d %d %d %d"
                 % (grams[i, 3], grams[i, 0], grams[i, 1], grams[i, 2]))
                for i in range(T)],
    }).to_csv(tmp_path / "rosout.csv", index=False)
    return p, controls, traj


def test_realworld_pipeline_end_to_end(tmp_path):
    p, controls, traj = _write_synthetic_csvs(tmp_path)
    data = read_topic_csvs(str(tmp_path), float(p.del_t), "synthetic")

    # ingestion recovers the tensions (ZOH of the same schedule)
    n = min(len(data["controls"]), len(controls)) - 1
    np.testing.assert_allclose(data["controls"][1:n], controls[1:n],
                               atol=0.02)

    # interpolated poses track the simulated rod (spline through 5 markers)
    interp = data["interpolated"]
    m = min(len(interp), len(traj))
    tip_err = np.abs(interp[:m, :3, 9] - traj[:m, :3, 9]).max()
    assert tip_err < 5e-3, tip_err

    # state estimation on the refit grid produces a finite 25-state traj
    measured_loc = [0, 3.23, 5.13, 7.07, 9]
    partial = np.stack([interp[:, :, i] for i in [0, 3, 5, 7, 9]], axis=2)
    full_grid = fit_curve(partial, measured_loc, p.N)
    est, vstar = estimate_state(full_grid, data["controls"][:m], p)
    assert np.isfinite(est).all()
    # positions pass through unchanged; velocities track the simulator's
    np.testing.assert_allclose(est[:, :3, 9], full_grid[:, :3, 9], atol=1e-9)

    # KNODE training on the estimated states runs and reduces the loss
    import jax.numpy as jnp
    from knode_cosserat_tpu.training import (DEFAULT_KEYPOINTS_REAL,
                                             TrainConfig, train_knode)
    trajs = jnp.asarray(np.moveaxis(est, 1, 2)[None, 5:25])
    ctls = jnp.asarray(np.asarray(data["controls"])[None, 5:25])
    res = train_knode(apply_mod("nsw"), trajs, ctls,
                      TrainConfig(epochs=10, hidden=16, dtype="float64",
                                  keypoints=DEFAULT_KEYPOINTS_REAL,
                                  log_every=10**9), log=None)
    assert res.loss_history[-1] < res.loss_history[0]


def test_cli_prepare_estimate_chain(tmp_path):
    """CLI: prepare <csv-dir> then estimate <name> produce the data files."""
    csv_dir = tmp_path / "exp1"
    csv_dir.mkdir()
    _write_synthetic_csvs(csv_dir, T=30)
    out_dir = tmp_path / "datas"
    env = dict(os.environ)
    env["KNODE_PLATFORM"] = "cpu"
    r = subprocess.run([sys.executable, "-m", "knode_cosserat_tpu",
                        "prepare", str(csv_dir), "--out_dir", str(out_dir)],
                       capture_output=True, text=True, cwd=REPO, env=env,
                       timeout=400)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out_dir / "exp1.npz").exists()
    assert "DTW Distance XYZ" in r.stdout

    r = subprocess.run([sys.executable, "-m", "knode_cosserat_tpu",
                        "estimate", "exp1", "--data_dir", str(out_dir)],
                       capture_output=True, text=True, cwd=REPO, env=env,
                       timeout=400)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out_dir / "exp1_estimated.npz").exists()
    est = np.load(out_dir / "exp1_estimated.npz")
    assert est["traj"].shape[1] == 25


def test_cli_playback(tmp_path):
    csv_dir = tmp_path / "exp2"
    csv_dir.mkdir()
    _write_synthetic_csvs(csv_dir, T=12)
    out_dir = tmp_path / "datas"
    env = dict(os.environ)
    env["KNODE_PLATFORM"] = "cpu"
    env["MPLBACKEND"] = "Agg"
    subprocess.run([sys.executable, "-m", "knode_cosserat_tpu", "prepare",
                    str(csv_dir), "--out_dir", str(out_dir)],
                   capture_output=True, cwd=REPO, env=env, timeout=400,
                   check=True)
    gif = tmp_path / "pb.gif"
    r = subprocess.run([sys.executable, "-m", "knode_cosserat_tpu",
                        "playback", str(out_dir / "exp2.npz"),
                        "--gif", str(gif), "--max_frames", "3"],
                       capture_output=True, text=True, cwd=REPO, env=env,
                       timeout=400)
    assert r.returncode == 0, r.stderr[-2000:]
    assert gif.exists()


def test_cli_train_real_chain(tmp_path):
    """prepare -> estimate -> train-real, the full real-data track."""
    csv_dir = tmp_path / "sin_1_0_amp_300"
    csv_dir.mkdir()
    _write_synthetic_csvs(csv_dir, T=130)
    out_dir = tmp_path / "datas"
    env = dict(os.environ)
    env["KNODE_PLATFORM"] = "cpu"
    for cmd in (["prepare", str(csv_dir), "--out_dir", str(out_dir)],
                ["estimate", "sin_1_0_amp_300", "--data_dir", str(out_dir)]):
        r = subprocess.run([sys.executable, "-m", "knode_cosserat_tpu", *cmd],
                           capture_output=True, text=True, cwd=REPO, env=env,
                           timeout=500)
        assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, "-m", "knode_cosserat_tpu", "train-real",
         "--data", "sin_1_0_amp_300", "--data_dir", str(out_dir),
         "--epochs", "3", "--layers", "8", "--train_len", "20",
         "--save_path", str(tmp_path / "real_model")],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "real_model.npz").exists()
