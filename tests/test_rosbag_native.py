"""Pure-Python rosbag v2.0 I/O: round-trip, ingestion parity with the CSV
path, and CLI `prepare` on a genuine binary .bag — closing the reference's
bag-ingestion chain (prepare.py:173-297) without bagpy/ROS installed."""
import numpy as np
import pandas as pd
import pytest

from knode_cosserat_tpu.realworld.bag import read_bag, read_topic_csvs
from knode_cosserat_tpu.realworld.rosbag_io import (BagReader, BagWriter,
                                                    read_bag_native)

from test_realworld_e2e import _write_synthetic_csvs

POSE_TOPICS = {
    "base": "/vicon/continuum_base/pose",
    "link0": "/vicon/continuum_0/pose",
    "link1": "/vicon/continuum_1/pose",
    "link2": "/vicon/continuum_2/pose",
    "link3": "/vicon/continuum_3/pose",
}


def test_bag_roundtrip(tmp_path):
    path = str(tmp_path / "rt.bag")
    with BagWriter(path) as w:
        for i in range(5):
            t = 10.0 + 0.1 * i
            w.write_pose("/vicon/continuum_base/pose", t,
                         [0.1 * i, -0.2, 0.3], [0.0, 0.0, 0.0, 1.0])
            w.write_quaternion("/tension", t, [800.0 + i, 900.0, 1000.0,
                                               1100.0])
            w.write_log(t, f"Serial Command: {800 + i} 900 1000 1100")

    # file magic + spec-required padded bag header
    raw = open(path, "rb").read()
    assert raw.startswith(b"#ROSBAG V2.0\n")

    tables = read_bag_native(path)
    assert set(tables) == {"/vicon/continuum_base/pose", "/tension",
                           "/rosout"}
    pose = tables["/vicon/continuum_base/pose"]
    np.testing.assert_allclose(pose["pose.position.x"], 0.1 * np.arange(5))
    np.testing.assert_allclose(pose["Time"], 10.0 + 0.1 * np.arange(5),
                               atol=1e-9)
    ten = tables["/tension"]
    np.testing.assert_allclose(ten["quaternion.x"], 800.0 + np.arange(5))
    logs = tables["/rosout"]
    assert logs["msg"].iloc[2] == "Serial Command: 802 900 1000 1100"

    reader = BagReader(path)
    assert reader.message_type("/tension") == \
        "geometry_msgs/QuaternionStamped"


def _csvs_to_bag(csv_dir, bag_path):
    """Re-encode a bagpy-style CSV directory as a genuine binary .bag."""
    with BagWriter(str(bag_path)) as w:
        for name, topic in POSE_TOPICS.items():
            fn = topic.strip("/").replace("/", "-") + ".csv"
            df = pd.read_csv(csv_dir / fn)
            for _, r in df.iterrows():
                w.write_pose(topic, r["Time"],
                             [r["pose.position.x"], r["pose.position.y"],
                              r["pose.position.z"]],
                             [r["pose.orientation.x"],
                              r["pose.orientation.y"],
                              r["pose.orientation.z"],
                              r["pose.orientation.w"]])
        ten = pd.read_csv(csv_dir / "tension.csv")
        for _, r in ten.iterrows():
            w.write_quaternion("/tension", r["Time"],
                               [r["quaternion.x"], r["quaternion.y"],
                                r["quaternion.z"], r["quaternion.w"]])
        logs = pd.read_csv(csv_dir / "rosout.csv")
        for _, r in logs.iterrows():
            w.write_log(r["Time"], r["msg"])


def test_read_bag_matches_csv_ingestion(tmp_path):
    csv_dir = tmp_path / "exp"
    csv_dir.mkdir()
    p, controls, traj = _write_synthetic_csvs(csv_dir, T=20)
    bag_path = tmp_path / "exp.bag"
    _csvs_to_bag(csv_dir, bag_path)

    # bagpy must be absent in this environment -> native reader path
    with pytest.raises(ImportError):
        import bagpy  # noqa: F401

    from_csv = read_topic_csvs(str(csv_dir), float(p.del_t), "exp")
    from_bag = read_bag(str(bag_path), float(p.del_t))

    np.testing.assert_allclose(from_bag["t"], from_csv["t"], atol=1e-12)
    np.testing.assert_allclose(from_bag["controls"], from_csv["controls"],
                               atol=1e-9)
    np.testing.assert_allclose(from_bag["interpolated"],
                               from_csv["interpolated"], atol=1e-9)
    for a, b in zip(from_bag["positions"], from_csv["positions"]):
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_sil_records_genuine_bag(tmp_path):
    """The full software-in-the-loop hardware chain recorded as a genuine
    rosbag — teleop -> C++ firmware PID -> plant -> `rosbag record` format
    -> read_bag ingestion (reference chain SURVEY.md section 3.5)."""
    from knode_cosserat_tpu import apply_mod
    from knode_cosserat_tpu.hw import JoyState, export_bag, \
        run_sil_experiment

    joy_step = JoyState(axes=(0, 0, 1.0, 0, 0, 0.0),
                        buttons=(0, 1, 0, 0, 0, 0))
    # non-commensurate firmware period: real telemetry never ties exactly
    # with the solver grid (phase-locked ties make ZOH knife-edge at the
    # float/nanosecond level, which is an artifact, not a behavior)
    vs = run_sil_experiment(joy_step, settle=0.3, tail=1.0, dt=0.0021)
    bag_path = str(tmp_path / "sil_step.bag")
    truth = export_bag(vs, bag_path)

    p = apply_mod(None)
    data = read_bag(bag_path, float(p.del_t))
    n = min(len(data["controls"]), len(truth["controls"]))
    assert n > 5
    # Bag round-trip is lossless: ingested tensions equal ZOH of the
    # recorded telemetry on the ingestion's own grid, exactly. (Comparing
    # against `truth` elementwise is knife-edge: its ZOH grid starts at the
    # first telemetry time, not the trimmed origin, and grid points tie
    # with telemetry sample times to float rounding.)
    from knode_cosserat_tpu.realworld.bag import (grams_to_newtons,
                                                  interpolate_zoh)
    tel_t = np.array([t for t, _, _ in vs.telemetry_log])
    tel_g = np.array([r for _, r, _ in vs.telemetry_log])
    rel_t = tel_t - truth["ts"][0]
    exp = np.stack([
        grams_to_newtons(interpolate_zoh(data["t"], rel_t, tel_g[:, i]))
        for i in range(4)], axis=1)
    np.testing.assert_allclose(data["controls"], exp[:len(data["controls"])],
                               atol=1e-9)
    # ingested mocap tracks the ground-truth rollout
    interp = data["interpolated"]
    m = min(len(interp), len(truth["traj"]))
    tip_err = np.abs(interp[:m, :3, 9] - truth["traj"][:m, :3, 9]).max()
    assert tip_err < 5e-3, tip_err


def test_checked_in_bag_fixture_ingests():
    """The checked-in binary .bag fixture (scripts/gen_sil_fixture.py)
    parses and yields a full ingestion dict."""
    import os
    from knode_cosserat_tpu import apply_mod
    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "sil_step_1100.bag")
    p = apply_mod(None)
    data = read_bag(fix, float(p.del_t))
    assert len(data["t"]) > 50
    assert data["controls"].shape[1] == 4
    assert np.isfinite(data["interpolated"]).all()
    # step experiment: T2/T3 rise toward the 1100 g setpoint (~10.8 N)
    assert data["controls"][-1, 1] > 9.0


def test_cli_prepare_on_binary_bag(tmp_path, capsys):
    csv_dir = tmp_path / "exp3"
    csv_dir.mkdir()
    _write_synthetic_csvs(csv_dir, T=12)
    bag_path = tmp_path / "exp3.bag"
    _csvs_to_bag(csv_dir, bag_path)

    from knode_cosserat_tpu.cli import main
    out_dir = tmp_path / "datas"
    main(["prepare", str(bag_path), "--out_dir", str(out_dir)])
    captured = capsys.readouterr().out
    assert "DTW Distance XYZ" in captured
    data = np.load(out_dir / "exp3.bag.npz")
    assert data["traj"].shape[2] == 50 and np.isfinite(data["traj"]).all()


def test_time_encoding_edge_cases(tmp_path):
    """Negative stamps rejected with a clear error; nanosecond rounding
    carries into seconds (no spec-invalid nsecs == 1e9)."""
    import struct

    from knode_cosserat_tpu.realworld.rosbag_io import (_time_bytes,
                                                        _time_from)
    with pytest.raises(ValueError, match="unsigned"):
        _time_bytes(-0.5)
    secs, nsecs = struct.unpack("<LL", _time_bytes(1.9999999999))
    assert (secs, nsecs) == (2, 0)
    assert abs(_time_from(_time_bytes(123.456789)) - 123.456789) < 1e-9

    w = BagWriter(str(tmp_path / "neg.bag"))
    with pytest.raises(ValueError):
        w.write_pose("/vicon/continuum_base/pose", -1.0,
                     [0, 0, 0], [0, 0, 0, 1])
