"""Real-world pipeline tests: parity vs the reference oracle where possible,
round-trip checks against simulated ground truth otherwise."""
import sys

import numpy as np
import pandas as pd
import pytest
from scipy.spatial.transform import Rotation

from knode_cosserat_tpu import apply_mod, original_rod, calc_controls, simulate
from knode_cosserat_tpu.realworld import (
    estimate_state, fit_curve, fix_orientations, interpolate_posquat,
    interpolate_zoh, adj_pos, preprocessed, extract_tensions,
    merge_pose_topics, grams_to_newtons)

REF_RW = "/root/reference/knode_cosserat_realworld"


def _ref_module(name):
    if REF_RW not in sys.path:
        sys.path.insert(0, REF_RW)
    import importlib
    return importlib.import_module(name)


def _synthetic_pose_data(T=12):
    """Simulated rollout -> pose-only (T, 7, N) reference-layout data.

    Uses the paper-default rod (= reference ``CosseratRod()`` with no
    setup_robot call, matching the estimate_state __main__ oracle)."""
    from knode_cosserat_tpu import make_rod
    p = make_rod()
    ctl = calc_controls("sine", 0.05, float(p.del_t), T)
    traj = np.asarray(simulate(p, ctl, reference_layout=True))
    return p, ctl, traj[:, :7, :]


def test_estimate_state_parity_vs_reference():
    """Our vectorized estimator == the reference Python-loop estimator."""
    p, ctl, poses = _synthetic_pose_data(T=10)
    ours, vstar = estimate_state(poses, ctl, p)

    ref_est_mod = _ref_module("estimate_state")
    ref_ode = _ref_module("cosserat_ode")
    robot = ref_ode.CosseratRod()  # original defaults, like the ref __main__
    theirs = ref_est_mod.estimate_state(poses.copy(), ctl, robot)

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(vstar, robot.vstar, atol=1e-12)


def test_fit_curve_parity_vs_reference():
    rng = np.random.RandomState(0)
    T, n, N = 5, 5, 10
    loc = [0, 3.23, 5.13, 7.07, 9]
    poses = np.zeros((T, 7, n))
    poses[:, :3] = np.cumsum(rng.randn(T, 3, n) * 0.01, axis=-1)
    quat = rng.randn(T, 4, n)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    poses[:, 3:] = quat

    ours = fit_curve(poses, loc, N)
    ref_curve = _ref_module("interpolate_curve")
    theirs = ref_curve.fit_curve(poses, loc, N)
    np.testing.assert_allclose(ours, theirs, rtol=1e-8, atol=1e-10)


def test_estimate_state_recovers_simulated_velocities():
    """Sanity: velocities estimated from poses track the simulator's."""
    p, ctl, poses = _synthetic_pose_data(T=20)
    traj = np.asarray(simulate(p, ctl, reference_layout=True))
    est, _ = estimate_state(poses, ctl, p)
    # global-frame gradient vs solver local-frame q; compare magnitudes
    v_est = est[5:-5, 13:16, 5]
    v_sim = traj[5:-5, 13:16, 5]
    assert np.abs(v_est - v_sim).mean() < 0.05


def _mocap_frame(T=40, flip_at=20):
    """Synthetic mocap table with an axes-permutation flip mid-stream."""
    rng = np.random.RandomState(1)
    time = np.arange(T) * 0.01
    data = {"Time": time}
    base_rot = Rotation.from_euler(
        "z", np.linspace(0, 10, T)[:, None], degrees=True)
    for li, link in enumerate(["base", "link0", "link1", "link2", "link3"]):
        pos = np.stack([np.full(T, 0.01 * li), np.zeros(T),
                        np.full(T, 0.1 * li)], axis=1)
        rot = base_rot
        quat = rot.as_quat()
        # inject a 90-degree flip after flip_at
        flipped = (Rotation.from_quat(quat) *
                   Rotation.from_matrix(np.array([[0, 1, 0], [-1, 0, 0],
                                                  [0, 0, 1]], float)))
        quat_out = quat.copy()
        quat_out[flip_at:] = flipped.as_quat()[flip_at:]
        for k, axis in enumerate("xyzw"):
            data[f"{link}.pose.orientation.{axis}"] = quat_out[:, k]
        for k, axis in enumerate("xyz"):
            data[f"{link}.pose.position.{axis}"] = pos[:, k]
    return pd.DataFrame(data)


def test_fix_orientations_parity_vs_reference():
    df = _mocap_frame()
    ours = fix_orientations(df, "link1")
    ref_pre = _ref_module("preprocess")
    theirs = ref_pre.fix_orientations(df, "link1")
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a.as_matrix(), b.as_matrix(), atol=1e-10)
    # flip actually removed: successive rotations stay within 30 degrees
    for a, b in zip(ours[:-1], ours[1:]):
        assert (a.inv() * b).magnitude() < np.pi / 6


def test_preprocessed_parity_vs_reference():
    df = _mocap_frame()
    ts = np.arange(0.0, 0.35, 0.05)
    ours_pos, _, ours_interp = preprocessed(df, ts)
    ref_pre = _ref_module("preprocess")
    ref_pos, _, ref_interp = ref_pre.preprocessed(df, ts)
    np.testing.assert_allclose(ours_pos, ref_pos, atol=1e-10)
    np.testing.assert_allclose(ours_interp, ref_interp, atol=1e-10)


def test_interpolate_zoh():
    ot = np.array([0.0, 1.0, 2.0])
    ov = np.array([10.0, 20.0, 30.0])
    nt = np.array([-0.5, 0.0, 0.5, 1.0, 1.7, 2.5])
    out = interpolate_zoh(nt, ot, ov)
    np.testing.assert_array_equal(out, [10, 10, 10, 20, 20, 30])


def test_extract_tensions_channel_order():
    """The QuaternionStamped carries tensions as [y,z,w,x] and commands
    reorder [1,2,3,0] (prepare.py:237-251)."""
    idx = np.array([0.0, 1.0])
    tension = pd.DataFrame({
        "tension.quaternion.x": [4.0, 4.0],
        "tension.quaternion.y": [1.0, 1.0],
        "tension.quaternion.z": [2.0, 2.0],
        "tension.quaternion.w": [3.0, 3.0]}, index=idx)
    rosout = pd.DataFrame({"msg": ["Serial Command: 500 600 700 800"] * 2},
                          index=idx)
    ts = np.array([0.5])
    meas, cmd = extract_tensions(tension, rosout, ts)
    np.testing.assert_allclose(meas[0], grams_to_newtons([1, 2, 3, 4]))
    np.testing.assert_allclose(cmd[0], grams_to_newtons([600, 700, 800, 500]))


def test_merge_pose_topics_ffill():
    t1 = pd.DataFrame({"pose.position.x": [1.0, 2.0]},
                      index=pd.Index([0.0, 1.0], name="Time"))
    frames = {}
    for i, name in enumerate(["base", "link0", "link1", "link2", "link3"]):
        shift = 0.1 * i
        frames[name] = pd.DataFrame(
            {"pose.position.x": [1.0 + i, 2.0 + i]},
            index=pd.Index([0.0 + shift, 1.0 + shift], name="Time"))
    merged = merge_pose_topics(frames)
    assert "base.pose.position.x" in merged
    assert not merged.isnull().any().any()
    assert merged.Time.iloc[0] >= 0.4  # first complete row
