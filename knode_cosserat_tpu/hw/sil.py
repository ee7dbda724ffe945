"""Full software-in-the-loop closure of the reference hardware loop
(SURVEY.md section 3.5) — entirely in software:

  joystick pattern -> TeleopNode -> serial protocol -> C++ firmware PID ->
  simulated winch plant -> CSV telemetry -> bagpy-format topic CSVs ->
  realworld ingestion (prepare) -> state estimation -> KNODE training.

The "Vicon" topics come from the Cosserat simulator itself: the tensions
the PID loop actually achieved (telemetry readings, grams) are ZOH-resampled
onto the solver grid and drive a rod rollout whose marker poses are exported
exactly as a real mocap capture would be (5 markers at the arc fractions,
base-height offset un-applied, mocap [x,y,z,w] quaternions) — the inverse
of realworld/preprocess.py's adjustments.

Reference chain being closed: motor_joy_teleop (teleop) -> firmware.ino
(PID) -> rosbag record -> prepare.py:173-297 -> estimate_state.py ->
train_segment.py.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from .bridge import SimulatedWinchPlant
from .teleop import JoyState, TeleopNode, VirtualFirmwareSerial

__all__ = ["run_sil_experiment", "export_csv_bundle", "export_bag",
           "sil_pipeline"]

MARKER_NODES = (0, 3, 5, 7, 9)
LINK_TOPICS = ("vicon-continuum_base-pose", "vicon-continuum_0-pose",
               "vicon-continuum_1-pose", "vicon-continuum_2-pose",
               "vicon-continuum_3-pose")
BASE_MARKER_HEIGHT = 0.0635        # preprocess.py:12


def run_sil_experiment(joy: JoyState, settle: float = 1.0,
                       tail: float = 1.0, dt: float = 0.002,
                       plant: Optional[SimulatedWinchPlant] = None,
                       log=lambda *_: None) -> VirtualFirmwareSerial:
    """Drive one joystick experiment through the teleop node against the
    virtual firmware; returns the VirtualFirmwareSerial holding the
    telemetry and command logs.

    The node's sleeps advance the firmware clock (sleep_fn pumps the
    plant), so the run is deterministic and faster than real time.
    """
    vs = VirtualFirmwareSerial(plant=plant, dt=dt)
    node = TeleopNode(vs, log=log, sleep_fn=vs.pump_for, start_reader=False)
    vs.pump_for(settle)            # tare/settle time before the experiment
    node.get_joy(joy)              # experiment generators send in-callback
    node.run_once()                # step/direct commands send on change
    vs.pump_for(tail)
    return vs


def collect_topic_frames(vs: VirtualFirmwareSerial, rod=None):
    """Assemble the run's recorded topics as bagpy-style flattened-column
    DataFrames (keyed by filename-style topic), plus the ground-truth
    rollout driven by the PID loop's ACHIEVED tensions.

    Returns (frames, {controls (T,4) N, traj (T,50,N), ts}).
    """
    import pandas as pd
    from ..core.params import apply_mod
    from ..core.stepper import simulate
    from ..realworld.bag import interpolate_zoh

    if rod is None:
        rod = apply_mod(None)

    tel_t = np.array([t for t, _, _ in vs.telemetry_log])
    tel_g = np.array([r for _, r, _ in vs.telemetry_log])    # grams
    tel_pwm = np.array([p for _, _, p in vs.telemetry_log])

    # solver-grid controls from ACHIEVED tensions (grams -> N)
    del_t = float(rod.del_t)
    ts = np.arange(tel_t[0], tel_t[-1], del_t)
    grams = np.stack([interpolate_zoh(ts, tel_t, tel_g[:, i])
                      for i in range(4)], axis=1)
    controls = grams / 1000.0 * 9.81
    traj = np.asarray(simulate(rod, controls, reference_layout=True))

    frames = {}
    # --- mocap topics from the rollout (inverse of preprocess.adj_pos) ---
    links_ts = ts - ts[0]
    for topic, node in zip(LINK_TOPICS, MARKER_NODES):
        pos = traj[:, :3, node].copy()
        if node != 0:
            pos[:, 2] -= BASE_MARKER_HEIGHT
        quat_sf = traj[:, 3:7, node]
        quat_xyzw = quat_sf[:, [1, 2, 3, 0]]
        frames[topic] = pd.DataFrame({
            "Time": links_ts,
            "pose.position.x": pos[:, 0],
            "pose.position.y": pos[:, 1],
            "pose.position.z": pos[:, 2],
            "pose.orientation.x": quat_xyzw[:, 0],
            "pose.orientation.y": quat_xyzw[:, 1],
            "pose.orientation.z": quat_xyzw[:, 2],
            "pose.orientation.w": quat_xyzw[:, 3],
        })

    # --- /tension, /pwm: QuaternionStamped channel quirk [y,z,w,x] ------
    for name, vals in (("tension", tel_g), ("pwm", tel_pwm)):
        frames[name] = pd.DataFrame({
            "Time": tel_t - ts[0],
            "quaternion.x": vals[:, 3],
            "quaternion.y": vals[:, 0],
            "quaternion.z": vals[:, 1],
            "quaternion.w": vals[:, 2],
        })

    # --- /rosout command log (motor_joy_teleop:146 format) --------------
    frames["rosout"] = pd.DataFrame({
        "Time": [t - ts[0] for t, _ in vs.command_log],
        "msg": [f"Serial Command: {cmd}" for _, cmd in vs.command_log],
    })
    return frames, {"controls": controls, "traj": traj, "ts": ts}


def export_csv_bundle(vs: VirtualFirmwareSerial, out_dir: str,
                      rod=None) -> dict:
    """Write the run as a bagpy-style per-topic CSV bundle readable by
    realworld.bag.read_topic_csvs.

    The rod rollout driven by the achieved tensions provides the mocap
    topics. Returns {controls (T,4) N, traj (T,50,N)} of that rollout.
    """
    frames, truth = collect_topic_frames(vs, rod=rod)
    os.makedirs(out_dir, exist_ok=True)
    for topic, df in frames.items():
        df.to_csv(os.path.join(out_dir, topic + ".csv"), index=False)
    return truth


def export_bag(vs: VirtualFirmwareSerial, path: str, rod=None) -> dict:
    """Record the run as a genuine rosbag v2.0 file — the exact artifact a
    real `rosbag record` session produces in the reference workflow
    (SURVEY.md section 3.5) — readable by realworld.bag.read_bag (and by
    standard ROS tooling). Returns the ground-truth rollout dict."""
    from ..realworld.rosbag_io import BagWriter

    frames, truth = collect_topic_frames(vs, rod=rod)
    ros_topic = {t: "/" + t.replace("-pose", "/pose").replace("-", "/")
                 for t in LINK_TOPICS}
    with BagWriter(path) as w:
        for topic, df in frames.items():
            if topic in ros_topic:
                for _, r in df.iterrows():
                    w.write_pose(ros_topic[topic], r["Time"],
                                 [r["pose.position.x"], r["pose.position.y"],
                                  r["pose.position.z"]],
                                 [r["pose.orientation.x"],
                                  r["pose.orientation.y"],
                                  r["pose.orientation.z"],
                                  r["pose.orientation.w"]])
            elif topic in ("tension", "pwm"):
                for _, r in df.iterrows():
                    w.write_quaternion("/" + topic, r["Time"],
                                       [r["quaternion.x"], r["quaternion.y"],
                                        r["quaternion.z"],
                                        r["quaternion.w"]])
            elif topic == "rosout":
                for _, r in df.iterrows():
                    w.write_log(r["Time"], r["msg"])
    return truth


def sil_pipeline(joy: JoyState, out_dir: str, settle: float = 1.0,
                 tail: float = 1.0, rod=None, log=lambda *_: None) -> dict:
    """One call: teleop experiment -> firmware/plant -> CSV bundle ->
    realworld ingestion. Returns the ingested data dict (read_topic_csvs
    output) plus the ground-truth rollout under "sil_truth"."""
    from ..core.params import apply_mod
    from ..realworld.bag import read_topic_csvs

    if rod is None:
        rod = apply_mod(None)
    vs = run_sil_experiment(joy, settle=settle, tail=tail, log=log)
    truth = export_csv_bundle(vs, out_dir, rod=rod)
    data = read_topic_csvs(out_dir, float(rod.del_t), out_dir)
    data["sil_truth"] = truth
    return data
