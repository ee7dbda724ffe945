"""Mocap preprocessing: orientation unflipping, time resampling, and
sparse-marker -> rod-grid interpolation.

Parity rewrite of reference preprocess.py:7-105 (the fit_curve copy that
also lived there is unified in realworld/curve.py). Host-side numpy/scipy.

Data model: a mapping (pandas DataFrame or dict of columns) with Vicon pose
columns '<link>.pose.position.{x,y,z}' and '<link>.pose.orientation.
{x,y,z,w}' for links [base, link0..link3], plus a 'Time' column.
"""
from __future__ import annotations


import numpy as np
from scipy.interpolate import CubicSpline
from scipy.spatial.transform import Rotation, Slerp

__all__ = ["LINKS", "MARKER_ARC_FRACTIONS", "position", "adj_pos",
           "guess_fix", "fix_orientations", "interpolate_posquat",
           "preprocessed"]

LINKS = ("base", "link0", "link1", "link2", "link3")
# marker positions along the rod as fractions of length (preprocess.py:45)
MARKER_ARC_FRACTIONS = (0.0, 3 / 9, 5 / 9, 7 / 9, 1.0)
BASE_MARKER_HEIGHT = 0.0635  # m above the rod anchor (preprocess.py:12)


def position(data, link: str) -> np.ndarray:
    """(3, T) positions for one link (preprocess.py:7-8)."""
    return np.array([data[f"{link}.pose.position.x"],
                     data[f"{link}.pose.position.y"],
                     data[f"{link}.pose.position.z"]])


def adj_pos(positions: np.ndarray) -> np.ndarray:
    """Base-relative positions with the base-marker height offset applied to
    all links except the anchored base (preprocess.py:10-14).
    positions: (n_links, 3)."""
    adjusted = positions.copy() - positions[0]
    adjusted[1:, 2] += BASE_MARKER_HEIGHT
    return adjusted


def guess_fix(rotation: Rotation) -> Rotation:
    """Snap a relative rotation to the nearest axes permutation if the
    rounded matrix is orthogonal; otherwise give up (preprocess.py:58-80)."""
    rfix = rotation.as_matrix().round(0)
    if np.array_equal(rfix @ rfix.T, np.eye(3)):
        return Rotation.from_matrix(rfix)
    return rotation


def fix_orientations(data, link: str) -> list:
    """Unflip mocap quaternions: snap the first rotation to the nearest axes
    permutation, then chain-fix successive rotations that jump >30 degrees
    (preprocess.py:82-105). Input quats are mocap [x,y,z,w]."""
    quat = np.array([data[f"{link}.pose.orientation.x"],
                     data[f"{link}.pose.orientation.y"],
                     data[f"{link}.pose.orientation.z"],
                     data[f"{link}.pose.orientation.w"]]).T
    rotations = [Rotation.from_quat(q) for q in quat]

    rfix = rotations[0].inv().as_matrix().round(0)
    if np.array_equal(rfix @ rfix.T, np.eye(3)):
        rotations[0] = rotations[0] * Rotation.from_matrix(rfix)

    rprev = rotations[0]
    for i in range(1, len(rotations)):
        rnext = rotations[i]
        if not rprev.approx_equal(rnext, atol=30, degrees=True):
            rnext = rnext * guess_fix(rnext.inv() * rprev)
            rotations[i] = rnext
        rprev = rnext
    return rotations


def interpolate_posquat(adjusted_positions: np.ndarray, quaternions,
                        N: int) -> np.ndarray:
    """One time step: 5 marker poses -> (7, N) rod grid via cubic spline +
    SLERP at the marker arc fractions (interpolate_posquat_ryan,
    preprocess.py:44-55). Output quats scalar-first."""
    s = list(MARKER_ARC_FRACTIONS)
    ts = np.linspace(0, 1, N)
    pos = CubicSpline(s, adjusted_positions)(ts).T       # (3, N)
    slerp = Slerp(s, Rotation.concatenate(quaternions))
    quat = np.vstack([r.as_quat(canonical=True, scalar_first=True)
                      for r in slerp(ts)]).T              # (4, N)
    return np.concatenate([pos, quat])


def preprocessed(merged, ts: np.ndarray | None = None, N: int = 10):
    """Full preprocessing of a merged mocap table (preprocess.py:16-42).

    With ``ts``: resample positions linearly and orientations by SLERP onto
    the grid, then interpolate each step onto N nodes. Returns
    (positions (T, n_links, 3), orientations, interpolated (T, 7, N)).
    """
    positions = np.stack([position(merged, link).T for link in LINKS])
    orientations = [fix_orientations(merged, link) for link in LINKS]

    if ts is None:
        interpolated = np.stack([
            interpolate_posquat(adj_pos(positions[:, t]),
                                [o[t] for o in orientations], N)
            for t in range(positions.shape[1])])
        return positions, orientations, interpolated

    time = np.asarray(merged["Time"])
    s_positions = np.stack([
        np.stack([np.interp(ts, time, q) for q in p.T]).T
        for p in positions])
    s_orientations = [Slerp(time, Rotation.concatenate(r))(ts)
                      for r in orientations]
    interpolated = np.stack([
        interpolate_posquat(adj_pos(s_positions[:, t]),
                            [o[t] for o in s_orientations], N)
        for t in range(len(ts))])
    f_positions = np.array([adj_pos(s_positions[:, t])
                            for t in range(len(ts))])
    return f_positions, s_orientations, interpolated
