"""Teacher-forced one-step KNODE training loss.

Vectorized parity implementation of the reference's `--fast` training path
(physics_train.py:306-376 driving parallelGetNextSegmentEuler,
cosserat_ode_torch.py:401-437), which itself reproduces the slow path
(physics_train.py:209-304) at different keypoints. The entire
(trajectory x timestep x keypoint) batch is one broadcast RHS evaluation —
the MLP matmul sees a [T*K(*n_traj), hidden] problem on the MXU.

Loss per timestep (physics_train.py:345-352), summed over timesteps and
trajectories then divided by (batch_len - 1):
  MSE(pos[kp])  +  MSE(states 7:19 [kp])
  + MSE(euler(quat[kp]))  +  MSE(z[kp-1])
where euler is the reference's custom quaternion_to_euler and the z targets
use keypoint index kp-1 (the node where the RHS actually produced z —
physics_train.py:351-352).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.params import RodParams
from ..core.spatial import next_segment_euler
from ..models.mlp import MLPSpec, mlp_apply
from ..ops.quaternion import quaternion_to_euler

__all__ = ["teacher_forced_loss", "teacher_forced_residuals",
            "grow_predictions",
            "DEFAULT_KEYPOINTS_FAST", "DEFAULT_KEYPOINTS_SLOW",
            "DEFAULT_KEYPOINTS_REAL"]

# keypoint sets used by the reference trainers
DEFAULT_KEYPOINTS_FAST = (3, 5, 7, 9)   # physics_train.py:328
DEFAULT_KEYPOINTS_SLOW = (2, 6, 9)      # physics_train.py:250
DEFAULT_KEYPOINTS_REAL = (1, 3, 6, 9)   # train_segment.py:172


def grow_predictions(
    p: RodParams,
    spec: MLPSpec,
    nn_params,
    traj: jnp.ndarray,
    controls: jnp.ndarray,
    keypoints: Sequence[int],
    fused_fn=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher-forced next-state predictions at the keypoints.

    Args:
      traj: (T, N, 25) state-last ground truth ([y(19), z(6)]).
      controls: (T, 4) tendon tensions.
    Returns:
      (y_grown, z_new): (T-1, K, 19), (T-1, K, 6) predictions for steps
      1..T-1 evaluated at nodes keypoints-1.
    """
    kp = jnp.asarray(keypoints)
    ys = traj[:-1, :, :19]
    zs = traj[:-1, :, 19:]
    # first step uses itself as prev (physics_train.py:321-322)
    y_prev = jnp.concatenate([ys[:1], ys[:-1]], axis=0)
    z_prev = jnp.concatenate([zs[:1], zs[:-1]], axis=0)
    yh = p.c1 * ys + p.c2 * y_prev    # (T-1, N, 19)
    zh = p.c1 * zs + p.c2 * z_prev

    G = traj[1:]                       # truth next state (T-1, N, 25)
    y_in = G[:, kp - 1, :19]           # (T-1, K, 19)
    yh_in = yh[:, kp - 1]
    zh_in = zh[:, kp - 1]
    tf = jnp.einsum("tk,kc->tc", controls[:-1],
                    jnp.asarray(p.tendon_dirs, controls.dtype),
                    precision=jax.lax.Precision.HIGHEST)  # (T-1, 3)

    if fused_fn is not None:
        # fused Pallas path: flatten (T-1, K) into one batch for the kernel
        Tm1, K = y_in.shape[0], y_in.shape[1]
        flat = lambda a: a.reshape((Tm1 * K,) + a.shape[2:])
        tf_b = jnp.broadcast_to(tf[:, None, :], (Tm1, K, 3))
        yg, zn = fused_fn(nn_params, flat(y_in), flat(yh_in), flat(zh_in),
                          flat(tf_b))
        return (yg.reshape(Tm1, K, 19), zn.reshape(Tm1, K, 6))

    nn_fn = None
    if nn_params is not None:
        nn_fn = lambda x: mlp_apply(spec, nn_params, x)
    return next_segment_euler(p, y_in, yh_in, zh_in, tf,
                              nn_fn=nn_fn, nn_history=spec.history)


def teacher_forced_loss(
    p: RodParams,
    spec: MLPSpec,
    nn_params,
    traj: jnp.ndarray,
    controls: jnp.ndarray,
    keypoints: Sequence[int] = DEFAULT_KEYPOINTS_FAST,
    fused_fn=None,
    skip_first: bool = False,
) -> jnp.ndarray:
    """Scalar loss for one trajectory; vmap over a leading trajectory axis
    and sum for the multi-trajectory total (physics_train.py:313-366).

    fused_fn: optional Pallas fused RHS (ops.pallas_rhs.
    make_fused_next_segment) used in place of the XLA path.
    skip_first: drop the first transition from the loss. The first step's
    BDF-2 history uses the frame as its own predecessor (the reference
    quirk, physics_train.py:321-322) — exact when traj[0] is the at-rest
    initial state (offline training), fabricated when the trajectory is a
    sliding window starting mid-motion (online adaptation)."""
    if skip_first and traj.shape[0] < 3:
        # slicing off the first transition of a 2-frame trajectory leaves
        # ZERO residuals and jnp.mean would silently return NaN
        raise ValueError(
            f"teacher_forced_loss(skip_first=True) needs >= 3 frames, got "
            f"traj of length {traj.shape[0]} (after any trimming)")
    kp = jnp.asarray(keypoints)
    y_grown, z_new = grow_predictions(p, spec, nn_params, traj, controls,
                                      keypoints, fused_fn=fused_fn)
    target = traj[1:]                       # (T-1, N, 25)
    if skip_first:
        y_grown, z_new, target = y_grown[1:], z_new[1:], target[1:]
    tgt_y = target[:, kp, :19]              # (T-1, K, 19)
    tgt_z = target[:, kp - 1, 19:]          # (T-1, K, 6) — kp-1 indexing

    mse = lambda a, b: jnp.mean((a - b) ** 2)
    loss = (mse(y_grown[..., 0:3], tgt_y[..., 0:3])
            + mse(y_grown[..., 7:19], tgt_y[..., 7:19])
            + mse(quaternion_to_euler(y_grown[..., 3:7]),
                  quaternion_to_euler(tgt_y[..., 3:7]))
            + mse(z_new, tgt_z))
    # reference sums per-step means then divides by (batch_len-1); with
    # equal-sized steps that's exactly the mean over steps, already taken
    # by mse() above — so `loss` is directly comparable.
    return loss


def teacher_forced_residuals(
    p: RodParams,
    spec: MLPSpec,
    nn_params,
    traj: jnp.ndarray,
    controls: jnp.ndarray,
    keypoints: Sequence[int] = DEFAULT_KEYPOINTS_FAST,
    skip_first: bool = False,
) -> jnp.ndarray:
    """Flat residual vector r with sum(r**2) == teacher_forced_loss.

    The loss is four equally-weighted MSE groups (positions, internal
    states 7:19, Euler angles, strains); scaling each group's raw
    residuals by 1/sqrt(n_group) makes the plain square-sum reproduce it
    exactly. This is the r whose Jacobian feeds the Gauss-Newton /
    Fisher path of training/sysid.identifiability — small Fisher
    eigenvalues are sigma_min(J)^2, resolvable in f32 where a direct
    f32 Hessian is pure rounding noise (ops/dd.py module docstring).
    """
    if skip_first and traj.shape[0] < 3:
        raise ValueError(
            f"teacher_forced_residuals(skip_first=True) needs >= 3 "
            f"frames, got traj of length {traj.shape[0]}")
    kp = jnp.asarray(keypoints)
    y_grown, z_new = grow_predictions(p, spec, nn_params, traj, controls,
                                      keypoints)
    target = traj[1:]
    if skip_first:
        y_grown, z_new, target = y_grown[1:], z_new[1:], target[1:]
    tgt_y = target[:, kp, :19]
    tgt_z = target[:, kp - 1, 19:]

    def group(a, b):
        d = (a - b).reshape(-1)
        return d / jnp.sqrt(jnp.asarray(d.shape[0], d.dtype))

    return jnp.concatenate([
        group(y_grown[..., 0:3], tgt_y[..., 0:3]),
        group(y_grown[..., 7:19], tgt_y[..., 7:19]),
        group(quaternion_to_euler(y_grown[..., 3:7]),
              quaternion_to_euler(tgt_y[..., 3:7])),
        group(z_new, tgt_z),
    ])
