"""Quaternion operations, broadcast-native (state on the last axis).

Replicates the reference's exact conventions:
  - quat -> rotation matrix (cosserat_ode.py:132-137, non-normalized form
    R = I + 2/(h.h) * [[...]]),
  - quaternion spatial derivative hs = 0.5 * Omega(u) h (cosserat_ode.py:160-165),
  - the custom quaternion->euler used by the training loss
    (Utils/transformations.py:3-31 — note its nonstandard axis convention,
    replicated bit-for-bit on purpose),
  - pairwise angular velocity between quaternions (estimate_state.py:95-103).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "quat_to_rotmat",
    "quat_spatial_derivative",
    "quaternion_to_euler",
    "pairwise_angular_velocity",
]


def quat_to_rotmat(h: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) [w,x,y,z] -> rotation matrix (..., 3, 3).

    Uses the same non-unit-safe formula as the reference
    (cosserat_ode.py:132-137): R = I + 2/(h.h) * M(h)."""
    h1, h2, h3, h4 = h[..., 0], h[..., 1], h[..., 2], h[..., 3]
    hh = jnp.sum(h * h, axis=-1)
    s = 2.0 / hh
    row0 = jnp.stack([1.0 + s * (-h3 ** 2 - h4 ** 2),
                      s * (h2 * h3 - h4 * h1),
                      s * (h2 * h4 + h3 * h1)], axis=-1)
    row1 = jnp.stack([s * (h2 * h3 + h4 * h1),
                      1.0 + s * (-h2 ** 2 - h4 ** 2),
                      s * (h3 * h4 - h2 * h1)], axis=-1)
    row2 = jnp.stack([s * (h2 * h4 - h3 * h1),
                      s * (h3 * h4 + h2 * h1),
                      1.0 + s * (-h2 ** 2 - h3 ** 2)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_spatial_derivative(u: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """hs = 0.5 * Omega(u) @ h, broadcast over leading axes
    (cosserat_ode.py:160-165). u: (...,3), h: (...,4) -> (...,4)."""
    u1, u2, u3 = u[..., 0], u[..., 1], u[..., 2]
    h1, h2, h3, h4 = h[..., 0], h[..., 1], h[..., 2], h[..., 3]
    return 0.5 * jnp.stack([
        -u1 * h2 - u2 * h3 - u3 * h4,
        u1 * h1 + u3 * h3 - u2 * h4,
        u2 * h1 - u3 * h2 + u1 * h4,
        u3 * h1 + u2 * h2 - u1 * h3,
    ], axis=-1)


def quaternion_to_euler(h: jnp.ndarray) -> jnp.ndarray:
    """The training-loss euler transform (Utils/transformations.py:3-31).

    Input (..., 4) [w,x,y,z]; output (..., 3). NOTE: this is the reference's
    own (nonstandard) convention — roll = atan2(2(wy+xz), 1-2(y^2+z^2)),
    pitch = asin(clip(2(wz-xy))), yaw = atan2(2(wx+yz), 1-2(x^2+z^2)) —
    kept identical so losses match."""
    norm = jnp.linalg.norm(h, axis=-1, keepdims=True)
    hn = h / norm
    w, x, y, z = hn[..., 0], hn[..., 1], hn[..., 2], hn[..., 3]
    roll = jnp.arctan2(2 * (w * y + x * z), 1 - 2 * (y ** 2 + z ** 2))
    pitch = jnp.arcsin(jnp.clip(2 * (w * z - x * y), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x ** 2 + z ** 2))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def pairwise_angular_velocity(q1: jnp.ndarray, q2: jnp.ndarray, dt) -> jnp.ndarray:
    """Angular velocity between quaternion pairs (estimate_state.py:95-103).
    q1, q2: (..., 4) [w,x,y,z] -> (..., 3)."""
    a0, a1, a2, a3 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    b0, b1, b2, b3 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return (2.0 / dt) * jnp.stack([
        a0 * b1 - a1 * b0 - a2 * b3 + a3 * b2,
        a0 * b2 + a1 * b3 - a2 * b0 - a3 * b1,
        a0 * b3 - a1 * b2 + a2 * b1 - a3 * b0,
    ], axis=-1)
