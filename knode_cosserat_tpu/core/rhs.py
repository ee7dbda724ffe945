"""The semi-discretized Cosserat-rod right-hand side.

One broadcast-native, differentiable function replaces the reference's three
copies of the physics (numpy ``ODE`` cosserat_ode.py:114-186, torch scalar
``ODE`` cosserat_ode_torch.py:137-214, torch batched ``ODE_parallel``
cosserat_ode_torch.py:217-322). All inputs carry the state on the LAST axis,
so the same code runs per-node, per-rod, or over arbitrary batch axes — XLA
vectorizes it onto the VPU, and the optional MLP residual's matmuls land on
the MXU.

State layout: y (..., 19) = [p, h, n, m, q, w]; z (..., 6) = [v, u].
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
from jax import lax

from ..ops.quaternion import quat_to_rotmat, quat_spatial_derivative
from .params import RodParams

__all__ = ["rhs", "nn_input_features"]

# The physics matvecs are 3-wide contractions of O(1e5) stiffness entries
# against O(1) states. TPU's DEFAULT matmul precision runs f32 einsums as
# single bf16 MXU passes (8-bit mantissa) — measured 1.4e-4 m tip RMSE over
# 30 BDF-2 steps vs 2.7e-8 m at HIGHEST. These ops are tiny (the MXU is
# idle either way), so the physics always uses full f32 accumulation; the
# KNODE MLP's large matmuls keep the fast default.
_PHYS_PRECISION = lax.Precision.HIGHEST


def _mv(M: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(3,3) constant matrix times (..., 3) vectors."""
    return jnp.einsum("ij,...j->...i", M, x, precision=_PHYS_PRECISION)


def _rot(R: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotations times (..., 3) vectors."""
    return jnp.einsum("...ij,...j->...i", R, x, precision=_PHYS_PRECISION)


def _rot_t(R: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """R^T @ x with R (..., 3, 3), x (..., 3)."""
    return jnp.einsum("...ji,...j->...i", R, x, precision=_PHYS_PRECISION)


def nn_input_features(y, yh, z, zh, tendon_forces, history: bool):
    """Assemble the KNODE MLP input (cosserat_ode.py:171-175):
    28 = [y(19), z(6), tf(3)] or 53 = [y, yh, z, zh, tf] with history."""
    tf = jnp.broadcast_to(tendon_forces, y.shape[:-1] + (3,))
    if history:
        return jnp.concatenate([y, yh, z, zh, tf], axis=-1)
    return jnp.concatenate([y, z, tf], axis=-1)


def rhs(
    p: RodParams,
    y: jnp.ndarray,
    yh: jnp.ndarray,
    zh: jnp.ndarray,
    tendon_forces: jnp.ndarray,
    nn_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    nn_history: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the spatial RHS ``ys = dy/ds`` and the strain state ``z``.

    Mirrors reference cosserat_ode.py:114-186 step-for-step:
      quat->R; constitutive solve for (v, u); BDF-2 time derivatives
      yt = c0*y + yh; body force (gravity + square-law drag + tendons);
      rod derivatives; quaternion derivative; optional MLP residual added to
      both ys and z.

    Args:
      y/yh: (..., 19); zh: (..., 6); tendon_forces: (3,) or (..., 3).
      nn_fn: optional callable mapping (..., 28|53) -> (..., 25), the KNODE
        residual (weights already bound).
    Returns:
      (ys, z): (..., 19), (..., 6).
    """
    h = y[..., 3:7]
    n = y[..., 7:10]
    m = y[..., 10:13]
    q = y[..., 13:16]
    w = y[..., 16:19]
    vh = zh[..., 0:3]
    uh = zh[..., 3:6]

    R = quat_to_rotmat(h)

    # Solved constitutive law (cosserat_ode.py:139-142). Reformulated as
    # v = Kinv @ (R^T n - Bse vh) + v_rest with v_rest precomputed in f64
    # (see params.derive) so the f32 TPU path keeps full precision on the
    # O(1) deflection despite O(1e5) stiffness entries.
    v = _mv(p.Kse_c0Bse_inv, _rot_t(R, n) - _mv(p.Bse, vh)) + p.v_rest
    u = _mv(p.Kbt_c0Bbt_inv, _rot_t(R, m) - _mv(p.Bbt, uh))
    z = jnp.concatenate([v, u], axis=-1)

    # BDF-2 time derivatives (cosserat_ode.py:145-148)
    yt = p.c0 * y + yh
    zt = p.c0 * z + zh
    vt, ut = zt[..., 0:3], zt[..., 3:6]
    qt, wt = yt[..., 13:16], yt[..., 16:19]

    # Weight + square-law drag + tendon body force (cosserat_ode.py:150-151)
    f = p.rhoAg - _rot(R, p.C * q * jnp.abs(q)) + tendon_forces

    # Rod state derivatives (cosserat_ode.py:153-158)
    ps = _rot(R, v)
    ns = p.rhoA * _rot(R, jnp.cross(w, q) + qt) - f
    ms = _rot(R, jnp.cross(w, _mv(p.rhoJ, w)) + _mv(p.rhoJ, wt)) - jnp.cross(ps, n)
    qs = vt - jnp.cross(u, q) + jnp.cross(w, v)
    ws = ut - jnp.cross(u, w)

    hs = quat_spatial_derivative(u, h)

    ys = jnp.concatenate([ps, hs, ns, ms, qs, ws], axis=-1)

    if nn_fn is not None:
        feats = nn_input_features(y, yh, z, zh, tendon_forces, nn_history)
        out = nn_fn(feats)
        ys = ys + out[..., :19]
        z = z + out[..., 19:]

    return ys, z
