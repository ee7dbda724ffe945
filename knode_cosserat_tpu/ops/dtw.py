"""Exact DTW on device: anti-diagonal wavefront scan.

The reference computes DTW on host per evaluation rollout
(fastdtw(pred_tip, ref_tip), physics_train.py:156-161), which serializes
the eval sweep. The DP recurrence

    S[i, j] = C[i, j] + min(S[i-1, j], S[i, j-1], S[i-1, j-1])

is sequential in (i, j) but every cell on an anti-diagonal i + j = k
depends only on diagonals k-1 and k-2 — so the whole matrix reduces to an
(n + m - 1)-step ``lax.scan`` over vectorized diagonal updates. This is
jit/vmap-compatible: a 40-cell experiment grid evaluates its DTW metric as
ONE program alongside the batched rollouts, instead of 40 host round-trips.

Distance parity: matches evaluation.metrics.dtw (exact DTW; the 1-norm
point distance is the fastdtw-package default the reference inherits).
Returns the distance only — the alignment path is a host-side concern
(evaluation.metrics.dtw returns it when needed).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["dtw_device", "batch_dtw_device", "tip_dtw_device"]


@partial(jax.jit, static_argnames="dist_ord")
def dtw_device(x: jnp.ndarray, y: jnp.ndarray, dist_ord: int = 1):
    """Exact DTW distance between x (n, d) and y (m, d) on device.

    dist_ord: 1 (manhattan, fastdtw-package default — see
    evaluation.metrics module docstring) or 2 (euclidean).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if x.ndim == 1:
        x = x[:, None]
    if y.ndim == 1:
        y = y[:, None]
    n, m = x.shape[0], y.shape[0]

    diff = x[:, None, :] - y[None, :, :]
    if dist_ord == 1:
        C = jnp.sum(jnp.abs(diff), axis=-1)
    elif dist_ord == 2:
        C = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    else:
        raise ValueError(f"dist_ord must be 1 or 2, got {dist_ord}")

    inf = jnp.asarray(jnp.inf, C.dtype)
    iarr = jnp.arange(n)

    def shift(v):  # v[i] -> v[i-1], out-of-range = inf
        return jnp.concatenate([jnp.full((1,), inf, C.dtype), v[:-1]])

    def body(carry, k):
        prev2, prev = carry          # diagonals k-2 and k-1, indexed by i
        j = k - iarr
        valid = (j >= 0) & (j < m)
        c = jnp.where(valid, C[iarr, jnp.clip(j, 0, m - 1)], inf)
        best = jnp.minimum(jnp.minimum(prev,        # (i,   j-1)
                                       shift(prev)),  # (i-1, j)
                           shift(prev2))             # (i-1, j-1)
        # base case: cell (0, 0) has no predecessor
        best = jnp.where((k == 0) & (iarr == 0), 0.0, best)
        d = jnp.where(valid, c + best, inf)
        return (prev, d), None

    init = (jnp.full(n, inf, C.dtype), jnp.full(n, inf, C.dtype))
    (_, last), _ = jax.lax.scan(body, init, jnp.arange(n + m - 1))
    return last[n - 1]


def batch_dtw_device(xs: jnp.ndarray, ys: jnp.ndarray, dist_ord: int = 1):
    """vmapped exact DTW: xs (B, n, d) vs ys (B, m, d) -> (B,)."""
    return jax.vmap(lambda a, b: dtw_device(a, b, dist_ord=dist_ord))(xs, ys)


def tip_dtw_device(pred_trajs: jnp.ndarray, ref_traj: jnp.ndarray,
                   node: int = -1, dist_ord: int = 1):
    """Batched tip-trajectory DTW — the reference metric
    (fastdtw on traj[:, :3, 9], physics_multitrain.py:213) for a whole
    batch of predicted rollouts against one reference, on device.

    pred_trajs: (B, T, N, >=3+); ref_traj: (T', N, >=3+), state-last
    layout. Returns (B,) distances.
    """
    ref_tip = ref_traj[:, node, :3]
    return jax.vmap(
        lambda t: dtw_device(t[:, node, :3], ref_tip, dist_ord=dist_ord)
    )(pred_trajs)
