"""Tiny dense linear algebra that lowers cleanly on TPU.

XLA:TPU's LuDecomposition expander only supports f32/c64, so
``jnp.linalg.solve`` on small f64 systems (the 6x6 shooting Jacobian) fails
to compile. These statically-unrolled Gaussian-elimination kernels work on
every backend and dtype, vmap/broadcast over leading axes, and are
differentiable (smooth away from pivot ties).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["solve_small", "solve_spd_small"]


def solve_small(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for small static n (A: (..., n, n), b: (..., n)) by
    Gaussian elimination with partial pivoting, unrolled at trace time."""
    n = A.shape[-1]
    M = jnp.concatenate([A, b[..., :, None]], axis=-1)  # (..., n, n+1)

    for k in range(n):
        col = jnp.abs(M[..., :, k])
        mask = jnp.arange(n) < k
        col = jnp.where(mask, -jnp.inf, col)
        piv = jnp.argmax(col, axis=-1)  # (...,)

        # swap rows k and piv (gather-based, batched)
        idx = jnp.arange(n)
        idx = jnp.broadcast_to(idx, M.shape[:-2] + (n,))
        k_arr = jnp.full(M.shape[:-2], k, dtype=piv.dtype)
        perm = jnp.where(idx == k, piv[..., None],
                         jnp.where(idx == piv[..., None], k_arr[..., None], idx))
        M = jnp.take_along_axis(M, perm[..., :, None], axis=-2)

        pivot_row = M[..., k, :]                     # (..., n+1)
        pivot_val = pivot_row[..., k][..., None]     # (..., 1)
        factors = M[..., :, k] / pivot_val           # (..., n)
        elim = (jnp.arange(n) > k)
        factors = jnp.where(elim, factors, 0.0)
        M = M - factors[..., :, None] * pivot_row[..., None, :]

    # back substitution
    xs = [None] * n
    for k in range(n - 1, -1, -1):
        rhs = M[..., k, n]
        for j in range(k + 1, n):
            rhs = rhs - M[..., k, j] * xs[j]
        xs[k] = rhs / M[..., k, k]
    return jnp.stack(xs, axis=-1)


def solve_spd_small(A: jnp.ndarray, b: jnp.ndarray, damping=0.0) -> jnp.ndarray:
    """Solve (A^T A + damping I) x = A^T b — the Levenberg-Marquardt normal
    equations, for rescuing near-singular Newton steps."""
    n = A.shape[-1]
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    Atb = jnp.einsum("...ki,...k->...i", A, b)
    if damping:
        AtA = AtA + damping * jnp.eye(n, dtype=A.dtype)
    return solve_small(AtA, Atb)
