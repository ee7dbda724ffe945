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
    Gaussian elimination with partial pivoting, unrolled at trace time.

    A and b are eliminated side by side (never concatenated) so that when A
    is constant the computation stays *linear in b* at the jaxpr level —
    required for lax.custom_root's tangent_solve to be transposable."""
    n = A.shape[-1]

    for k in range(n):
        col = jnp.abs(A[..., :, k])
        col = jnp.where(jnp.arange(n) < k, -jnp.inf, col)
        piv = jnp.argmax(col, axis=-1)  # (...,)

        # row-permutation indices swapping k <-> piv (derived from A only)
        idx = jnp.broadcast_to(jnp.arange(n), A.shape[:-2] + (n,))
        k_arr = jnp.full(A.shape[:-2] + (1,), k, dtype=piv.dtype)
        perm = jnp.where(idx == k, piv[..., None],
                         jnp.where(idx == piv[..., None], k_arr, idx))
        A = jnp.take_along_axis(A, perm[..., :, None], axis=-2)
        b = jnp.take_along_axis(b, perm, axis=-1)

        pivot_row = A[..., k, :]                     # (..., n)
        pivot_val = pivot_row[..., k][..., None]     # (..., 1)
        factors = A[..., :, k] / pivot_val[..., 0][..., None]
        factors = jnp.where(jnp.arange(n) > k, factors, 0.0)
        A = A - factors[..., :, None] * pivot_row[..., None, :]
        b = b - factors * b[..., k][..., None]

    # back substitution
    xs = [None] * n
    for k in range(n - 1, -1, -1):
        rhs = b[..., k]
        for j in range(k + 1, n):
            rhs = rhs - A[..., k, j] * xs[j]
        xs[k] = rhs / A[..., k, k]
    return jnp.stack(xs, axis=-1)


def solve_spd_small(A: jnp.ndarray, b: jnp.ndarray, damping=0.0) -> jnp.ndarray:
    """Solve (A^T A + damping I) x = A^T b — the Levenberg-Marquardt normal
    equations, for rescuing near-singular Newton steps."""
    import jax
    n = A.shape[-1]
    # full f32 accumulation: the normal equations square the condition
    # number, so bf16 MXU passes (TPU default) are not acceptable here
    hi = jax.lax.Precision.HIGHEST
    AtA = jnp.einsum("...ki,...kj->...ij", A, A, precision=hi)
    Atb = jnp.einsum("...ki,...k->...i", A, b, precision=hi)
    if damping:
        AtA = AtA + damping * jnp.eye(n, dtype=A.dtype)
    return solve_small(AtA, Atb)
