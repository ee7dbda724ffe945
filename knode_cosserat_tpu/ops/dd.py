"""Double-double (two-float) emulation for ill-conditioned reductions.

TPUs have no f64 LinAlg and large f64 programs crash the libtpu worker
(training/sysid.py, cli.cmd_sysid), yet the identifiability/Fisher
analysis needs Gram matrices whose smallest eigenvalues sit ~9 orders of
magnitude below the largest (the joint E-r-L-rho-Bbt Hessian: smallest
eigenvalue 8e-11 vs 0.1 at f64 — a single-f32 J^T J contraction inflates
it 2000x and reports the wrong parameter correlations; measured,
docs/BENCHMARKS.md precision study).

The fix is error-free transformations: every f32 add/mul also yields its
EXACT rounding error as a second f32 (Knuth TwoSum; Dekker split/TwoProd
— no FMA on the VPU, so products split at 2^12+1), and sums carry the
(hi, lo) pair through a vectorized pairwise tree. Effective precision
~2^-48 — f64-class — entirely in f32 VPU ops, so it runs on chip inside
jit.

These are REDUCTION tools, not a general dd tensor type: the package
only needs `dd_sum` (compensated reductions) and `dd_gram` (the J^T J
contraction behind Gauss-Newton Fisher matrices). Everything composes
with jit/vmap; gradients are not defined through the error terms (the
consumers treat the Gram as a diagnostic output, not a training path —
the differentiable on-chip criterion uses SVD of J instead,
training/sysid.design_experiment).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = ["two_sum", "two_prod", "dd_add", "dd_sum", "dd_gram",
           "dd_to_float64"]

# Dekker splitting constant for f32 (2^ceil(24/2) + 1); for f64 inputs
# (CPU paths) the f64 constant is picked at trace time.
_SPLIT_F32 = 4097.0          # 2^12 + 1
_SPLIT_F64 = 134217729.0     # 2^27 + 1


def two_sum(a: jnp.ndarray, b: jnp.ndarray):
    """Error-free sum: (s, e) with s = fl(a + b) and s + e = a + b
    EXACTLY (Knuth, branch-free 6-flop variant)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _split(a: jnp.ndarray):
    c = jnp.asarray(_SPLIT_F32 if a.dtype == jnp.float32 else _SPLIT_F64,
                    a.dtype)
    t = c * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a: jnp.ndarray, b: jnp.ndarray):
    """Error-free product: (p, e) with p = fl(a * b) and p + e = a * b
    exactly (Dekker — the VPU exposes no FMA to jnp)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dd_add(x: Tuple[jnp.ndarray, jnp.ndarray],
           y: Tuple[jnp.ndarray, jnp.ndarray]):
    """(hi, lo) + (hi, lo) — standard dd addition (~2 ulp^2 error)."""
    xh, xl = x
    yh, yl = y
    s, e = two_sum(xh, yh)
    e = e + xl + yl
    hi, lo = two_sum(s, e)     # renormalize
    return hi, lo


def dd_sum(hi: jnp.ndarray, lo: jnp.ndarray, axis: int = 0):
    """Compensated reduction of a dd vector along ``axis`` by a pairwise
    tree of dd additions — fully vectorized (log2 n steps), so it runs as
    wide VPU ops instead of a serial carry loop."""
    hi = jnp.moveaxis(hi, axis, 0)
    lo = jnp.moveaxis(lo, axis, 0)
    n = hi.shape[0]
    # pad to a power of two with exact zeros
    m = 1 if n == 0 else 1 << (n - 1).bit_length()
    if m != n:
        pad = [(0, m - n)] + [(0, 0)] * (hi.ndim - 1)
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
    while hi.shape[0] > 1:
        half = hi.shape[0] // 2
        hi, lo = dd_add((hi[:half], lo[:half]), (hi[half:], lo[half:]))
    return hi[0], lo[0]


def dd_gram(J: jnp.ndarray):
    """J^T J with dd accumulation: (hi, lo) pair of (D, D) matrices with
    effective ~2^-48 relative precision from an f32 J.

    This is the reduction where single-f32 destroys conditioning: each
    product J[n, k] * J[n, l] is formed error-free (TwoProd) and the n-sum
    carries the compensation, so the result matches an f64 contraction of
    the same J to ~1e-14 — small eigenvalues (sigma_min^2 down to ~1e-14
    of sigma_max^2) survive. Memory: two (n, D, D) intermediates; fine for
    the (n <= ~1e5, D <= ~16) Fisher analyses this serves."""
    if J.ndim != 2:
        raise ValueError(f"dd_gram wants (n, D), got {J.shape}")
    p, e = two_prod(J[:, :, None], J[:, None, :])      # (n, D, D) exact
    return dd_sum(p, e, axis=0)


def dd_to_float64(hi: jnp.ndarray, lo) -> "object":
    """Host-side f64 view of a dd result (NumPy; exact since dd's 48-bit
    significand fits in f64's 53)."""
    import numpy as np
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
