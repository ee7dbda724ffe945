"""Precision policy tests: the f32 TPU path must track the f64 reference
path closely (BASELINE.md flags f64-on-TPU as a hard part; the conditioning
fix is the precomputed rest-strain offset in core/params.derive)."""
import jax.numpy as jnp
import numpy as np

from knode_cosserat_tpu import apply_mod, calc_controls
from knode_cosserat_tpu.core.stepper import simulate_scan


def test_f32_rollout_tracks_f64():
    p64 = apply_mod(None, dtype=jnp.float64)
    p32 = apply_mod(None, dtype=jnp.float32)
    ctl = calc_controls("sine", 1.0, float(p64.del_t), 60)
    t64 = np.asarray(simulate_scan(p64, jnp.asarray(ctl)).traj)
    out32 = simulate_scan(p32, jnp.asarray(ctl, jnp.float32), tol=1e-12)
    t32 = np.asarray(out32.traj)
    # positions within a micron, solver healthy
    assert np.abs(t32[:, :, :3] - t64[:, :, :3]).max() < 5e-6
    # the f32 default path converges below 1e-5 residual (the pre-LM
    # solver stalled near 5e-4; Levenberg-Marquardt escalation in
    # newton_solve pushes through the f32 plateau)
    assert np.asarray(out32.residuals).max() < 1e-5
    assert np.isfinite(t32).all()


def test_f32_constitutive_solve_conditioning():
    """v = Kinv (R^T n - Bse vh) + v_rest keeps O(1e-5) strain deviations
    despite O(1e5) stiffness entries; the naive f32 form
    Kinv (R^T n + Kse vstar - Bse vh) loses ~3 digits."""
    from knode_cosserat_tpu.core.rhs import rhs
    p32 = apply_mod(None, dtype=jnp.float32)
    p64 = apply_mod(None, dtype=jnp.float64)
    rng = np.random.RandomState(0)
    y = rng.randn(19) * 0.1
    y[3] += 1.0
    yh = rng.randn(19)
    zh = rng.randn(6)
    tf = rng.randn(3)
    _, z32 = rhs(p32, jnp.asarray(y, jnp.float32), jnp.asarray(yh, jnp.float32),
                 jnp.asarray(zh, jnp.float32), jnp.asarray(tf, jnp.float32))
    _, z64 = rhs(p64, jnp.asarray(y), jnp.asarray(yh), jnp.asarray(zh),
                 jnp.asarray(tf))
    # strain deviation from rest is tiny; relative accuracy must survive f32
    rel = np.abs(np.asarray(z32, np.float64) - np.asarray(z64)) / (
        np.abs(np.asarray(z64)) + 1e-12)
    assert rel.max() < 1e-4


def test_default_tol_is_dtype_appropriate():
    """simulate_scan's default Newton tolerance must be reachable in the
    rollout dtype: an f32 rollout with the defaults may not burn max_iter
    iterations on every step (sum(r^2) < 1e-16 is below f32 resolution)."""
    import jax.numpy as jnp

    from knode_cosserat_tpu import calc_controls, make_rod
    from knode_cosserat_tpu.core.stepper import simulate_scan

    p32 = make_rod(N=10, dtype=jnp.float32)
    ctl = jnp.asarray(calc_controls("sine", 0.5, float(p32.del_t), 12),
                      jnp.float32)
    out = simulate_scan(p32, ctl)
    iters = np.asarray(out.newton_iters)[1:]
    assert iters.mean() < 10, iters
    assert np.asarray(out.residuals).max() < 1e-4
