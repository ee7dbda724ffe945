"""Fused Pallas RHS kernel vs the pure-JAX reference path.

Runs in interpret mode on CPU (real Mosaic compilation is exercised on TPU
by scripts/bench_pallas.py / bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu import apply_mod
from knode_cosserat_tpu.core.spatial import next_segment_euler
from knode_cosserat_tpu.models import MLPSpec, init_mlp, bind
from knode_cosserat_tpu.ops.pallas_rhs import make_fused_next_segment


def _data(B=100, dtype=jnp.float32):
    rng = np.random.RandomState(0)
    y = rng.randn(B, 19).astype(np.float64) * 0.1
    y[:, 3] += 1.0
    yh = rng.randn(B, 19)
    zh = rng.randn(B, 6)
    tf = rng.randn(B, 3)
    c = lambda a: jnp.asarray(a, dtype)
    return c(y), c(yh), c(zh), c(tf)


@pytest.mark.parametrize("B", [64, 100, 256, 300])
def test_fused_matches_jax(B):
    p = apply_mod(None, dtype=jnp.float32)
    spec = MLPSpec.for_knode(64)
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)
    fused = make_fused_next_segment(p, spec, block_b=128, interpret=True)
    y, yh, zh, tf = _data(B)

    yg_f, z_f = fused(params, y, yh, zh, tf)
    yg_j, z_j = next_segment_euler(p, y, yh, zh, tf, nn_fn=bind(spec, params))
    np.testing.assert_allclose(np.asarray(yg_f), np.asarray(yg_j),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_j),
                               rtol=2e-5, atol=2e-5)


def test_fused_gradients_match_jax():
    p = apply_mod(None, dtype=jnp.float32)
    spec = MLPSpec.for_knode(32)
    params = init_mlp(spec, jax.random.PRNGKey(1), jnp.float32)
    fused = make_fused_next_segment(p, spec, block_b=128, interpret=True)
    y, yh, zh, tf = _data(64)

    def loss_fused(q):
        yg, z = fused(q, y, yh, zh, tf)
        return jnp.sum(yg ** 2) + jnp.sum(z ** 2)

    def loss_jax(q):
        yg, z = next_segment_euler(p, y, yh, zh, tf, nn_fn=bind(spec, q))
        return jnp.sum(yg ** 2) + jnp.sum(z ** 2)

    gf = jax.grad(loss_fused)(params)
    gj = jax.grad(loss_jax)(params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gj)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_training_step_with_pallas_matches_xla():
    """use_pallas=True training step == the XLA step (interpret on CPU)."""
    import optax
    from knode_cosserat_tpu.training import make_training_data
    from knode_cosserat_tpu.training.train import (TrainConfig,
                                                   make_optimizer,
                                                   make_train_step)
    from knode_cosserat_tpu.ops import pallas_rhs as prh

    ref = apply_mod(None)
    p_mod = apply_mod("nsw", dtype=jnp.float32)
    trajs, ctls = make_training_data(ref, [("sine", 0.5)] * 2, train_len=6)
    trajs = jnp.asarray(np.asarray(trajs), jnp.float32)
    ctls = jnp.asarray(np.asarray(ctls), jnp.float32)

    cfg = TrainConfig(hidden=16, dtype="float32")
    spec = cfg.spec()
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)
    opt = make_optimizer(cfg)

    # interpret mode on CPU: patch the kernel builder's default
    orig = prh.make_fused_next_segment
    prh.make_fused_next_segment = lambda p, s, **kw: orig(
        p, s, interpret=True, **{k: v for k, v in kw.items()
                                 if k != "interpret"})
    try:
        step_pl, _ = make_train_step(p_mod, spec, opt, cfg.keypoints, True,
                                     use_pallas=True)
        step_xla, _ = make_train_step(p_mod, spec, opt, cfg.keypoints, True)
        s0 = opt.init(params)
        p1, _, l1 = step_pl(params, s0, trajs, ctls)
        p2, _, l2 = step_xla(params, opt.init(params), trajs, ctls)
    finally:
        prh.make_fused_next_segment = orig
    assert float(l1) == pytest.approx(float(l2), rel=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                                   atol=2e-4)
