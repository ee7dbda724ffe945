"""Fused whole-training-run kernel (ops/pallas_train.py) == the XLA epoch
scan, including Adam, reduce-on-plateau, and the weight clamp. Interpret
mode on CPU; TPU timing in scripts/bench_pallas_train.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu import apply_mod
from knode_cosserat_tpu.models import init_mlp
from knode_cosserat_tpu.ops.pallas_train import (fused_trainer_supported,
                                                 make_fused_training_run)
from knode_cosserat_tpu.training import TrainConfig, make_training_data
from knode_cosserat_tpu.training.train import make_epoch_scan, make_optimizer


def _setup(hidden=32, train_len=8, epochs=40, **cfg_kw):
    ref = apply_mod(None)
    p_mod = apply_mod("nsw")
    trajs, ctls = make_training_data(ref, [("sine", 0.5), ("sine", 1.0)],
                                     train_len=train_len)
    trajs = jnp.asarray(np.asarray(trajs), jnp.float32)
    ctls = jnp.asarray(np.asarray(ctls), jnp.float32)
    cfg = TrainConfig(epochs=epochs, hidden=hidden, dtype="float32",
                      **cfg_kw)
    spec = cfg.spec()
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)
    return p_mod, cfg, spec, params, trajs, ctls


def _run_xla(p_mod, cfg, spec, params, trajs, ctls, epochs):
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    run = make_epoch_scan(p_mod, spec, opt, cfg.keypoints,
                          cfg.clamp_weights, epochs)
    p_out, _, losses = run(params, opt_state, trajs, ctls)
    return p_out, np.asarray(losses)


def test_fused_training_matches_epoch_scan():
    epochs = 40
    p_mod, cfg, spec, params, trajs, ctls = _setup(epochs=epochs)
    assert fused_trainer_supported(spec, trajs.shape[0] * (trajs.shape[1]
                                                           - 1) * 4)
    run = make_fused_training_run(p_mod, spec, cfg, epochs, interpret=True)
    p_fused, l_fused, _ = run(params, trajs, ctls)
    p_xla, l_xla = _run_xla(p_mod, cfg, spec, params, trajs, ctls, epochs)

    np.testing.assert_allclose(np.asarray(l_fused), l_xla, rtol=2e-4,
                               atol=1e-9)
    for a, b in zip(jax.tree.leaves(p_fused), jax.tree.leaves(p_xla)):
        np.testing.assert_allclose(np.asarray(a).ravel(),
                                   np.asarray(b).ravel(), rtol=3e-3,
                                   atol=3e-5)


def test_fused_training_plateau_reduction():
    """Small patience forces the reduce-on-plateau scale path; both
    implementations must agree through the lr reductions."""
    epochs = 60
    p_mod, cfg, spec, params, trajs, ctls = _setup(
        epochs=epochs, plateau_patience=4, plateau_factor=0.5)
    run = make_fused_training_run(p_mod, spec, cfg, epochs, interpret=True)
    p_fused, l_fused, _ = run(params, trajs, ctls)
    p_xla, l_xla = _run_xla(p_mod, cfg, spec, params, trajs, ctls, epochs)
    np.testing.assert_allclose(np.asarray(l_fused), l_xla, rtol=5e-4,
                               atol=1e-9)


def test_fused_training_history_net():
    epochs = 15
    p_mod, cfg, spec, params, trajs, ctls = _setup(epochs=epochs,
                                                   history=True)
    assert spec.dims[0] == 53
    run = make_fused_training_run(p_mod, spec, cfg, epochs, interpret=True)
    p_fused, l_fused, _ = run(params, trajs, ctls)
    p_xla, l_xla = _run_xla(p_mod, cfg, spec, params, trajs, ctls, epochs)
    np.testing.assert_allclose(np.asarray(l_fused), l_xla, rtol=2e-4,
                               atol=1e-9)


def test_fused_training_loss_decreases():
    epochs = 30
    p_mod, cfg, spec, params, trajs, ctls = _setup(epochs=epochs)
    run = make_fused_training_run(p_mod, spec, cfg, epochs, interpret=True)
    _, losses, _ = run(params, trajs, ctls)
    l = np.asarray(losses)
    assert np.isfinite(l).all()
    assert l[-1] < l[0] * 0.5


def test_fused_training_chunked_resume():
    """Two chunked fused runs with opt-state round-trip == one long run
    (global Adam step count, plateau state, moments all compose)."""
    p_mod, cfg, spec, params, trajs, ctls = _setup(epochs=40)
    run15 = make_fused_training_run(p_mod, spec, cfg, 15, interpret=True)
    run25 = make_fused_training_run(p_mod, spec, cfg, 25, interpret=True)
    run40 = make_fused_training_run(p_mod, spec, cfg, 40, interpret=True)

    pa, la, st = run15(params, trajs, ctls)
    pa, lb, st = run25(pa, trajs, ctls, st)
    pc, lc, _ = run40(params, trajs, ctls)

    np.testing.assert_allclose(np.concatenate([np.asarray(la),
                                               np.asarray(lb)]),
                               np.asarray(lc), rtol=1e-6, atol=1e-12)
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
