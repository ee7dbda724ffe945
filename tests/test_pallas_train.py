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


def test_fused_training_weight_decay_matches_adamw():
    """In-kernel AdamW (decoupled decay inside the lr*scale step) == the
    optax.adamw chain — the train-real config (wd=0.1) qualifies for the
    fused path."""
    epochs = 30
    p_mod, cfg, spec, params, trajs, ctls = _setup(epochs=epochs,
                                                   weight_decay=0.1)
    assert fused_trainer_supported(spec, 8, weight_decay=0.1)
    run = make_fused_training_run(p_mod, spec, cfg, epochs, interpret=True)
    p_fused, l_fused, _ = run(params, trajs, ctls)
    p_xla, l_xla = _run_xla(p_mod, cfg, spec, params, trajs, ctls, epochs)
    np.testing.assert_allclose(np.asarray(l_fused), l_xla, rtol=2e-4,
                               atol=1e-9)
    for a, b in zip(jax.tree.leaves(p_fused), jax.tree.leaves(p_xla)):
        np.testing.assert_allclose(np.asarray(a).ravel(),
                                   np.asarray(b).ravel(), rtol=3e-3,
                                   atol=3e-5)


def test_fused_training_cell_tiling(monkeypatch):
    """Cells beyond one VMEM tile accumulate across the in-kernel tile loop
    — force multi-tile with a tiny VMEM budget and pin parity."""
    import knode_cosserat_tpu.ops.pallas_train as pt
    monkeypatch.setattr(pt, "VMEM_BUDGET", 100_000.0)  # -> 128-lane tiles
    epochs = 20
    p_mod, cfg, spec, params, trajs, ctls = _setup(epochs=epochs,
                                                   train_len=20)
    n_cells = trajs.shape[0] * (trajs.shape[1] - 1) * 4
    # the workload really is multi-tile under the shrunken budget
    assert pt._pick_tiling(n_cells, spec.dims[1], spec.dims[0])[0] > 1
    run = pt.make_fused_training_run(p_mod, spec, cfg, epochs,
                                     interpret=True)
    p_fused, l_fused, _ = run(params, trajs, ctls)
    p_xla, l_xla = _run_xla(p_mod, cfg, spec, params, trajs, ctls, epochs)
    np.testing.assert_allclose(np.asarray(l_fused), l_xla, rtol=2e-4,
                               atol=1e-9)
    for a, b in zip(jax.tree.leaves(p_fused), jax.tree.leaves(p_xla)):
        np.testing.assert_allclose(np.asarray(a).ravel(),
                                   np.asarray(b).ravel(), rtol=3e-3,
                                   atol=3e-5)


def test_fused_optax_state_conversion_roundtrip():
    """XLA epochs -> convert to fused -> fused epochs -> convert back ==
    one uninterrupted XLA run: the converters make the optax chain state
    canonical across both trainers."""
    from knode_cosserat_tpu.ops.pallas_train import (
        fused_state_from_optax, optax_state_from_fused)

    total, first = 24, 9
    p_mod, cfg, spec, params, trajs, ctls = _setup(epochs=total,
                                                   plateau_patience=4)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    run_first = make_epoch_scan(p_mod, spec, opt, cfg.keypoints,
                                cfg.clamp_weights, first)
    p_mid, opt_mid, l_first = run_first(params, opt_state, trajs, ctls)

    fstate = fused_state_from_optax(opt_mid)
    run_rest = make_fused_training_run(p_mod, spec, cfg, total - first,
                                       interpret=True)
    p_end, l_rest, fstate = run_rest(p_mid, trajs, ctls, fstate)
    opt_back = optax_state_from_fused(fstate, opt_mid)
    # structure survives the round-trip (jit/scan over it would fail else)
    assert (jax.tree.structure(opt_back) == jax.tree.structure(opt_mid))

    p_ref, l_ref = _run_xla(p_mod, cfg, spec, params, trajs, ctls, total)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(l_first), np.asarray(l_rest)]), l_ref,
        rtol=5e-4, atol=1e-9)
    for a, b in zip(jax.tree.leaves(p_end), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a).ravel(),
                                   np.asarray(b).ravel(), rtol=3e-3,
                                   atol=3e-5)
    # continuing on the XLA path from the converted state also matches
    run_more = make_epoch_scan(p_mod, spec, opt, cfg.keypoints,
                               cfg.clamp_weights, 3)
    _, _, l_more = run_more(p_end, opt_back, trajs, ctls)
    assert np.isfinite(np.asarray(l_more)).all()


def test_train_knode_fused_is_the_trainer():
    """The PRODUCT trainer (train_knode with eval + best-DTW) rides the
    fused kernel when cfg.fused forces it — and matches the XLA path."""
    from knode_cosserat_tpu import apply_mod as am
    from knode_cosserat_tpu.training import (make_validation_reference,
                                             train_knode)

    ref = am(None)
    p_mod = am("nsw")
    trajs, ctls = make_training_data(ref, [("sine", 0.5), ("sine", 1.0)],
                                     train_len=8)
    trajs = np.asarray(trajs, np.float32)
    ctls = np.asarray(ctls, np.float32)
    vc, vr = make_validation_reference(ref, ("sine", 1.25), eval_len=6)
    kw = dict(epochs=8, hidden=32, dtype="float32", seed=0, eval_every=4,
              eval_len=6, log_every=1000)
    res_f = train_knode(p_mod, trajs, ctls,
                        TrainConfig(fused="interpret", **kw), vc, vr,
                        eval_rod=p_mod, log=None)
    res_x = train_knode(p_mod, trajs, ctls, TrainConfig(fused="off", **kw),
                        vc, vr, eval_rod=p_mod, log=None)
    np.testing.assert_allclose(res_f.loss_history, res_x.loss_history,
                               rtol=5e-4, atol=1e-9)
    assert len(res_f.dtw_history) == len(res_x.dtw_history)
    np.testing.assert_allclose([d for _, d in res_f.dtw_history],
                               [d for _, d in res_x.dtw_history], rtol=1e-3)
    for a, b in zip(jax.tree.leaves(res_f.params),
                    jax.tree.leaves(res_x.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3,
                                   atol=3e-5)


def test_train_knode_fused_checkpoint_resume(tmp_path):
    """Checkpoint written mid-run by the FUSED trainer resumes exactly:
    the canonical optax state saved at the boundary converts back into
    the kernel's opaque state on resume."""
    from knode_cosserat_tpu import apply_mod as am
    from knode_cosserat_tpu.training import train_knode
    from knode_cosserat_tpu.training.checkpoint import save_checkpoint

    ref = am(None)
    p_mod = am("youngs")
    trajs, ctls = make_training_data(ref, [("sine", 0.5)], train_len=6)
    trajs = np.asarray(trajs, np.float32)
    ctls = np.asarray(ctls, np.float32)
    kw = dict(hidden=32, dtype="float32", seed=1, log_every=1000,
              fused="interpret")

    full = train_knode(p_mod, trajs, ctls, TrainConfig(epochs=8, **kw),
                       log=None)
    half = train_knode(p_mod, trajs, ctls, TrainConfig(epochs=3, **kw),
                       log=None)
    ck = str(tmp_path / "fused_ck")
    save_checkpoint(ck, {"params": half.params,
                         "loss": half.loss_history})
    res = train_knode(p_mod, trajs, ctls, TrainConfig(epochs=4, **kw),
                      resume_from=ck, log=None)
    assert np.isfinite(res.loss_history).all()
    np.testing.assert_allclose(res.loss_history[:4], full.loss_history[:4],
                               rtol=1e-5)


def test_fused_grid_training_matches_per_model():
    """The vmapped grid kernel == each model trained alone with its own
    fused run (rod scalars ride the per-lane scalar row)."""
    from knode_cosserat_tpu import apply_mod as am
    from knode_cosserat_tpu.ops.pallas_train import (
        make_fused_grid_training_run)

    epochs = 10
    ref = am(None)
    trajs, ctls = make_training_data(ref, [("sine", 0.5), ("sine", 1.0)],
                                     train_len=8)
    trajs = jnp.asarray(np.asarray(trajs), jnp.float32)
    ctls = jnp.asarray(np.asarray(ctls), jnp.float32)
    cfg = TrainConfig(epochs=epochs, hidden=32, dtype="float32")
    spec = cfg.spec()
    mods = ["nsw", "short"]          # "short" changes L -> per-rod ds
    rods = [am(m) for m in mods]
    params = [init_mlp(spec, jax.random.PRNGKey(s), jnp.float32)
              for s in range(len(mods))]

    rods_st = jax.tree.map(lambda *xs: jnp.stack(xs), *rods)
    params_st = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
    trajs_st = jnp.stack([trajs] * len(mods))
    ctls_st = jnp.stack([ctls] * len(mods))

    grid_run = make_fused_grid_training_run(spec, cfg, epochs,
                                            interpret=True)
    pg, lg, _ = grid_run(rods_st, params_st, trajs_st, ctls_st)

    for i, (rod, p0) in enumerate(zip(rods, params)):
        run = make_fused_training_run(rod, spec, cfg, epochs,
                                      interpret=True)
        p1, l1, _ = run(p0, trajs, ctls)
        np.testing.assert_allclose(np.asarray(lg)[i], np.asarray(l1),
                                   rtol=1e-6, atol=1e-12)
        for a, b in zip(jax.tree.leaves(jax.tree.map(lambda x: x[i], pg)),
                        jax.tree.leaves(p1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-9)


def test_grid_train_fused_matches_xla():
    """parallel.grid.grid_train rides the vmapped fused kernel when
    cfg.fused forces it — whole-grid results match the XLA vmap path."""
    import dataclasses

    from knode_cosserat_tpu import apply_mod as am
    from knode_cosserat_tpu.parallel import build_grid, grid_train

    ref = am(None)
    cells = build_grid(["sine 0.5"], ["nsw", "youngs"], 2)
    kw = dict(epochs=4, hidden=16, dtype="float32", log_every=2)
    res_f = grid_train(cells, TrainConfig(fused="interpret", **kw),
                       reference_rod=ref, train_len=6)
    res_x = grid_train(cells, TrainConfig(fused="off", **kw),
                       reference_rod=ref, train_len=6)
    np.testing.assert_allclose(res_f.loss_history, res_x.loss_history,
                               rtol=5e-4, atol=1e-9)
    for pf, px in zip(res_f.params, res_x.params):
        for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(px)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-3, atol=3e-5)


def test_train_real_config_qualifies_for_fused():
    """The train-real CLI config (wd=0.1, keypoints [1,3,6,9], 4 x 119
    steps = 1904 cells) rides the fused trainer — weight decay and cell
    tiling both in scope (round-2 verdict item 1)."""
    from knode_cosserat_tpu.training.loss import DEFAULT_KEYPOINTS_REAL
    from knode_cosserat_tpu.training.train import _resolve_fused

    cfg = TrainConfig(weight_decay=0.1, keypoints=DEFAULT_KEYPOINTS_REAL,
                      dtype="float32", fused="on")
    n_cells = 4 * 119 * len(DEFAULT_KEYPOINTS_REAL)
    # "on" raises for unsupported configs; returning "on" == qualifies
    assert _resolve_fused(cfg, cfg.spec(), n_cells, None) == "on"


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


def test_fused_support_gate_declines_wide_hidden():
    """hidden > 512 must fall back to the XLA epoch scan: the Mosaic
    lowering fails (h>=1024 HTTP-500s under the old tiling; a
    VMEM-corrected tiling compiles >25 min — round-4 probes), and the
    XLA path is faster there anyway (docs/BENCHMARKS.md roofline)."""
    from knode_cosserat_tpu.models.mlp import MLPSpec
    assert fused_trainer_supported(MLPSpec.for_knode(hidden=512), 1904)
    for hidden in (1024, 2048, 4096, 8192):
        assert not fused_trainer_supported(
            MLPSpec.for_knode(hidden=hidden), 1904), hidden


def test_pick_tiling_respects_fixed_vmem_cost():
    """The lane-tile budget must subtract the hidden-dependent weight +
    Adam-moment residents AND charge the input slabs for every tile
    (they are whole-array VMEM residents): the round-5 grid width study
    OOM'd the chip at the old model's 3 x 1280 tiling for 3712 cells
    (16.3M scoped vs the 16M limit). At h=512 the reference configs keep
    their tiles (bench comparability)."""
    from knode_cosserat_tpu.ops.pallas_train import (VMEM_BUDGET,
                                                     _pick_tiling,
                                                     _tiling_vmem_bytes)
    assert _pick_tiling(112, 512, 53) == (1, 128)     # flagship bench
    assert _pick_tiling(1904, 512, 53) == (2, 1024)   # train-real
    # the measured-OOM shape must no longer be chosen
    assert _pick_tiling(3712, 512, 28) != (3, 1280)
    # 3200 is the shape where an unconverged pick pads past its own
    # budget (n_tiles*tile = 3456 > cells_pad = 3200)
    for cells in (112, 1904, 3200, 3712, 8192):
        for hidden in (64, 128, 512):
            for din in (28, 53):
                n_tiles, tile = _pick_tiling(cells, hidden, din)
                assert n_tiles * tile >= cells
                used = _tiling_vmem_bytes(cells, hidden, din)
                assert used <= VMEM_BUDGET or tile == 128, \
                    (cells, hidden, din, used)


# ------------------------------------------------- wide (streamed) trainer

def _wide_run(p_mod, spec, cfg, epochs):
    from knode_cosserat_tpu.ops.pallas_train_wide import (
        make_wide_training_run)
    return make_wide_training_run(p_mod, spec, cfg, epochs, interpret=True)


def test_wide_training_matches_epoch_scan():
    """HBM-streamed kernel == XLA epoch scan at a width the VMEM-resident
    kernel declines. hidden=640 forces two 512-wide hidden tiles PLUS 384
    zero-padded columns — the streaming loop, the per-tile recompute, and
    the pad-column invariants all on the parity path."""
    from knode_cosserat_tpu.ops.pallas_train_wide import (
        wide_trainer_supported)
    epochs = 40
    p_mod, cfg, spec, params, trajs, ctls = _setup(hidden=640,
                                                   epochs=epochs)
    assert not fused_trainer_supported(spec, 56)
    assert wide_trainer_supported(spec, 56)
    p_wide, l_wide, _ = _wide_run(p_mod, spec, cfg, epochs)(params, trajs,
                                                            ctls)
    p_xla, l_xla = _run_xla(p_mod, cfg, spec, params, trajs, ctls, epochs)
    np.testing.assert_allclose(np.asarray(l_wide), l_xla, rtol=2e-4,
                               atol=1e-9)
    for a, b in zip(jax.tree.leaves(p_wide), jax.tree.leaves(p_xla)):
        np.testing.assert_allclose(np.asarray(a).ravel(),
                                   np.asarray(b).ravel(), rtol=3e-3,
                                   atol=3e-5)


def test_wide_training_plateau_wd_history():
    """Plateau reductions + AdamW decay + the 53-input history net through
    the streamed kernel (the train-real flagship configuration shape)."""
    epochs = 60
    p_mod, cfg, spec, params, trajs, ctls = _setup(
        hidden=640, epochs=epochs, history=True, weight_decay=0.1,
        plateau_patience=4, plateau_factor=0.5)
    assert spec.dims[0] == 53
    p_wide, l_wide, _ = _wide_run(p_mod, spec, cfg, epochs)(params, trajs,
                                                            ctls)
    p_xla, l_xla = _run_xla(p_mod, cfg, spec, params, trajs, ctls, epochs)
    np.testing.assert_allclose(np.asarray(l_wide), l_xla, rtol=5e-4,
                               atol=1e-9)
    for a, b in zip(jax.tree.leaves(p_wide), jax.tree.leaves(p_xla)):
        np.testing.assert_allclose(np.asarray(a).ravel(),
                                   np.asarray(b).ravel(), rtol=3e-3,
                                   atol=3e-5)


def test_wide_training_chunked_resume():
    """Opaque opt_state round-trips across wide chunks — and across a
    MIXED wide/VMEM-resident pair at a width both support, so the product
    trainer can switch kernels mid-run without a numeric seam."""
    p_mod, cfg, spec, params, trajs, ctls = _setup(hidden=640, epochs=40)
    pa, la, st = _wide_run(p_mod, spec, cfg, 15)(params, trajs, ctls)
    pa, lb, st = _wide_run(p_mod, spec, cfg, 25)(pa, trajs, ctls, st)
    pc, lc, _ = _wide_run(p_mod, spec, cfg, 40)(params, trajs, ctls)
    np.testing.assert_allclose(np.concatenate([np.asarray(la),
                                               np.asarray(lb)]),
                               np.asarray(lc), rtol=1e-6, atol=1e-12)
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)

    # mixed kernels, shared state: wide 15 + fused 25 == fused 40
    p_mod, cfg, spec, params, trajs, ctls = _setup(hidden=64, epochs=40)
    pa, la, st = _wide_run(p_mod, spec, cfg, 15)(params, trajs, ctls)
    run25 = make_fused_training_run(p_mod, spec, cfg, 25, interpret=True)
    pa, lb, st = run25(pa, trajs, ctls, st)
    pc, lc, _ = make_fused_training_run(p_mod, spec, cfg, 40,
                                        interpret=True)(params, trajs,
                                                        ctls)
    np.testing.assert_allclose(np.concatenate([np.asarray(la),
                                               np.asarray(lb)]),
                               np.asarray(lc), rtol=2e-5, atol=1e-10)


def test_wide_supported_gates():
    from knode_cosserat_tpu.models.mlp import MLPSpec
    from knode_cosserat_tpu.ops.pallas_train_wide import (
        WIDE_MAX_CELLS, wide_trainer_supported)
    # width-agnostic by design: the stream keeps VMEM usage constant
    for hidden in (64, 512, 1024, 8192, 32768):
        assert wide_trainer_supported(MLPSpec.for_knode(hidden=hidden),
                                      1904), hidden
    # cell count must fit the lane-tile budget
    assert not wide_trainer_supported(MLPSpec.for_knode(hidden=1024),
                                      WIDE_MAX_CELLS + 1)
    # architecture gates shared with the VMEM-resident kernel
    assert not wide_trainer_supported(
        MLPSpec.for_knode(hidden=1024, activation="tanh"), 1904)
    assert not wide_trainer_supported(
        MLPSpec.for_knode(hidden=1024, compute_dtype="bfloat16"), 1904)


def test_resolve_fused_routes_wide(monkeypatch):
    """cfg.fused routing: auto prefers the VMEM-resident kernel, falls to
    wide for hidden > 512 on TPU, and 'wide'/'wide_interpret' force."""
    import knode_cosserat_tpu.training.train as T
    from knode_cosserat_tpu.training import TrainConfig

    cfg_small = TrainConfig(hidden=512, dtype="float32")
    cfg_wide = TrainConfig(hidden=4096, dtype="float32")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert T._resolve_fused(cfg_small, cfg_small.spec(), 1904, None) == "on"
    assert T._resolve_fused(cfg_wide, cfg_wide.spec(), 1904,
                            None) == "wide"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert T._resolve_fused(cfg_wide, cfg_wide.spec(), 1904, None) is None
    cfg_forced = TrainConfig(hidden=4096, dtype="float32",
                             fused="wide_interpret")
    assert T._resolve_fused(cfg_forced, cfg_forced.spec(), 1904,
                            None) == "wide_interpret"
    cfg_bad = TrainConfig(hidden=4096, dtype="float32", fused="wide")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        T._resolve_fused(cfg_bad, cfg_bad.spec(), 10 ** 6, None)
    # under a mesh the single-model kernels decline (the multi-chip fast
    # path is the sharded GRID); forcing wide there must refuse loudly
    from knode_cosserat_tpu.parallel import make_mesh
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    mesh = make_mesh(data=1)
    assert T._resolve_fused(cfg_wide, cfg_wide.spec(), 1904, mesh) is None
    cfg_forced_mesh = TrainConfig(hidden=4096, dtype="float32",
                                  fused="wide")
    with _pytest.raises(ValueError):
        T._resolve_fused(cfg_forced_mesh, cfg_forced_mesh.spec(), 1904,
                         mesh)
