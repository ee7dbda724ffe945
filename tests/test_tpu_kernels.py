"""On-TPU kernel tier: compile and run the Mosaic lowering of every Pallas
kernel family on the real chip and pin parity against the XLA paths.

The default CPU suite exercises kernel SEMANTICS (interpret mode); this
tier exercises the actual TPU lowering — i1-yield workarounds, bubble-max
pivoting, VMEM layouts (ops/pallas_step.py, ops/pallas_sweep.py,
ops/pallas_train.py, ops/dtw.py). A Mosaic regression fails here instead
of surfacing first in the driver's bench JSON (round-2 verdict item 3).

Run: KNODE_TEST_PLATFORM=tpu python -m pytest tests/ -m tpu -q
Auto-skips unless jax.default_backend() == "tpu".
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="requires a real TPU backend"),
]

from knode_cosserat_tpu import apply_mod  # noqa: E402
from knode_cosserat_tpu.controls import calc_controls  # noqa: E402
from knode_cosserat_tpu.core.fast_rollout import make_fast_rollout  # noqa: E402
from knode_cosserat_tpu.models import MLPSpec, init_mlp  # noqa: E402


@pytest.fixture(scope="module")
def rod():
    return apply_mod("nsw", dtype=jnp.float32)


@pytest.fixture(scope="module")
def controls(rod):
    return jnp.asarray(np.stack([
        calc_controls("sine", 0.5 + 0.2 * i, float(rod.del_t), 6)
        for i in range(4)]), jnp.float32)


def _xla_rollout(rod, controls, spec=None, nn_params=None):
    roll = jax.jit(make_fast_rollout(rod, spec, tol=1e-8, impl="xla"))
    traj, _, _ = roll(controls, nn_params)
    return np.asarray(traj)


def _assert_traj_close(actual, desired):
    """Channel-aware comparison: both solvers converge the residual to
    tol=1e-8, so the recorded STATE (y, z — what eval consumes) agrees
    tightly; the BDF-2 history channels carry a 1/del_t (~40x) scale and
    inherit the Newton path difference at ~1e-4 relative (measured on
    chip: state 2e-5, history 8e-4 abs)."""
    actual, desired = np.asarray(actual), np.asarray(desired)
    np.testing.assert_allclose(actual[..., :25], desired[..., :25],
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(actual[..., 25:], desired[..., 25:],
                               rtol=2e-3, atol=4e-3)


def test_tpu_sweep_rollout_matches_xla(rod, controls):
    """Fused sweep kernels (ops/pallas_sweep.py) on the chip == XLA."""
    roll = jax.jit(make_fast_rollout(rod, tol=1e-8, impl="pallas",
                                     block_b=128))
    traj, _, _ = roll(controls)
    _assert_traj_close(traj, _xla_rollout(rod, controls))


def test_tpu_mega_rollout_matches_xla(rod, controls):
    """Mega step kernel (ops/pallas_step.py) on the chip == XLA."""
    roll = jax.jit(make_fast_rollout(rod, tol=1e-8, impl="mega",
                                     block_b=128))
    traj, _, _ = roll(controls)
    _assert_traj_close(traj, _xla_rollout(rod, controls))


def test_tpu_mega_hybrid_rollout_matches_xla(rod, controls):
    """Mega kernel with the MLP residual in the RHS (the eval fast path)."""
    spec = MLPSpec.for_knode(128)
    params = jax.tree.map(lambda x: x * 1e-3,
                          init_mlp(spec, jax.random.PRNGKey(0),
                                   jnp.float32))
    roll = jax.jit(make_fast_rollout(rod, spec, tol=1e-8, impl="mega",
                                     block_b=128))
    traj, _, _ = roll(controls, params)
    _assert_traj_close(traj, _xla_rollout(rod, controls, spec, params))


def test_tpu_fused_training_matches_epoch_scan(rod):
    """Whole-training-run kernel (ops/pallas_train.py) Mosaic lowering ==
    the XLA epoch scan, including Adam + plateau + clamp."""
    from knode_cosserat_tpu.ops.pallas_train import make_fused_training_run
    from knode_cosserat_tpu.training import TrainConfig, make_training_data
    from knode_cosserat_tpu.training.train import (make_epoch_scan,
                                                   make_optimizer)

    ref = apply_mod(None, dtype=jnp.float32)
    trajs, ctls = make_training_data(ref, [("sine", 0.5), ("sine", 1.0)],
                                     train_len=8)
    trajs = jnp.asarray(np.asarray(trajs), jnp.float32)
    ctls = jnp.asarray(np.asarray(ctls), jnp.float32)
    epochs = 25
    cfg = TrainConfig(epochs=epochs, hidden=128, dtype="float32")
    spec = cfg.spec()
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)

    run = make_fused_training_run(rod, spec, cfg, epochs)
    p_f, l_f, _ = run(params, trajs, ctls)

    opt = make_optimizer(cfg)
    scan = make_epoch_scan(rod, spec, opt, cfg.keypoints, True, epochs)
    p_x, _, l_x = scan(params, opt.init(params), trajs, ctls)

    l_f, l_x = np.asarray(l_f), np.asarray(l_x)
    assert np.isfinite(l_f).all()
    np.testing.assert_allclose(l_f, l_x, rtol=5e-3, atol=1e-7)
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a).ravel(),
                                   np.asarray(b).ravel(), rtol=2e-2,
                                   atol=2e-4)


def test_tpu_fused_grid_training_runs(rod):
    """vmapped grid kernel lowers through Mosaic (grid dim added by the
    Pallas batching rule) and matches per-model runs."""
    from knode_cosserat_tpu.ops.pallas_train import (
        make_fused_grid_training_run, make_fused_training_run)
    from knode_cosserat_tpu.training import TrainConfig, make_training_data

    ref = apply_mod(None, dtype=jnp.float32)
    trajs, ctls = make_training_data(ref, [("sine", 0.5)], train_len=6)
    trajs = jnp.asarray(np.asarray(trajs), jnp.float32)
    ctls = jnp.asarray(np.asarray(ctls), jnp.float32)
    epochs = 10
    cfg = TrainConfig(epochs=epochs, hidden=128, dtype="float32")
    spec = cfg.spec()
    mods = ["nsw", "short"]
    rods = [apply_mod(m, dtype=jnp.float32) for m in mods]
    params = [init_mlp(spec, jax.random.PRNGKey(s), jnp.float32)
              for s in range(2)]
    rods_st = jax.tree.map(lambda *xs: jnp.stack(xs), *rods)
    params_st = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
    grid_run = make_fused_grid_training_run(spec, cfg, epochs)
    pg, lg, _ = grid_run(rods_st, params_st, jnp.stack([trajs] * 2),
                         jnp.stack([ctls] * 2))
    lg = np.asarray(lg)
    assert np.isfinite(lg).all()
    for i, (r, p0) in enumerate(zip(rods, params)):
        run = make_fused_training_run(r, spec, cfg, epochs)
        _, l1, _ = run(p0, trajs, ctls)
        np.testing.assert_allclose(lg[i], np.asarray(l1), rtol=1e-4,
                                   atol=1e-9)


def test_tpu_fused_rhs_matches_jax(rod):
    """Fused hybrid-RHS kernel (ops/pallas_rhs.py) Mosaic lowering == the
    pure-JAX next-segment update (physics on VPU + MLP on MXU)."""
    from knode_cosserat_tpu.core.spatial import next_segment_euler
    from knode_cosserat_tpu.models.mlp import bind
    from knode_cosserat_tpu.ops.pallas_rhs import make_fused_next_segment

    spec = MLPSpec.for_knode(128)
    params = init_mlp(spec, jax.random.PRNGKey(1), jnp.float32)
    rng = np.random.RandomState(0)
    B = 96
    y = jnp.asarray(rng.randn(B, 19) * 0.05 + np.array(
        [0, 0, 0.3] + [1, 0, 0, 0] + [0] * 12), jnp.float32)
    yh = jnp.asarray(rng.randn(B, 19).astype(np.float32))
    zh = jnp.asarray(rng.randn(B, 6).astype(np.float32))
    tf = jnp.asarray(rng.randn(B, 3).astype(np.float32))

    fused = make_fused_next_segment(rod, spec, block_b=128)
    yg_f, z_f = fused(params, y, yh, zh, tf)
    yg_j, z_j = next_segment_euler(rod, y, yh, zh, tf,
                                   nn_fn=bind(spec, params))
    np.testing.assert_allclose(np.asarray(yg_f), np.asarray(yg_j),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_j),
                               rtol=2e-3, atol=2e-4)


def test_tpu_device_dtw_matches_host():
    """Anti-diagonal wavefront DTW on the chip == host exact DTW."""
    from knode_cosserat_tpu.evaluation.metrics import dtw
    from knode_cosserat_tpu.ops.dtw import dtw_device

    rng = np.random.RandomState(0)
    x = rng.randn(40, 3).astype(np.float32)
    y = rng.randn(37, 3).astype(np.float32)
    d_dev = float(dtw_device(jnp.asarray(x), jnp.asarray(y)))
    d_host, _ = dtw(x, y)
    np.testing.assert_allclose(d_dev, d_host, rtol=1e-5)


def test_tpu_fused_training_train_real_scale():
    """The fused kernel compiles AND runs on the real chip at train-real
    scale: 1904 cells x hidden=512 with weight decay — the multi-tile
    VMEM regime. Round-3 regression: a 1920-lane tile at hidden=512
    allocated 18.0M of the 16M VMEM budget and failed Mosaic compilation;
    _pick_tiling's VMEM model must keep this workload compiling (2 x 1024
    lanes)."""
    from knode_cosserat_tpu.ops.pallas_train import (_pick_tiling,
                                                     make_fused_training_run)
    from knode_cosserat_tpu.training import TrainConfig

    p = apply_mod(None, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    B, T, N = 4, 120, 10
    trajs = np.zeros((B, T, N, 25), np.float32)
    trajs[..., 2] = np.linspace(0, 0.4, N)[None, None, :]
    trajs[..., 3] = 1.0
    trajs[..., 21] = 1.0
    trajs += 0.001 * rng.randn(*trajs.shape).astype(np.float32)
    ctls = 5.0 + rng.rand(B, T, 4).astype(np.float32)
    cfg = TrainConfig(epochs=10, hidden=512, weight_decay=0.1,
                      keypoints=(1, 3, 6, 9), dtype="float32")
    spec = cfg.spec()
    n_cells = B * (T - 1) * len(cfg.keypoints)
    assert _pick_tiling(n_cells, spec.dims[1], spec.dims[0])[0] > 1
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)
    run = make_fused_training_run(p, spec, cfg, 10)
    _, losses, _ = run(params, jnp.asarray(trajs), jnp.asarray(ctls))
    assert np.isfinite(np.asarray(losses)).all()


def test_tpu_sysid_teacher_fit(rod, controls):
    """f32 teacher-objective sysid compiles and recovers direction on chip
    (derive_traced's adjugate inverse must lower — jnp.linalg.inv has no
    TPU f64 path and this pins the f32 chip path end-to-end)."""
    from knode_cosserat_tpu.core.stepper import simulate_scan
    from knode_cosserat_tpu.training.sysid import fit_rod_params

    p_true = apply_mod(None, dtype=jnp.float32)
    ctl = controls[0]
    traj = simulate_scan(p_true, ctl).traj[:, :, :25]
    p0 = apply_mod("youngs", dtype=jnp.float32)
    res = fit_rod_params(p0, traj, ctl, fields=("E",), objective="teacher",
                         steps=40, lr=0.1)
    assert np.isfinite(np.asarray(res.loss_history)).all()
    assert float(res.loss_history[-1]) < float(res.loss_history[0])
    # moved from 10 GPa toward the true 2.758 GPa
    assert float(res.values["E"]) < 9e9


def test_bench_detail_has_no_failing_regressions():
    """The tripwire tier assertion (round-3 verdict item 5): the most
    recent on-chip bench run must not have regressed any guarded metric
    by >=25% vs the previous round's recorded bench."""
    import json
    import os
    detail = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAIL.json")
    if not os.path.exists(detail):
        pytest.skip("no BENCH_DETAIL.json (bench has not run here)")
    with open(detail) as f:
        doc = json.load(f)
    if doc.get("backend") == "cpu":
        pytest.skip("BENCH_DETAIL.json is a CPU run (not a chip record)")
    reg = (doc.get("extra") or {}).get("regressions")
    if reg is None:
        pytest.skip("bench predates the regression tripwire")
    assert reg["fail"] == {}, (
        f"bench metrics regressed >=25% vs {reg['baseline']}: {reg['fail']}")


def test_tpu_sysid_recovers_E_to_tenth_percent():
    """VERDICT-r3 #3 done-bar: the identification product stands on the
    chip alone — `sysid --fit E` protocol (f32, the CLI's on-chip
    default) recovers a youngs-faulted E to <0.1% with telemetry
    simulated in the run's own dtype (no f64 ground truth involved)."""
    from knode_cosserat_tpu import calc_controls, experimental_rod
    from knode_cosserat_tpu.core.stepper import simulate_scan
    from knode_cosserat_tpu.training.sysid import fit_rod_params

    plant = experimental_rod(dtype=jnp.float32)
    ctl = jnp.asarray(calc_controls("sine", 0.5, float(plant.del_t), 60),
                      jnp.float32)
    traj = simulate_scan(plant, ctl).traj[:, :, :25]
    p0 = experimental_rod("youngs", dtype=jnp.float32)   # 10 GPa fault
    res = fit_rod_params(p0, traj, ctl, fields=("E",), objective="teacher",
                         steps=150, lr=0.1)
    e_true = float(np.asarray(plant.E))
    e_est = float(np.asarray(res.values["E"]).reshape(-1)[0])
    rel = abs(e_est - e_true) / e_true
    assert rel < 1e-3, (e_est, e_true, rel)


def test_tpu_gn_identifiability_resolves_degenerate_spectrum():
    """The dd-Gram Gauss-Newton path must keep its f64-class conditioning
    ON CHIP: the joint 5-field curvature spectrum spans ~9 orders of
    magnitude. Two distinct failure modes are pinned here:
      * the dd contraction mis-lowering on Mosaic/VPU (it doesn't —
        chip dd == host f64 of the same J, scripts/diag_gn_chip.py);
      * the Jacobian itself computed with default-precision MXU dots
        (single-pass bf16), which inflates sigma_min ~1e2 and the
        smallest eigenvalue ~1e4 (7.90e-7 vs true 7.909e-11) — fixed by
        default_matmul_precision('highest') inside gn_parts
        (training/sysid.py). tests/test_dd.py pins the CPU-side parity."""
    from knode_cosserat_tpu import calc_controls, experimental_rod
    from knode_cosserat_tpu.core.stepper import simulate_scan
    from knode_cosserat_tpu.training.sysid import identifiability

    p = experimental_rod(dtype=jnp.float32)
    ctl = jnp.asarray(calc_controls("sine", 0.5, float(p.del_t), 30),
                      jnp.float32)
    traj = simulate_scan(p, ctl).traj[:, :, :25]
    rep = identifiability(p, traj, ctl,
                          fields=("E", "r", "L", "rho", "Bbt"))
    w = np.asarray(rep.eigvals)
    # f64 CPU reference for this exact protocol: smallest 7.909e-11,
    # largest 9.74e-2; the fixed on-chip path reproduces the smallest
    # eigenvalue to ~4 digits (measured 7.9090e-11). Pin a band, not
    # digits — the on-chip rollout differs from CPU-f32 at ~1e-7/step.
    assert w[-1] / w[0] > 1e8, (w[0], w[-1])
    assert 2e-11 < w[0] < 4e-10, w[0]
    assert np.isfinite(np.asarray(rep.correlation)).all()


def test_tpu_wide_trainer_mosaic_lowering_and_mfu():
    """The HBM-streamed wide trainer on the real chip: the Mosaic DMA
    lowering must (a) compile promptly at a width the VMEM-resident
    kernel measurably cannot, (b) train (finite, descending loss), and
    (c) clear the materializing path's ~9% MFU traffic ceiling at
    h=8192/1904 cells (measured 11.9%; bar set at 9.5% to ride out the
    ~10-15% chip timing variance — docs/BENCHMARKS.md wide roofline)."""
    import time

    from knode_cosserat_tpu.ops.pallas_train_wide import (
        make_wide_training_run, wide_trainer_supported)
    from knode_cosserat_tpu.training import TrainConfig

    rng = np.random.default_rng(0)
    p = apply_mod(None)
    B, T, E, hidden = 4, 120, 200, 8192
    trajs = jnp.asarray(rng.normal(size=(B, T, int(p.N), 25)) * 0.01,
                        jnp.float32)
    ctls = jnp.asarray(rng.uniform(1, 3, size=(B, T, 4)), jnp.float32)
    cfg = TrainConfig(epochs=E, hidden=hidden, dtype="float32",
                      history=True)
    spec = cfg.spec()
    n_cells = B * (T - 1) * len(cfg.keypoints)
    assert wide_trainer_supported(spec, n_cells)
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)
    run = make_wide_training_run(p, spec, cfg, E)
    _, losses, _ = run(params, trajs, ctls)          # compile + warm
    jax.block_until_ready(losses)
    l = np.asarray(losses)
    assert np.isfinite(l).all()
    # random-noise targets: the fit floor is data-determined; parity is
    # pinned on CPU (test_pallas_train.py) — here just prove real descent
    assert l[-1] < l[0] * 0.5, (l[0], l[-1])
    t0 = time.perf_counter()
    _, losses, _ = run(params, trajs, ctls)
    jax.block_until_ready(losses)
    eps = E / (time.perf_counter() - t0)
    din = spec.dims[0]
    mfu = 2.0 * n_cells * hidden * (2 * din + 75) * eps / 197e12 * 100
    assert mfu > 9.5, (eps, mfu)


def test_tpu_fused_assembly_step_matches_xla():
    """The coupled-assembly mega-kernel COMPILED on the chip: plate pose
    must agree with the XLA path to solver tolerance, converge every
    step, and beat the XLA path's MARGINAL (steady-state) wall by >=8x
    (VERDICT-r4 item 4 asked >=10x; measured 14x — the bar leaves room
    for chip timing variance). Marginal = (wall(T=1001)-wall(T=101))/900,
    cancelling the ~30 ms axon-tunnel round trip both paths pay per
    synced call (bench.timeit_queued docstring)."""
    import time

    from knode_cosserat_tpu.core.assembly import (make_ring_assembly,
                                                  simulate_assembly)

    asm = make_ring_assembly(n_rods=3, base_radius=0.05, N=10,
                             dtype=jnp.float32)
    dt = float(np.asarray(jax.tree.map(lambda x: x[0], asm.rods).del_t))

    def ctl_for(T):
        return jnp.asarray(np.stack(
            [np.asarray(calc_controls("sine", a, dt, T))
             for a in (0.7, 1.0, 1.3)], axis=1), jnp.float32)

    ctl = ctl_for(101)
    xla = jax.jit(lambda c: simulate_assembly(asm, c))
    fus = jax.jit(lambda c: simulate_assembly(asm, c, fused=True))
    out_x = jax.block_until_ready(xla(ctl))
    out_f = jax.block_until_ready(fus(ctl))
    np.testing.assert_allclose(np.asarray(out_f.plate_pose),
                               np.asarray(out_x.plate_pose), atol=5e-5)
    assert np.asarray(out_f.residual_norm).max() < 1e-4
    assert np.all(np.asarray(out_f.newton_iters)[1:] >= 1)

    def marginal(fn):
        def wall(c):
            jax.block_until_ready(fn(c))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(c))
                best = min(best, time.perf_counter() - t0)
            return best
        return (wall(ctl_for(1001)) - wall(ctl_for(101))) / 900

    m_x, m_f = marginal(xla), marginal(fus)
    assert m_x / m_f >= 8.0, (m_x, m_f)
