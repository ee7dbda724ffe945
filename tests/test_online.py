"""Online KNODE adaptation (training/online.py).

The canonical KNODE experiment, run STREAMING: the plant is the true
(experimental) rod, the adapter's model carries deliberately wrong
physics (the reference's "damping" fault-injection mod, knode.py:22-47),
and telemetry arrives one step at a time. The residual must (a) learn
the window's dynamics far below the physics-only baseline and (b)
improve the short-horizon predictions an MPC would consume — from true
observed states, not the straight-rod start.

Long free rollouts of online-adapted residuals can still diverge (the
same hybrid-rollout fragility the offline pipeline's best-DTW selection
exists for, physics_train.py:163-167); the contract here is the
windowed/short-horizon one, which is what receding-horizon control
needs.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu.controls import calc_controls
from knode_cosserat_tpu.core.params import apply_mod
from knode_cosserat_tpu.core.stepper import simulate_scan
from knode_cosserat_tpu.training.online import OnlineAdapter, OnlineConfig

T = 140


@pytest.fixture(scope="module")
def plant_stream():
    """True-plant telemetry: (traj (T, N, 50), controls (T, 4))."""
    plant = apply_mod(None)
    ctl = calc_controls("sine", 0.5, float(plant.del_t), T)
    traj = np.asarray(simulate_scan(plant, jnp.asarray(ctl)).traj)
    return traj, ctl


@pytest.fixture(scope="module")
def adapted(plant_stream):
    """Stream the whole run through the adapter (model = wrong physics)."""
    traj, ctl = plant_stream
    model = apply_mod("damping")
    ad = OnlineAdapter(model, OnlineConfig(window=96, min_fill=16,
                                           steps_per_update=4, lr=1e-3,
                                           hidden=64, seed=0))
    first = None
    for t in range(T):
        ad.observe(traj[t], ctl[t])
        if ad.ready and t % 2 == 0:
            loss = ad.update()
            first = loss if first is None else first
    return model, ad, first


def test_buffer_mechanics():
    model = apply_mod("damping")
    ad = OnlineAdapter(model, OnlineConfig(window=8, min_fill=4))
    rec = np.zeros((int(model.N), 25))
    rec[:, 3] = 1.0                      # unit quaternion rows
    assert ad.update() is None           # empty buffer
    for i in range(3):
        ad.observe(rec, np.zeros(4))
    assert not ad.ready and ad.update() is None
    ad.observe(rec, np.zeros(4))
    assert ad.ready
    # wraps past window without error; update returns a finite float
    for i in range(10):
        ad.observe(rec, np.zeros(4))
    loss = ad.update()
    assert np.isfinite(loss)
    with pytest.raises(ValueError, match="record shape"):
        ad.observe(np.zeros((3, 25)), np.zeros(4))
    with pytest.raises(ValueError, match="min_fill"):
        OnlineAdapter(model, OnlineConfig(window=4, min_fill=8))


def test_skip_first_drops_the_fabricated_history_transition(plant_stream):
    """A sliding window's first transition runs on a self-prev BDF-2
    history (the reference's at-rest quirk) — fabricated mid-motion. On
    self-consistent telemetry with the TRUE rod, every true-history
    transition reproduces exactly (physics loss ~ 0); the fabricated one
    does not. skip_first must remove exactly that contamination."""
    from knode_cosserat_tpu.training.loss import teacher_forced_loss
    traj, ctl = plant_stream
    plant = apply_mod(None)
    spec = OnlineConfig().spec()
    w = jnp.asarray(traj[60:92, :, :25])      # mid-stream window
    c = jnp.asarray(ctl[60:92])
    dirty = float(teacher_forced_loss(plant, spec, None, w, c))
    clean = float(teacher_forced_loss(plant, spec, None, w, c,
                                      skip_first=True))
    assert clean < 1e-12, clean               # true histories: exact
    assert dirty > 1e3 * max(clean, 1e-30)    # fabricated one dominates


def test_config_and_input_validation():
    model = apply_mod("damping")
    with pytest.raises(ValueError, match="steps_per_update"):
        OnlineAdapter(model, OnlineConfig(steps_per_update=0))
    ad = OnlineAdapter(model, OnlineConfig(window=8, min_fill=4))
    rec = np.zeros((int(model.N), 25))
    rec[:, 3] = 1.0
    with pytest.raises(ValueError, match="control shape"):
        ad.observe(rec, 5.0)                  # scalar would broadcast
    with pytest.raises(ValueError, match="control shape"):
        ad.observe(rec, np.zeros(3))


def test_contact_plane_rejects_zero_normal():
    from knode_cosserat_tpu.core.assembly import (make_ring_assembly,
                                                  with_contact_plane)
    asm = make_ring_assembly(n_rods=2, N=6, dtype=jnp.float64)
    with pytest.raises(ValueError, match="normal"):
        with_contact_plane(asm, [0.0, 0.0, 0.0], -0.2)


def test_window_buckets_use_only_real_frames():
    """Partial fills must train on the most recent bucket of REAL frames
    — padding by repeating a frame would fabricate 'this mid-swing state
    stays put' transitions. Buckets are powers of two from min_fill, the
    full window once filled."""
    model = apply_mod("damping")
    N = int(model.N)
    ad = OnlineAdapter(model, OnlineConfig(window=12, min_fill=4))

    def rec(i):
        r = np.zeros((N, 25))
        r[:, 3] = 1.0
        r[:, 0] = i            # stamp the frame index into x
        return r

    for i in range(5):
        ad.observe(rec(i), np.zeros(4))
    t, _ = ad._ordered_window()            # count=5 -> bucket 4
    assert t.shape[0] == 4
    np.testing.assert_array_equal(t[:, 0, 0], [1, 2, 3, 4])
    for i in range(5, 9):
        ad.observe(rec(i), np.zeros(4))
    t, _ = ad._ordered_window()            # count=9 -> bucket 8
    assert t.shape[0] == 8
    np.testing.assert_array_equal(t[:, 0, 0], np.arange(1, 9))
    for i in range(9, 30):
        ad.observe(rec(i), np.zeros(4))
    t, _ = ad._ordered_window()            # full ring -> whole window
    assert t.shape[0] == 12
    np.testing.assert_array_equal(t[:, 0, 0], np.arange(18, 30))


def test_streaming_adaptation_beats_physics(adapted):
    """Windowed teacher-forced loss: adapted residual far below both the
    no-NN baseline and its own first update."""
    _, ad, first_loss = adapted
    assert ad.updates >= 50
    phys = ad.physics_loss()
    win = ad.window_loss()
    assert np.isfinite(win)
    # clean-data buckets (no fabricated padding transitions) land ~6x
    # under the physics baseline on this short stream; 4x is the margin
    assert win < phys / 4.0, (win, phys)
    assert win < first_loss / 2.0, (win, first_loss)


def test_short_horizon_prediction_improves(adapted, plant_stream):
    """H-step tip predictions from TRUE observed states (the quantity an
    MPC consumes) must beat the wrong-physics model by a clear margin."""
    from knode_cosserat_tpu.control.mpc import PlanState, rollout_tips

    traj, ctl = plant_stream
    model, ad, _ = adapted
    H = 10

    def horizon_err(params, spec):
        errs = []
        for t0 in (60, 100):
            st = PlanState(jnp.asarray(traj[t0, :, :19]),
                           jnp.asarray(traj[t0, :, 19:25]),
                           jnp.asarray(traj[t0 - 1, :, :19]),
                           jnp.asarray(traj[t0 - 1, :, 19:25]),
                           jnp.zeros(6, model.dtype),
                           jnp.zeros(6, model.dtype))
            tips, _ = rollout_tips(model, st, jnp.asarray(ctl[t0:t0 + H]),
                                   spec, params)
            true = traj[t0 + 1:t0 + H + 1, -1, 0:3]
            errs.append(np.sqrt(np.mean(
                np.sum((np.asarray(tips) - true) ** 2, -1))))
        return float(np.mean(errs))

    e_phys = horizon_err(None, None)
    e_hyb = horizon_err(ad.params, ad.spec)
    assert np.isfinite(e_hyb)
    assert e_hyb < e_phys / 3.0, (e_hyb, e_phys)


def test_mpc_handoff_contract(adapted):
    """The controller consumes adapter weights live: nn_params is a traced
    argument of MPCController's advance step, so assigning
    controller.nn_params takes effect without a retrace."""
    from knode_cosserat_tpu.control import MPCController

    model, ad, _ = adapted
    ctl_r = MPCController(model, horizon=4, spec=ad.spec,
                          nn_params=ad.params, first_iters=2,
                          replan_iters=2)
    tgt = np.tile(np.array([0.0, 0.0, float(model.L)]), (4, 1))
    u0, info = ctl_r.act(tgt)
    ctl_r.nn_params = ad.params          # live weight swap
    u1, _ = ctl_r.act(tgt)
    assert np.all(np.isfinite(np.asarray(u0)))
    assert np.all(np.isfinite(np.asarray(u1)))
    assert ctl_r._step._cache_size() == 1


def test_adversarial_window_cannot_reach_mpc(adapted, plant_stream):
    """VERDICT-r3 #4: the online->MPC seam is guarded. After clean
    streaming certifies weights, garbage telemetry (the adversarial/noisy
    window) must never certify — the free-rollout probe and the
    loss-vs-physics gate both refuse it — and the sanctioned handoff
    (certified_params / handoff_to) keeps delivering weights whose
    MPC-horizon free rollout is finite and physically bounded."""
    from knode_cosserat_tpu.control.mpc import PlanState, rollout_tips

    traj, ctl = plant_stream
    model, ad, _ = adapted
    # clean streaming certified at least once, and certified weights pass
    # the probe's own contract from a TRUE state
    assert ad.certified_updates > 0
    assert ad.certified_params is not None
    cert_before = ad.certified_updates
    certified = ad.certified_params

    # the fixture is module-scoped: restore all mutable state afterwards
    import jax
    snap = (jax.tree.map(np.copy, ad.params),
            jax.tree.map(np.copy, ad.opt_state),
            ad._traj.copy(), ad._ctrl.copy(), ad._head, ad._count,
            ad._guard.best_loss, ad.rejected_updates, ad.last_reject_reason)
    try:
        # --- adversarial phase: large non-physical garbage telemetry ---
        rng = np.random.default_rng(7)
        N = int(model.N)
        for i in range(24):
            garbage = 1e3 * rng.standard_normal((N, 25))
            ad.observe(garbage, rng.uniform(0, 20, 4))
            if i % 2 == 1:
                ad.update()
        assert ad.certified_updates == cert_before, \
            "garbage window was certified for handoff"
        assert ad.rejected_updates > 0
        assert ad.last_reject_reason is not None
        # the sanctioned handoff still hands out the last CLEAN certification
        assert ad.certified_params is certified
    finally:
        (ad.params, ad.opt_state, traj_s, ctrl_s, ad._head, ad._count,
         ad._guard.best_loss, ad.rejected_updates,
         ad.last_reject_reason) = snap
        ad._traj[:], ad._ctrl[:] = traj_s, ctrl_s

    class _Ctl:                      # anything with .nn_params
        nn_params = "sentinel"

    c = _Ctl()
    assert ad.handoff_to(c)
    assert c.nn_params is certified

    # what MPC consumes from the certified weights stays finite + bounded
    t0 = 100
    st = PlanState(jnp.asarray(traj[t0, :, :19]),
                   jnp.asarray(traj[t0, :, 19:25]),
                   jnp.asarray(traj[t0 - 1, :, :19]),
                   jnp.asarray(traj[t0 - 1, :, 19:25]),
                   jnp.zeros(6, model.dtype), jnp.zeros(6, model.dtype))
    tips, _ = rollout_tips(model, st, jnp.asarray(ctl[t0:t0 + 10]),
                           ad.spec, certified)
    tips = np.asarray(tips)
    assert np.all(np.isfinite(tips))
    assert np.linalg.norm(tips, axis=-1).max() <= 2.0 * float(model.L)


def test_guard_rolls_back_on_divergent_loss():
    """Non-finite / exploding window loss triggers GuardedTraining rollback
    (params stay finite) instead of poisoning the stream."""
    model = apply_mod("damping")
    N = int(model.N)
    ad = OnlineAdapter(model, OnlineConfig(window=8, min_fill=4,
                                           steps_per_update=1, lr=1e-3))
    rec = np.zeros((N, 25))
    rec[:, 3] = 1.0
    for _ in range(4):
        ad.observe(rec, np.full(4, 5.0))
    ad.update()                       # benign baseline
    bad = np.full((N, 25), np.nan)
    for _ in range(4):
        ad.observe(bad, np.full(4, 5.0))
    ad.update()
    assert ad.rejected_updates > 0
    assert ad.certified_params is None or all(
        bool(np.isfinite(np.asarray(p)).all())
        for layer in ad.certified_params for p in layer.values())
    # raw params were rolled back to the finite snapshot
    assert all(bool(np.isfinite(np.asarray(p)).all())
               for layer in ad.params for p in layer.values())
    assert not ad.handoff_to(type("C", (), {"nn_params": None})()) \
        or ad.certified_params is not None


def test_handoff_refuses_until_certified():
    """Before any update passes certification, handoff_to is a no-op."""
    model = apply_mod("damping")
    ad = OnlineAdapter(model, OnlineConfig(window=8, min_fill=4))
    sentinel = object()

    class _Ctl:
        nn_params = sentinel

    c = _Ctl()
    assert ad.certified_params is None
    assert not ad.handoff_to(c)
    assert c.nn_params is sentinel


def test_online_sysid_tracks_stiffness_drift():
    """Streaming physical-parameter tracking (OnlineSysId): starting from
    the 'youngs' fault the live E estimate converges to the plant's E;
    when the plant's stiffness then drops 40% (material softening), the
    estimate follows — interpretable drift/damage detection the opaque
    residual cannot give."""
    from knode_cosserat_tpu.core.params import derive, experimental_rod
    from knode_cosserat_tpu.training.online import (OnlineSysId,
                                                    OnlineSysIdConfig)

    plant_a = experimental_rod()
    E_a = float(np.asarray(plant_a.E))
    ctl = calc_controls("sine", 1.0, float(plant_a.del_t), 60)
    traj_a = np.asarray(simulate_scan(plant_a, jnp.asarray(ctl)).traj)

    model = experimental_rod("youngs")          # starts 3.6x wrong
    tr = OnlineSysId(model, OnlineSysIdConfig(fields=("E",), window=32,
                                              min_fill=8,
                                              steps_per_update=8, lr=0.1))
    for t in range(60):
        tr.observe(traj_a[t], ctl[t])
        if tr.ready:
            tr.update()
    est_a = float(tr.values()["E"])
    assert abs(np.log(est_a / E_a)) < 0.1, (est_a, E_a)
    # fitted rod carries consistent derived terms
    np.testing.assert_allclose(float(np.asarray(tr.rod.Kse[2, 2])),
                               est_a * float(np.asarray(tr.rod.A)),
                               rtol=1e-10)

    # plant softens: E drops 40%
    plant_b = derive(plant_a.replace(E=0.6 * E_a))
    traj_b = np.asarray(simulate_scan(plant_b, jnp.asarray(ctl)).traj)
    for t in range(60):
        tr.observe(traj_b[t], ctl[t])
        if tr.ready:
            tr.update()
    est_b = float(tr.values()["E"])
    assert abs(np.log(est_b / (0.6 * E_a))) < 0.15, (est_b, 0.6 * E_a)
    assert est_b < 0.8 * est_a                   # the drop was detected


def test_online_sysid_validation_and_reset():
    from knode_cosserat_tpu.core.params import experimental_rod
    from knode_cosserat_tpu.training.online import (OnlineSysId,
                                                    OnlineSysIdConfig)

    model = experimental_rod("youngs")
    with pytest.raises(ValueError, match="steps_per_update"):
        OnlineSysId(model, OnlineSysIdConfig(steps_per_update=0))
    with pytest.raises(ValueError, match="min_fill"):
        OnlineSysId(model, OnlineSysIdConfig(window=4, min_fill=8))

    tr = OnlineSysId(model, OnlineSysIdConfig(window=8, min_fill=4))
    assert tr.update() is None                  # not ready
    rec = np.zeros((int(model.N), 25))
    rec[:, 2] = np.linspace(0, float(model.L), int(model.N))
    rec[:, 3] = 1.0
    rec[:, 21] = 1.0
    for _ in range(4):
        tr.observe(rec, np.full(4, 5.0))
    assert tr.ready
    tr.reset_buffer()
    assert not tr.ready                         # buffer dropped...
    same = tr.values()["E"]                     # ...estimate untouched
    assert np.isfinite(same)
