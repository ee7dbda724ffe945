"""Multi-rod assemblies (core/assembly.py).

The coupled Newton solve must (a) reduce exactly to the single-rod
free-tip problem for a massless plate with one centered rod, (b) preserve
the symmetry of a symmetric assembly, and (c) actually couple the rods —
a tension imbalance on one rod moves the shared plate.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu.controls import calc_controls
from knode_cosserat_tpu.core.assembly import (make_ring_assembly,
                                              simulate_assembly)
from knode_cosserat_tpu.core.params import make_rod
from knode_cosserat_tpu.core.stepper import simulate_scan
from knode_cosserat_tpu.models.mlp import MLPSpec, bind, init_mlp

T = 10


def test_single_rod_massless_plate_matches_free_tip():
    """M=1, massless plate, zero attachment offset == the free-tip BC."""
    asm = make_ring_assembly(n_rods=1, base_radius=0.0, N=10,
                             dtype=jnp.float64)
    ctl = jnp.asarray(calc_controls("sine", 0.5, float(asm.rods.del_t[0]),
                                    T), jnp.float64)
    ref = simulate_scan(make_rod(N=10, dtype=jnp.float64), ctl, tol=1e-24)
    out = jax.jit(lambda c: simulate_assembly(asm, c, tol=1e-24))(
        ctl[:, None, :])
    err = np.max(np.abs(np.asarray(out.traj[:, 0]) - np.asarray(ref.traj)))
    assert err < 1e-9, err
    # the solved plate pose IS the rod tip pose
    tip = np.asarray(out.traj[-1, 0, -1, :7])
    plate = np.asarray(out.plate_pose[-1])
    assert np.allclose(plate[:3], tip[:3], atol=1e-9)
    q = plate[3:] / np.linalg.norm(plate[3:])
    qt = tip[3:] / np.linalg.norm(tip[3:])
    assert min(np.abs(q - qt).max(), np.abs(q + qt).max()) < 1e-9


def test_stack_rods_rejects_mismatched_del_t():
    """The coupled step applies rod 0's BDF-2 coefficients to every rod
    and the plate; a del_t mismatch must raise, not silently converge to
    an inconsistent time discretization."""
    from knode_cosserat_tpu.core.assembly import stack_rods
    r1 = make_rod(N=6, dtype=jnp.float64)
    r2 = make_rod(N=6, dtype=jnp.float64, del_t=0.01)
    with pytest.raises(ValueError, match="del_t"):
        stack_rods([r1, r2])


def test_symmetric_ring_stays_symmetric():
    """3 rods at 120 degrees, equal tensions: the plate stays on the axis
    with identity orientation (the 4 tendon directions sum to zero, so the
    only load is gravity, which is axial)."""
    asm = make_ring_assembly(n_rods=3, base_radius=0.05, N=10,
                             dtype=jnp.float64)
    ctl = 5.0 * jnp.ones((T, 3, 4), jnp.float64)
    out = jax.jit(lambda c: simulate_assembly(asm, c, tol=1e-20))(ctl)
    assert np.asarray(out.residual_norm).max() < 1e-8
    plate = np.asarray(out.plate_pose)
    assert np.abs(plate[:, 0:2]).max() < 1e-7          # on-axis
    assert np.abs(plate[:, 4:7]).max() < 1e-7          # no rotation
    # rods 120-degrees apart see identical tip sag
    tips_z = np.asarray(out.traj[-1, :, -1, 2])
    assert np.ptp(tips_z) < 1e-7


def test_tension_imbalance_couples_through_plate():
    """Pulling one rod's tendon bends the WHOLE assembly: the other rods'
    tips move too (they are dragged by the shared plate)."""
    asm = make_ring_assembly(n_rods=3, base_radius=0.05, N=10,
                             dtype=jnp.float64)
    ctl = 5.0 * np.ones((T, 3, 4))
    ctl[:, 0, 0] = 9.0                     # extra tension, rod 0, tendon 0
    out = jax.jit(lambda c: simulate_assembly(asm, c, tol=1e-20))(
        jnp.asarray(ctl))
    assert np.asarray(out.residual_norm).max() < 1e-8
    plate = np.asarray(out.plate_pose)
    assert np.abs(plate[-1, 0:2]).max() > 1e-5         # plate moved
    # an UNCOUPLED rod 1 under its own (symmetric) tensions would not move
    # laterally; through the plate it must
    tip1_xy = np.asarray(out.traj[-1, 1, -1, 0:2])
    base1_xy = np.asarray(out.traj[0, 1, -1, 0:2])
    assert np.abs(tip1_xy - base1_xy).max() > 1e-5


def test_plate_mass_dynamics_stay_finite_and_converged():
    asm = make_ring_assembly(n_rods=3, base_radius=0.05, N=10,
                             plate_mass=0.05,
                             plate_inertia=1e-5 * np.eye(3),
                             dtype=jnp.float64)
    ctl = np.full((T, 3, 4), 5.0)
    ctl[:, :, 0] = 6.0
    out = jax.jit(lambda c: simulate_assembly(asm, c, tol=1e-18))(
        jnp.asarray(ctl))
    assert np.isfinite(np.asarray(out.traj)).all()
    assert np.asarray(out.residual_norm).max() < 1e-7
    # the massive plate's inertia resists: velocities exist after a kick
    assert np.abs(np.asarray(out.plate_pose)[1:, 2]
                  - float(asm.p_plate0[2])).max() > 1e-6


def test_hybrid_assembly_runs():
    """A shared KNODE residual rides inside every rod sweep of the coupled
    solve (hybrid parallel continuum robot)."""
    asm = make_ring_assembly(n_rods=2, base_radius=0.04, N=10,
                             dtype=jnp.float64)
    spec = MLPSpec.for_knode(16, False, "elu")
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float64)
    params = jax.tree.map(lambda x: 0.01 * x, params)
    ctl = 5.0 * jnp.ones((T, 2, 4), jnp.float64)
    out = jax.jit(lambda c: simulate_assembly(
        asm, c, nn_fn=bind(spec, params), tol=1e-18))(ctl)
    assert np.isfinite(np.asarray(out.traj)).all()
    assert np.asarray(out.residual_norm).max() < 1e-7


def test_differentiable_rollout_gradients_match_fd():
    """Gradients through the COUPLED solve (implicit function theorem at
    every step) match central finite differences."""
    asm = make_ring_assembly(n_rods=2, base_radius=0.04, N=10,
                             dtype=jnp.float64)
    ctl0 = 5.0 * jnp.ones((6, 2, 4), jnp.float64)

    def plate_x(ctl):
        out = simulate_assembly(asm, ctl, tol=1e-20, differentiable=True)
        return out.plate_pose[-1, 0]

    g = jax.grad(plate_x)(ctl0)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
    eps = 1e-6
    e = jnp.zeros_like(ctl0).at[2, 0, 0].set(1.0)
    fd = (plate_x(ctl0 + eps * e) - plate_x(ctl0 - eps * e)) / (2 * eps)
    ad = float(jnp.vdot(g, e))
    assert abs(ad - fd) < 1e-6 * max(1.0, abs(fd)), (ad, float(fd))


def test_tension_planning_through_assembly():
    """A few Adam steps on constant tensions move the plate toward a
    lateral target — gradient-based planning on a parallel continuum
    robot (no reference counterpart)."""
    import optax

    asm = make_ring_assembly(n_rods=2, base_radius=0.04, N=10,
                             dtype=jnp.float64)
    T_plan = 8
    target_xy = jnp.asarray([0.004, 0.002], jnp.float64)

    def cost(logits):
        ctl = 5.0 + 4.0 * jax.nn.sigmoid(logits)       # bounded tensions
        ctl = jnp.broadcast_to(ctl[None], (T_plan,) + ctl.shape)
        out = simulate_assembly(asm, ctl, tol=1e-18, differentiable=True)
        return jnp.sum((out.plate_pose[-1, 0:2] - target_xy) ** 2)

    logits = jnp.zeros((2, 4), jnp.float64)
    opt = optax.adam(0.5)
    state = opt.init(logits)
    step = jax.jit(lambda l, s: _planner_step(cost, opt, l, s))
    c0 = float(cost(logits))
    for _ in range(12):
        logits, state = step(logits, state)
    c1 = float(cost(logits))
    assert c1 < 0.2 * c0, (c0, c1)


def _planner_step(cost, opt, logits, state):
    g = jax.grad(cost)(logits)
    updates, state = opt.update(g, state)
    import optax
    return optax.apply_updates(logits, updates), state


def test_per_rod_nn_params_match_shared_when_equal():
    """nn_params stacked with identical rows == the shared nn_fn path; a
    heterogeneous stack (rod 1 residual zeroed) diverges from it."""
    asm = make_ring_assembly(n_rods=2, base_radius=0.04, N=10,
                             dtype=jnp.float64)
    spec = MLPSpec.for_knode(16, False, "elu")
    w = init_mlp(spec, jax.random.PRNGKey(0), jnp.float64)
    w = jax.tree.map(lambda x: 0.01 * x, w)
    ctl = 5.0 * jnp.ones((T, 2, 4), jnp.float64)

    shared = simulate_assembly(asm, ctl, nn_fn=bind(spec, w), tol=1e-18)
    stacked = jax.tree.map(lambda x: jnp.stack([x, x]), w)
    per_rod = simulate_assembly(asm, ctl, nn_spec=spec, nn_params=stacked,
                                tol=1e-18)
    err = np.max(np.abs(np.asarray(per_rod.traj) - np.asarray(shared.traj)))
    assert err < 1e-9, err

    hetero = jax.tree.map(lambda x: jnp.stack([x, jnp.zeros_like(x)]), w)
    out_h = simulate_assembly(asm, ctl, nn_spec=spec, nn_params=hetero,
                              tol=1e-18)
    assert np.asarray(out_h.residual_norm).max() < 1e-7
    diff = np.max(np.abs(np.asarray(out_h.traj) - np.asarray(shared.traj)))
    assert diff > 1e-8


def test_train_knode_on_assembly_data():
    """The teacher-forced KNODE loss is rod-local, so the EXISTING trainer
    consumes per-rod assembly trajectories unchanged — hybrid residuals
    can be fit to coupled-robot data with no new training code."""
    from knode_cosserat_tpu.training.train import TrainConfig, train_knode

    asm = make_ring_assembly(n_rods=2, base_radius=0.04, N=10,
                             dtype=jnp.float64)
    ctl = np.full((14, 2, 4), 5.0)
    ctl[:, 0, 0] = 7.0
    out = simulate_assembly(asm, jnp.asarray(ctl), tol=1e-18)
    rod0 = jax.tree.map(lambda x: x[0], asm.rods)
    traj0 = np.asarray(out.traj[:, 0, :, :25])        # (T, N, 25)
    cfg = TrainConfig(epochs=30, hidden=32, eval_every=1000,
                      log_every=1000, fused="off", seed=0)
    res = train_knode(rod0, traj0[None], np.asarray(ctl[:, 0])[None], cfg,
                      log=None)
    hist = res.loss_history
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


def test_structured_solver_matches_dense():
    """The arrowhead-structured Jacobian Newton (default) converges to the
    same trajectory as the dense-jacfwd oracle, including with a hybrid
    residual, and rejects unknown solver names."""
    asm = make_ring_assembly(n_rods=3, base_radius=0.05, N=10,
                             dtype=jnp.float64)
    spec = MLPSpec.for_knode(16, False, "elu")
    w = init_mlp(spec, jax.random.PRNGKey(1), jnp.float64)
    w = jax.tree.map(lambda x: 0.01 * x, w)
    ctl = np.full((T, 3, 4), 5.0)
    ctl[:, 0, 0] = 8.0
    ctl = jnp.asarray(ctl)
    for kw in ({}, {"nn_fn": bind(spec, w)},
               {"nn_spec": spec,
                "nn_params": jax.tree.map(
                    lambda x: jnp.stack([x, x, x]), w)}):
        dense = simulate_assembly(asm, ctl, tol=1e-20, solver="dense", **kw)
        struct = simulate_assembly(asm, ctl, tol=1e-20, solver="structured",
                                   **kw)
        assert np.asarray(struct.residual_norm).max() < 1e-9
        err = np.max(np.abs(np.asarray(dense.traj) - np.asarray(struct.traj)))
        assert err < 1e-9, (kw.keys(), err)
    with pytest.raises(ValueError):
        simulate_assembly(asm, ctl, solver="cg")


def test_mismatched_rods_raise():
    from knode_cosserat_tpu.core.assembly import stack_rods
    with pytest.raises(ValueError):
        stack_rods([make_rod(N=10), make_rod(N=12)])


# ---------------- plate contact (smoothed penalty plane) ----------------

SOFT = dict(E=2.757903e9, r=0.003175, rho=1411.7, del_t=0.05, L=0.635,
            tendon_offset=0.04445)


@pytest.fixture(scope="module")
def contact_setup():
    """Soft 2-rod ring bent sideways by tension: free swing + wall data."""
    from knode_cosserat_tpu.core.assembly import with_contact_plane
    asm = make_ring_assembly(n_rods=2, base_radius=0.04, N=8,
                             dtype=jnp.float64, plate_mass=0.05, **SOFT)
    Tc = 24
    ctl = np.zeros((Tc, 2, 4))
    ctl[:, :, 0] = 6.0
    ctl[:, :, 1] = 6.0                      # net +y body force
    ctl = jnp.asarray(ctl)
    free = simulate_assembly(asm, ctl, tol=1e-18)
    y_free = np.asarray(free.plate_pose)[:, 1]
    wall = 0.5 * float(y_free.max())
    blocked = with_contact_plane(asm, [0.0, -1.0, 0.0], -wall,
                                 k=2e4, d=50.0, beta=3000.0)
    return asm, blocked, ctl, free, wall


def test_contact_far_plane_is_exactly_no_contact(contact_setup):
    """A plane the plate never approaches must not perturb the solve at
    all (the softplus tail underflows): bit-level parity."""
    from knode_cosserat_tpu.core.assembly import with_contact_plane
    asm, _, ctl, free, _ = contact_setup
    far = with_contact_plane(asm, [0.0, -1.0, 0.0], -10.0,
                             k=2e4, d=50.0, beta=3000.0)
    out = simulate_assembly(far, ctl, tol=1e-18)
    assert np.max(np.abs(np.asarray(out.plate_pose)
                         - np.asarray(free.plate_pose))) == 0.0
    assert np.max(np.abs(np.asarray(out.traj)
                         - np.asarray(free.traj))) == 0.0


def test_contact_wall_stops_the_plate(contact_setup):
    """The free swing crosses the wall; with contact on, the plate must
    stop at it — no penetration beyond the smoothing scale, and it ends
    up pressed near the wall rather than bouncing away."""
    _, blocked, ctl, free, wall = contact_setup
    y_free = np.asarray(free.plate_pose)[:, 1]
    assert y_free.max() > 1.8 * wall        # it WOULD cross without contact
    out = simulate_assembly(blocked, ctl, tol=1e-18)
    assert np.isfinite(np.asarray(out.traj)).all()
    assert np.asarray(out.residual_norm).max() < 1e-7
    y = np.asarray(out.plate_pose)[:, 1]
    # penetration bounded by the penalty scale (k=2e4, beta=3e3: <0.5 mm)
    assert y.max() < wall + 5e-4, (y.max(), wall)
    # and the plate is actually AT the wall at the end (within ~2 mm)
    assert abs(y[-1] - wall) < 2e-3, (y[-1], wall)


def test_contact_gradients_flow(contact_setup):
    """differentiable=True composes with active contact: d(final plate y)
    / d(tension) is finite and nonzero THROUGH the contact force."""
    _, blocked, ctl, _, _ = contact_setup

    def final_y(scale):
        out = simulate_assembly(blocked, scale * ctl, tol=1e-10,
                                differentiable=True)
        return out.plate_pose[-1, 1]

    g = jax.grad(final_y)(jnp.asarray(1.0, jnp.float64))
    assert np.isfinite(float(g))
    assert abs(float(g)) > 0.0


def test_contact_structured_solver_matches_dense(contact_setup):
    """The contact wrench lives in the residual ALGEBRA, so the arrowhead
    (structured) Jacobian must see it identically to dense jacfwd."""
    _, blocked, ctl, _, _ = contact_setup
    a = simulate_assembly(blocked, ctl[:10], tol=1e-18, solver="dense")
    b = simulate_assembly(blocked, ctl[:10], tol=1e-18, solver="structured")
    assert np.max(np.abs(np.asarray(a.plate_pose)
                         - np.asarray(b.plate_pose))) < 1e-9


def test_differentiable_stats_report_stall():
    """differentiable=True used to fabricate converged=True unconditionally
    (advisor finding, round 3); converged must now follow the actual
    residual of the implicit solve."""
    from knode_cosserat_tpu.core.assembly import (AssemblyCarry,
                                                  assembly_step_carry)
    asm = make_ring_assembly(n_rods=2, base_radius=0.05, N=6,
                             dtype=jnp.float64)
    carry = AssemblyCarry.initial(asm)
    tensions = 5.0 * jnp.ones((2, 4), jnp.float64)
    _, _, _, _, ok = assembly_step_carry(asm, carry, tensions, tol=1e-16,
                                         max_iter=50, differentiable=True)
    assert bool(ok.converged)
    # zero Newton iterations at an unreachable tolerance: the solve cannot
    # have converged, and the stats must say so
    _, _, _, _, stalled = assembly_step_carry(
        asm, carry, tensions, tol=1e-30, max_iter=0, differentiable=True)
    assert not bool(stalled.converged)
    assert float(stalled.residual_norm) > 0
