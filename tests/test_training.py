"""Training-stack tests, including loss parity vs the reference torch path."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu import apply_mod
from knode_cosserat_tpu.models import (MLPSpec, init_mlp, mlp_apply,
                                       clamp_nonnegative, bind)
from knode_cosserat_tpu.training import (make_training_data,
                                         teacher_forced_loss,
                                         TrainConfig, train_knode)
from knode_cosserat_tpu.training.train import rollout_with_nn

REF = "/root/reference/knode_cosserat"


def _torch_robot_with_weights(mod, hidden, params):
    """Build the reference torch robot and load OUR weights into it."""
    import torch
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from cosserat_ode_torch import CosseratRodTorch  # reference oracle
    from knode import setup_robot                    # reference oracle

    robot = CosseratRodTorch("cpu", hidden)
    setup_robot(robot, mod)
    robot.use_nn = True
    with torch.no_grad():
        robot.nn_models[0].weight.copy_(torch.tensor(np.asarray(params[0]["w"])))
        robot.nn_models[0].bias.copy_(torch.tensor(np.asarray(params[0]["b"])))
        robot.nn_models[2].weight.copy_(torch.tensor(np.asarray(params[1]["w"])))
        robot.nn_models[2].bias.copy_(torch.tensor(np.asarray(params[1]["b"])))
    return robot


def _reference_fast_loss(robot, traj_ref, controls, keypoints):
    """Transcription of the reference fast-path loss computation
    (physics_train.py:313-368) run through the reference robot."""
    import torch
    sys.path.insert(0, REF)
    from Utils.transformations import quaternion_to_euler as q2e  # oracle

    loss_func = torch.nn.MSELoss()
    traj = torch.tensor(traj_ref).float()
    controls = torch.tensor(controls).float()
    batch_len = traj.shape[0]
    ys = traj[: batch_len - 1, 0:19, :]
    zs = traj[: batch_len - 1, 19:, :]
    y_prevs = torch.cat((ys[:1], ys[:-1]))
    z_prevs = torch.cat((zs[:1], zs[:-1]))
    Gs = traj[1:batch_len]
    kp = np.array(keypoints)
    grow_trajs = robot.parallelGetNextSegmentEuler(Gs, kp, {
        "yh": robot.c1 * ys + robot.c2 * y_prevs,
        "zh": robot.c1 * zs + robot.c2 * z_prevs,
        "tendon_tensions": controls[: batch_len - 1],
    })
    grow_loss = 0
    for i in range(batch_len - 1):
        g = grow_trajs[i]
        t = traj[i + 1]
        grow_loss = grow_loss + (
            loss_func(g[:3], t[:3, kp])
            + loss_func(g[7:19], t[7:19, kp])
            + loss_func(q2e(g[3:7]), q2e(t[3:7, kp]))
            + loss_func(g[19:], t[19:, kp - 1]))
    return float(grow_loss / (batch_len - 1))


@pytest.mark.parametrize("mod", [None, "nsw"])
def test_loss_parity_vs_reference_torch(mod):
    """Same data + same MLP weights => same teacher-forced loss as the
    reference parallelGetNextSegmentEuler fast path (float32 tolerance)."""
    hidden = 32
    ref = apply_mod(None)
    p_mod = apply_mod(mod)
    trajs, ctls = make_training_data(ref, [("sine", 0.5)], train_len=8)
    spec = MLPSpec.for_knode(hidden)
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)

    ours = float(teacher_forced_loss(
        p_mod, spec, params,
        jnp.asarray(trajs[0], jnp.float32),
        jnp.asarray(ctls[0], jnp.float32), (3, 5, 7, 9)))

    robot = _torch_robot_with_weights(mod, hidden, params)
    # reference layout (T, 25, N)
    traj_ref = np.swapaxes(np.asarray(trajs[0]), 1, 2)
    theirs = _reference_fast_loss(robot, traj_ref, np.asarray(ctls[0]),
                                  (3, 5, 7, 9))
    assert ours == pytest.approx(theirs, rel=2e-4), (ours, theirs)


def test_mlp_init_distribution():
    spec = MLPSpec.for_knode(512)
    params = init_mlp(spec, jax.random.PRNGKey(0))
    w = np.asarray(params[0]["w"])
    assert (w >= 0).all()
    assert abs(float(w.mean()) - 0.0133) < 3e-3  # mean of |N(.01,.01)|


def test_clamp_nonnegative():
    spec = MLPSpec(dims=(4, 8, 4))
    params = init_mlp(spec, jax.random.PRNGKey(1))
    params = jax.tree.map(lambda x: x - 0.5, params)
    clamped = clamp_nonnegative(params)
    for layer in clamped:
        assert (np.asarray(layer["w"]) >= 0).all()
    # biases untouched
    assert (np.asarray(clamped[0]["b"]) < 0).any()


def test_training_reduces_loss_and_beats_baseline():
    ref = apply_mod(None)
    p_mod = apply_mod("nsw")
    trajs, ctls = make_training_data(ref, [("sine", 0.5)], train_len=10)
    cfg = TrainConfig(epochs=30, eval_every=1000, log_every=1000,
                      hidden=64, dtype="float64")
    res = train_knode(p_mod, trajs, ctls, cfg, log=None)
    assert res.loss_history[-1] < res.loss_history[0] * 0.2


def test_hybrid_rollout_runs():
    """Closed-loop rollout with the MLP in the RHS stays finite."""
    from knode_cosserat_tpu import calc_controls
    p = apply_mod("nsw")
    spec = MLPSpec.for_knode(32)
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float64)
    # scale down the random init so the residual is a perturbation
    params = jax.tree.map(lambda x: x * 0.01, params)
    ctl = calc_controls("sine", 1.0, float(p.del_t), 8)
    traj = np.asarray(rollout_with_nn(p, jnp.asarray(ctl), spec, params))
    assert np.all(np.isfinite(traj))


def test_eval_dtw_device_matches_host_selection():
    """train_knode's on-device exact validation DTW selects the same best
    epoch as the reference's host fastdtw, and values agree on these smooth
    tip trajectories."""
    from knode_cosserat_tpu.training import make_validation_reference

    ref = apply_mod(None)
    p_mod = apply_mod("nsw")
    trajs, ctls = make_training_data(ref, [("sine", 0.5)], train_len=8)
    vc, vr = make_validation_reference(ref, ("sine", 1.25), eval_len=8)
    kw = dict(epochs=6, hidden=32, dtype="float64", eval_every=2,
              log_every=1000)
    res_d = train_knode(p_mod, trajs, ctls,
                        TrainConfig(eval_dtw="device", **kw), vc, vr,
                        eval_rod=p_mod, log=None)
    res_h = train_knode(p_mod, trajs, ctls,
                        TrainConfig(eval_dtw="host", **kw), vc, vr,
                        eval_rod=p_mod, log=None)
    dd = np.array([d for _, d in res_d.dtw_history])
    dh = np.array([d for _, d in res_h.dtw_history])
    np.testing.assert_allclose(dd, dh, rtol=1e-6)
    assert np.argmin(dd) == np.argmin(dh)
    assert res_d.best_dtw == pytest.approx(res_h.best_dtw, rel=1e-6)


def test_validation_reference_accepts_both_layouts():
    """train_knode accepts the reference project's (T, 25, N) validation
    layout as well as state-last (T, N, 25) — device-DTW scoring must not
    silently transpose-garble it (advisor-style regression)."""
    from knode_cosserat_tpu.training import make_validation_reference

    ref = apply_mod(None)
    p_mod = apply_mod("nsw")
    trajs, ctls = make_training_data(ref, [("sine", 0.5)], train_len=6)
    vc, vr = make_validation_reference(ref, ("sine", 1.25), eval_len=6)
    kw = dict(epochs=2, hidden=16, dtype="float64", eval_every=2,
              log_every=1000)
    res_a = train_knode(p_mod, trajs, ctls, TrainConfig(**kw), vc, vr,
                        eval_rod=p_mod, log=None)
    vr_ref_layout = np.moveaxis(np.asarray(vr), 1, 2)    # (T, 25, N)
    res_b = train_knode(p_mod, trajs, ctls, TrainConfig(**kw), vc,
                        vr_ref_layout, eval_rod=p_mod, log=None)
    np.testing.assert_allclose([d for _, d in res_a.dtw_history],
                               [d for _, d in res_b.dtw_history],
                               rtol=1e-9)


def test_sharded_trainer_deprecated_alias():
    """ShardedTrainer is a one-round deprecation alias over
    train_knode(mesh=): it must warn on construction, still train, and
    stay single-shot (VERDICT r4 item 8)."""
    from knode_cosserat_tpu.parallel import ShardedTrainer, make_mesh

    ref = apply_mod(None)
    p_mod = apply_mod("nsw")
    trajs, ctls = make_training_data(ref, [("sine", 0.5)] * 2, train_len=6)
    with pytest.warns(DeprecationWarning, match="train_knode"):
        st = ShardedTrainer(make_mesh(data=2),  p_mod,
                            TrainConfig(epochs=2, hidden=16,
                                        dtype="float32", log_every=1000))
    losses = st.fit(np.asarray(trajs, np.float32),
                    np.asarray(ctls, np.float32), epochs=2)
    assert len(losses) == 2 and np.all(np.isfinite(losses))
    with pytest.raises(RuntimeError, match="single-shot"):
        st.fit(np.asarray(trajs, np.float32), np.asarray(ctls, np.float32),
               epochs=2)


def test_rollout_with_nn_mega_matches_xla():
    """The mega-kernel hybrid rollout (interpret) == the XLA scan rollout
    to solver tolerance — the eval fast path is trustworthy."""
    from knode_cosserat_tpu import calc_controls
    from knode_cosserat_tpu.core.fast_rollout import make_fast_rollout

    p = apply_mod("nsw", dtype=jnp.float64)
    spec = MLPSpec.for_knode(16)
    params = jax.tree.map(lambda x: x * 0.01,
                          init_mlp(spec, jax.random.PRNGKey(0),
                                   jnp.float64))
    ctl = jnp.asarray(calc_controls("sine", 1.0, float(p.del_t), 6))
    xla = np.asarray(rollout_with_nn(p, ctl, spec, params))
    roll = jax.jit(make_fast_rollout(p, spec, tol=1e-16, impl="mega",
                                     interpret=True))
    mega, _, _ = roll(ctl[None], params)
    np.testing.assert_allclose(np.asarray(mega)[0], xla, rtol=1e-6,
                               atol=1e-9)


def test_gradients_nonzero_for_all_layers():
    ref = apply_mod(None)
    p_mod = apply_mod("youngs")
    trajs, ctls = make_training_data(ref, [("sine", 0.5)], train_len=6)
    spec = MLPSpec.for_knode(16)
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float64)
    g = jax.grad(lambda q: teacher_forced_loss(
        p_mod, spec, q, trajs[0], ctls[0]))(params)
    for layer in g:
        assert float(jnp.abs(layer["w"]).max()) > 0
        assert float(jnp.abs(layer["b"]).max()) > 0


def test_deep_mlp_trains():
    """MLPSpec supports arbitrary depth (the reference had a commented-out
    5-layer variant, cosserat_ode_torch.py:63-73)."""
    from knode_cosserat_tpu.models import MLPSpec, init_mlp, mlp_apply
    spec = MLPSpec(dims=(28, 32, 64, 25), activation="softplus")
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float64)
    assert len(params) == 3
    out = mlp_apply(spec, params, jnp.ones((7, 28)))
    assert out.shape == (7, 25)

    ref = apply_mod(None)
    p_mod = apply_mod("nsw")
    trajs, ctls = make_training_data(ref, [("sine", 0.5)], train_len=6)
    g = jax.grad(lambda q: teacher_forced_loss(
        p_mod, spec, q, trajs[0], ctls[0]))(params)
    assert all(float(jnp.abs(l["w"]).max()) > 0 for l in g)


def test_history_variant_loss_parity_vs_reference_torch():
    """The 53-input [y, yh, z, zh, tf] KNODE variant
    (cosserat_ode.py:171-175, cosserat_ode_torch.py:60) matches the
    reference with identical weights."""
    import torch
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from cosserat_ode_torch import CosseratRodTorch  # reference oracle
    from knode import setup_robot                    # reference oracle

    hidden = 24
    ref = apply_mod(None)
    p_mod = apply_mod("youngs")
    trajs, ctls = make_training_data(ref, [("sine", 0.5)], train_len=6)
    spec = MLPSpec.for_knode(hidden, history=True)
    assert spec.dims[0] == 53
    params = init_mlp(spec, jax.random.PRNGKey(2), jnp.float32)

    ours = float(teacher_forced_loss(
        p_mod, spec, params,
        jnp.asarray(trajs[0], jnp.float32),
        jnp.asarray(ctls[0], jnp.float32), (3, 5, 7, 9)))

    robot = CosseratRodTorch("cpu", hidden, nn_input_history=True)
    setup_robot(robot, "youngs")
    robot.use_nn = True
    with torch.no_grad():
        robot.nn_models[0].weight.copy_(torch.tensor(np.asarray(params[0]["w"])))
        robot.nn_models[0].bias.copy_(torch.tensor(np.asarray(params[0]["b"])))
        robot.nn_models[2].weight.copy_(torch.tensor(np.asarray(params[1]["w"])))
        robot.nn_models[2].bias.copy_(torch.tensor(np.asarray(params[1]["b"])))
    traj_ref = np.swapaxes(np.asarray(trajs[0]), 1, 2)
    theirs = _reference_fast_loss(robot, traj_ref, np.asarray(ctls[0]),
                                  (3, 5, 7, 9))
    assert ours == pytest.approx(theirs, rel=2e-4), (ours, theirs)


def test_train_knode_async_checkpointing(tmp_path):
    """cfg.checkpoint_async writes checkpoints on a background thread; the
    final checkpoint is durable when train_knode returns and resumes
    identically to a sync-written one."""
    from knode_cosserat_tpu.training.checkpoint import load_checkpoint

    ref = apply_mod(None)
    p_mod = apply_mod("nsw")
    trajs, ctls = make_training_data(ref, [("sine", 0.5)], train_len=6)
    kw = dict(epochs=4, hidden=16, dtype="float64", checkpoint_every=2,
              log_every=1000)
    ck_async = str(tmp_path / "ck_async")
    ck_sync = str(tmp_path / "ck_sync")
    train_knode(p_mod, trajs, ctls,
                TrainConfig(checkpoint_async=True, **kw),
                checkpoint_path=ck_async, log=None)
    train_knode(p_mod, trajs, ctls, TrainConfig(**kw),
                checkpoint_path=ck_sync, log=None)
    tree_a, meta_a = load_checkpoint(ck_async)
    tree_s, meta_s = load_checkpoint(ck_sync)
    assert meta_a == meta_s
    for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_teacher_forced_loss_skip_first_requires_three_frames():
    """skip_first=True on a 2-frame trajectory would slice every residual
    to length 0 and mean() to NaN (advisor finding, round 3); it must
    raise instead."""
    p = apply_mod(None)
    spec = MLPSpec.for_knode(8)
    traj = jnp.zeros((2, int(p.N), 25), jnp.float32)
    ctl = jnp.zeros((2, 4), jnp.float32)
    with pytest.raises(ValueError, match="3 frames"):
        teacher_forced_loss(p, spec, None, traj, ctl, skip_first=True)
