"""MPC over the differentiable rollout (control/mpc.py).

The planner must (a) propagate gradients through the implicit BDF-2
rollout, (b) recover a reachable tension schedule from tip targets alone,
and (c) track in a receding-horizon loop. All tests use a small rod and
short horizons so the suite stays CPU-fast.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from knode_cosserat_tpu.control import (MPCController, PlanState,
                                        make_planner, rollout_tips)
from knode_cosserat_tpu.core.params import make_rod

H = 10


@pytest.fixture(scope="module")
def rod():
    return make_rod(N=6, dtype=jnp.float32)


@pytest.fixture(scope="module")
def target(rod):
    """Tip track of a known, reachable tension schedule."""
    u_true = np.zeros((H, 4), np.float32)
    u_true[:, 0] = np.linspace(2.0, 12.0, H)
    tips, _ = rollout_tips(rod, PlanState.initial(rod),
                           jnp.asarray(u_true))
    return u_true, np.asarray(tips)


def test_rollout_tips_gradients_flow(rod, target):
    _, tips_t = target
    state = PlanState.initial(rod)

    def cost(u):
        tips, _ = rollout_tips(rod, state, u)
        return jnp.mean(jnp.sum((tips - tips_t) ** 2, axis=-1))

    g = jax.grad(cost)(jnp.ones((H, 4), jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_planner_recovers_reachable_target(rod, target):
    _, tips_t = target
    plan = make_planner(rod, H, opt_iters=120, opt_lr=0.4, u_max=20.0,
                        w_du=0.0)
    result = plan(PlanState.initial(rod), tips_t)
    costs = np.asarray(result.cost_history)
    assert np.all(np.isfinite(costs))
    # large improvement over the mid-range initial guess...
    assert costs[-1] < costs[0] / 20.0
    # ...and the tip track is recovered to sub-millimeter mean error
    err = np.sqrt(np.mean(np.sum((np.asarray(result.tips) - tips_t) ** 2,
                                 axis=-1)))
    assert err < 1e-3, err
    # box constraint holds by construction
    u = np.asarray(result.tensions)
    assert u.min() >= 0.0 and u.max() <= 20.0


def test_multistart_planner_never_loses_to_single(rod, target):
    """Restart 0 of the multi-start planner IS the single warm start, so
    the winning restart's cost can never exceed the single plan's; the
    result keeps the single-plan shape contract (one schedule, not R)."""
    from knode_cosserat_tpu.control import make_multistart_planner

    _, tips_t = target
    kw = dict(opt_iters=30, opt_lr=0.4, u_max=20.0, w_du=0.0)
    single = make_planner(rod, H, **kw)
    multi = make_multistart_planner(rod, H, restarts=4, **kw)
    r1 = single(PlanState.initial(rod), tips_t)
    rm = multi(PlanState.initial(rod), tips_t, jax.random.PRNGKey(0))
    assert rm.tensions.shape == (H, 4)
    assert rm.tips.shape == (H, 3)
    assert np.isfinite(float(rm.cost))
    assert float(rm.cost) <= float(r1.cost) * (1 + 1e-6), \
        (float(rm.cost), float(r1.cost))


def test_controller_advance_step_is_cached(rod, target):
    """act() must reuse ONE compiled advance step: a fresh jit(partial)
    per call (the old code) missed the trace cache every time and
    recompiled the implicit BDF-2 solve at every control step."""
    _, tips_t = target
    ctl = MPCController(rod, horizon=4, first_iters=2, replan_iters=2,
                        opt_lr=0.4)
    for t in range(3):
        ctl.act(tips_t[:4])
    assert ctl._step._cache_size() == 1


@pytest.mark.slow
def test_receding_horizon_tracks(rod, target):
    """Closed loop: after a few MPC steps the model tip is closer to the
    (moving) target track than the uncontrolled straight rod."""
    _, tips_t = target
    ctl = MPCController(rod, horizon=H, first_iters=80, replan_iters=20,
                        opt_lr=0.4, u_max=20.0, w_du=1e-5)
    n_steps = 4
    errs = []
    for t in range(n_steps):
        # moving window into the target track (pad by repeating the end)
        idx = np.minimum(np.arange(t, t + H), len(tips_t) - 1)
        u0, info = ctl.act(tips_t[idx])
        errs.append(float(np.linalg.norm(np.asarray(info["tip"])
                                         - tips_t[t])))
        assert np.all(np.isfinite(np.asarray(u0)))
    # uncontrolled error: straight-rod tip vs the same targets
    straight_tip = np.array([0.0, 0.0, float(rod.L)])
    base_err = float(np.mean([np.linalg.norm(straight_tip - tips_t[t])
                              for t in range(n_steps)]))
    assert np.mean(errs) < base_err
    assert errs[-1] < 2e-3, errs
