"""Example: gradient-based tendon-tension optimization through the SOLVED
rollout — a capability the reference architecture cannot express (its
gradients only flow through a teacher-forced single step).

We ask: what constant tendon tensions steer the rod tip to a target point
after T steps? Solve by gradient descent on tensions THROUGH the implicit
shooting rollout (simulate_scan(differentiable=True) -> lax.custom_root).

Run: python examples/mpc_tension_optimization.py  (CPU or TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(steps: int = 8, iters: int = 60, lr: float = 0.3):
    import optax
    from knode_cosserat_tpu import apply_mod
    from knode_cosserat_tpu.core.stepper import simulate_scan

    p = apply_mod(None)

    def tip_after_rollout(tensions4):
        ctl = jnp.broadcast_to(tensions4, (steps, 4))
        out = simulate_scan(p, ctl, differentiable=True)
        return out.traj[-1, -1, :3]

    # a reachable target: the tip produced by a "secret" tension setting
    secret = jnp.asarray([6.5, 4.8, 4.0, 5.5], p.dtype)
    target = jax.lax.stop_gradient(tip_after_rollout(secret))
    print("target tip:", np.round(np.asarray(target), 4))

    def loss(tensions4):
        return jnp.sum((tip_after_rollout(tensions4) - target) ** 2)

    grad = jax.jit(jax.value_and_grad(loss))
    opt = optax.adam(lr)
    tensions = jnp.full((4,), 5.0, p.dtype)
    opt_state = opt.init(tensions)
    for it in range(iters):
        val, g = grad(tensions)
        updates, opt_state = opt.update(g, opt_state)
        tensions = jnp.clip(tensions + updates, 0.5, 12.0)
        if it % 10 == 0 or it == iters - 1:
            tip = np.asarray(tip_after_rollout(tensions))
            print(f"iter {it:3d}  loss {float(val):.3e}  tensions "
                  f"{np.round(np.asarray(tensions), 3)}  tip {np.round(tip, 4)}")

    final = np.asarray(tip_after_rollout(tensions))
    err = float(np.linalg.norm(final - np.asarray(target)))
    print(f"final tip error: {err*1000:.2f} mm")
    return err


def main_receding_horizon(horizon: int = 10, n_steps: int = 12):
    """The product controller (control/mpc.py): receding-horizon MPC
    tracking a time-varying tip reference, each plan ONE jitted program."""
    from knode_cosserat_tpu import apply_mod
    from knode_cosserat_tpu.control import (MPCController, PlanState,
                                            rollout_tips)

    p = apply_mod(None)
    # reference track: tips of a "secret" sinusoidal tension schedule
    t = np.arange(n_steps + horizon)
    u_ref = np.zeros((len(t), 4), np.float32)
    u_ref[:, 0] = 6.0 + 4.0 * np.sin(0.4 * t)
    u_ref[:, 1] = 3.0
    tips_ref, _ = rollout_tips(p, PlanState.initial(p), jnp.asarray(u_ref))
    tips_ref = np.asarray(tips_ref)

    ctl = MPCController(p, horizon=horizon, first_iters=120, replan_iters=60,
                        opt_lr=0.3, u_max=20.0)
    errs = []
    for k in range(n_steps):
        u0, info = ctl.act(tips_ref[k:k + horizon])
        e = float(np.linalg.norm(np.asarray(info["tip"]) - tips_ref[k]))
        errs.append(e)
        print(f"step {k:2d}  u {np.round(np.asarray(u0), 2)}  "
              f"tip err {e*1000:.2f} mm")
    print(f"mean tracking error: {np.mean(errs)*1000:.2f} mm")
    return float(np.mean(errs))


if __name__ == "__main__":
    main()
    print()
    main_receding_horizon()
