"""Example: ONLINE KNODE adaptation — learning the residual while the
robot runs, then handing the weights live to the MPC controller.

The reference trains offline only (physics_train.py: collect a dataset,
then fit for 2000 epochs). Here the loop is closed in a streaming
fashion:

  plant (true rod) --> telemetry, one step at a time
       --> OnlineAdapter ring buffer (last W steps)
       --> a few jitted AdamW steps of the SAME teacher-forced loss
           the offline trainer uses, per update
       --> adapted weights --> MPCController.nn_params (live handoff)

The controller's model carries deliberately wrong physics (the
reference's "damping" fault-injection mod, knode.py:22-47); the residual
learns the correction from the stream. The scoreboard below reports the
windowed one-step loss vs the physics-only baseline and the H-step tip
prediction error from true observed states — the quantity a
receding-horizon controller actually consumes.

Run: python examples/online_adaptation.py  (CPU or TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main(T: int = 200, window: int = 128, update_every: int = 2):
    from knode_cosserat_tpu.control.mpc import PlanState, rollout_tips
    from knode_cosserat_tpu.controls import calc_controls
    from knode_cosserat_tpu.core.params import apply_mod
    from knode_cosserat_tpu.core.stepper import simulate_scan
    from knode_cosserat_tpu.training.online import (OnlineAdapter,
                                                    OnlineConfig)

    plant = apply_mod(None)            # the "real robot"
    model = apply_mod("damping")       # the controller's wrong physics

    print(f"streaming {T} steps of plant telemetry "
          f"(window={window}, update every {update_every} steps)")
    ctl = calc_controls("sine", 0.5, float(plant.del_t), T)
    traj = np.asarray(simulate_scan(plant, jnp.asarray(ctl)).traj)

    ad = OnlineAdapter(model, OnlineConfig(window=window, min_fill=16,
                                           steps_per_update=4, lr=1e-3,
                                           hidden=64))
    for t in range(T):
        ad.observe(traj[t], ctl[t])
        if ad.ready and t % update_every == 0:
            loss = ad.update()
            if ad.updates % 20 == 1:
                print(f"  t={t:4d}  update {ad.updates:3d}  "
                      f"window loss {loss:.3e}")

    print(f"\nafter {ad.updates} updates:")
    print(f"  physics-only window loss : {ad.physics_loss():.3e}")
    print(f"  adapted residual loss    : {ad.window_loss():.3e}  "
          f"({ad.physics_loss() / ad.window_loss():.1f}x better)")

    # MPC-relevant check: H-step tip prediction from TRUE observed states
    H = 10
    def horizon_err(params, spec):
        errs = []
        for t0 in (60, 100, 140):
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
    print(f"\nH={H} tip prediction RMSE from observed states:")
    print(f"  wrong physics only : {e_phys * 1e3:7.2f} mm")
    print(f"  adapted hybrid     : {e_hyb * 1e3:7.2f} mm  "
          f"({e_phys / e_hyb:.1f}x better)")
    print("\nlive handoff: controller.nn_params = adapter.params "
          "(nn_params is a traced argument — no recompilation)")


if __name__ == "__main__":
    main()
