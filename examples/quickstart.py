"""Quickstart: the full KNODE-Cosserat workflow in ~60 lines.

1. Simulate the reference rod (training data).
2. Train the KNODE residual to correct deliberately-wrong physics —
   the ENTIRE training run is one fused TPU kernel when supported.
3. Evaluate: batched rollouts through the mega step kernel + DTW.

Run: python examples/quickstart.py          (TPU or KNODE_PLATFORM=cpu)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("KNODE_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["KNODE_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from knode_cosserat_tpu import apply_mod, calc_controls
    from knode_cosserat_tpu.core.fast_rollout import make_fast_rollout
    from knode_cosserat_tpu.evaluation import tip_dtw
    from knode_cosserat_tpu.models import init_mlp
    from knode_cosserat_tpu.ops.pallas_train import (
        fused_trainer_supported, make_fused_training_run)
    from knode_cosserat_tpu.training import (TrainConfig, make_epoch_scan,
                                             make_optimizer,
                                             make_training_data,
                                             rollout_with_nn)

    on_cpu = jax.default_backend() == "cpu"

    # 1. training data from the TRUE physics
    reference = apply_mod(None)
    trajs, ctls = make_training_data(reference, [("sine", 0.5),
                                                 ("sine", 1.0)])
    # 2. train the residual on a rod with WRONG physics (no gravity)
    wrong = apply_mod("nsw")
    cfg = TrainConfig(epochs=500, hidden=128, dtype="float32")
    spec = cfg.spec()
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)
    t0 = time.perf_counter()
    n_cells = trajs.shape[0] * (trajs.shape[1] - 1) * len(cfg.keypoints)
    if not on_cpu and fused_trainer_supported(spec, n_cells):
        run = make_fused_training_run(wrong, spec, cfg, cfg.epochs)
        params, losses, _ = run(params, trajs, ctls)
    else:
        opt = make_optimizer(cfg)
        run = make_epoch_scan(wrong, spec, opt, cfg.keypoints,
                              cfg.clamp_weights, cfg.epochs)
        params, _, losses = run(params, opt.init(params),
                                jnp.asarray(trajs, jnp.float32),
                                jnp.asarray(ctls, jnp.float32))
    jax.block_until_ready(jax.tree.leaves(params)[0])
    print(f"trained {cfg.epochs} epochs in {time.perf_counter()-t0:.1f}s: "
          f"loss {float(losses[0]):.2e} -> {float(losses[-1]):.2e}")

    # 3. evaluate on an unseen control schedule
    from knode_cosserat_tpu import simulate
    val = calc_controls("sine", 1.25, float(reference.del_t), 100)
    truth = np.asarray(simulate(reference, val))
    no_nn = np.asarray(simulate(wrong, val))
    hybrid = np.asarray(rollout_with_nn(wrong, jnp.asarray(val), spec,
                                        params))
    d0 = tip_dtw(no_nn, truth)
    d1 = tip_dtw(hybrid, truth)
    print(f"validation tip DTW: wrong physics {d0:.3f} -> "
          f"KNODE hybrid {d1:.3f} ({100*(d1-d0)/d0:+.1f}%)")

    # bonus: batched rollouts through the mega step kernel
    B = 64
    cs = jnp.asarray(np.stack([
        calc_controls("sine", 0.5 + 0.02 * i, float(reference.del_t), 50)
        for i in range(B)]), jnp.float32)
    roll = jax.jit(make_fast_rollout(
        reference, tol=1e-10, impl="xla" if on_cpu else "mega"))
    out = roll(cs)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    out = roll(cs)
    jax.block_until_ready(out[0])
    dt = time.perf_counter() - t0
    print(f"batched rollout: {B} rods x 49 steps in {dt*1e3:.1f} ms "
          f"({B*49/dt:,.0f} steps/s)")


if __name__ == "__main__":
    main()
