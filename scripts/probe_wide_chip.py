"""On-chip probe for the streamed wide-hidden fused trainer: does the
Mosaic lowering compile at hidden >= 1024 (where the VMEM-resident kernel
measurably fails, fused_trainer_supported docstring), and what eps/MFU
does it reach at the train-real cell count?

Usage: python scripts/probe_wide_chip.py [hidden ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from knode_cosserat_tpu import apply_mod
from knode_cosserat_tpu.models import init_mlp
from knode_cosserat_tpu.ops.pallas_train_wide import (
    make_wide_training_run, wide_trainer_supported)
from knode_cosserat_tpu.training import TrainConfig

# repo MFU convention (scripts/roofline_study.py, bench.py): bf16 peak
PEAK = 197e12


def main():
    hiddens = [int(a) for a in sys.argv[1:]] or [1024, 8192]
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    p = apply_mod(None)
    N = int(p.N)
    B, T = 4, 120                      # train-real shape: 4*119*4 = 1904
    trajs = jnp.asarray(rng.normal(size=(B, T, N, 25)) * 0.01, jnp.float32)
    ctls = jnp.asarray(rng.uniform(1, 3, size=(B, T, 4)), jnp.float32)
    E = 200
    xla_too = os.environ.get("PROBE_XLA", "1") == "1"
    for hidden in hiddens:
        cfg = TrainConfig(epochs=E, hidden=hidden, dtype="float32",
                          history=True)
        spec = cfg.spec()
        n_cells = B * (T - 1) * len(cfg.keypoints)
        assert wide_trainer_supported(spec, n_cells), hidden
        params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)
        din = spec.dims[0]
        flops = 2.0 * n_cells * hidden * (2 * din + 75)   # 5-matmul model

        def measure(runner, call):
            t0 = time.perf_counter()
            out = call(runner)
            jax.block_until_ready(out)
            t_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = call(runner)
            jax.block_until_ready(out)
            wall = time.perf_counter() - t0
            return t_compile, E / wall, out

        run = make_wide_training_run(p, spec, cfg, E)
        t_c, eps, losses = measure(
            run, lambda r: r(params, trajs, ctls)[1])
        print(f"hidden={hidden} wide: compile {t_c:.1f}s, "
              f"{eps:,.0f} eps, model MFU {flops * eps / PEAK * 100:.2f}% "
              f"(loss[0]={float(losses[0]):.3e}, "
              f"finite={bool(np.isfinite(np.asarray(losses)).all())})")
        if xla_too:
            from knode_cosserat_tpu.training.train import (make_epoch_scan,
                                                           make_optimizer)
            opt = make_optimizer(cfg)
            st = opt.init(params)
            scan = make_epoch_scan(p, spec, opt, cfg.keypoints,
                                   cfg.clamp_weights, E)
            t_c, eps, _ = measure(
                scan, lambda r: r(params, st, trajs, ctls)[2])
            print(f"hidden={hidden} xla : compile {t_c:.1f}s, "
                  f"{eps:,.0f} eps, model MFU "
                  f"{flops * eps / PEAK * 100:.2f}%")


if __name__ == "__main__":
    main()
