"""TPU benchmark: fused-sweep Pallas rollout vs the XLA scan rollout."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from knode_cosserat_tpu import experimental_rod, calc_controls
from knode_cosserat_tpu.core.fast_rollout import make_fast_rollout
from knode_cosserat_tpu.core.stepper import simulate_scan


def main(N=40, B=256, T=50, dtype="float32"):
    p = experimental_rod(N=N, dtype=jnp.dtype(dtype))
    ctls = jnp.asarray(np.stack([
        calc_controls("sine", 0.5 + 0.01 * i, float(p.del_t), T)
        for i in range(B)]), dtype)

    xla = jax.jit(jax.vmap(lambda c: simulate_scan(p, c, tol=1e-10).traj))
    fast = jax.jit(make_fast_rollout(p, tol=1e-10, block_b=min(512, B * 7)))
    mega = jax.jit(make_fast_rollout(p, tol=1e-10, block_b=min(256, B),
                                     impl="mega"))

    results = {}
    rows = ([("xla", xla, ctls)] if N <= 40 else []) + \
        ([("pallas", fast, ctls)] if N <= 40 else []) + \
        [("mega", mega, ctls)]
    for name, fn, arg in rows:
        t0 = time.perf_counter()
        out = fn(arg)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(arg)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        sps = B * (T - 1) / dt
        results[name] = out[0] if isinstance(out, tuple) else out
        print(f"N={N} {name:7s}: {sps:>10,.0f} steps/s "
              f"(compile {compile_s:.0f}s)", flush=True)

    if "xla" in results:
        a = np.asarray(results["xla"])      # (B, T, N, 50)
        for other in ("pallas", "mega"):
            b = np.asarray(results[other])
            print(f"max |{other} - xla| positions:",
                  float(np.abs(a[..., :3] - b[..., :3]).max()))


if __name__ == "__main__":
    for N in (10, 40, 80):
        main(N=N)
