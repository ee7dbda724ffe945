"""TPU microbenchmark: fused Pallas hybrid-RHS kernel vs the XLA path."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from knode_cosserat_tpu import apply_mod
from knode_cosserat_tpu.core.spatial import next_segment_euler
from knode_cosserat_tpu.models import MLPSpec, init_mlp, bind
from knode_cosserat_tpu.ops.pallas_rhs import make_fused_next_segment


def main(B=8192, hidden=512, iters=200):
    p = apply_mod(None, dtype=jnp.float32)
    spec = MLPSpec.for_knode(hidden)
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)
    fused = make_fused_next_segment(p, spec, block_b=512)

    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(B, 19) * 0.1, jnp.float32).at[:, 3].add(1.0)
    yh = jnp.asarray(rng.randn(B, 19), jnp.float32)
    zh = jnp.asarray(rng.randn(B, 6), jnp.float32)
    tf = jnp.asarray(rng.randn(B, 3), jnp.float32)

    jax_path = jax.jit(lambda q, a, b, c, d: next_segment_euler(
        p, a, b, c, d, nn_fn=bind(spec, q)))
    pallas_path = jax.jit(fused)

    for name, fn in [("xla", jax_path), ("pallas", pallas_path)]:
        out = fn(params, y, yh, zh, tf)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(params, y, yh, zh, tf)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        flops = 2 * B * (28 * hidden + hidden * 25)
        print(f"{name:7s}: {dt*1e6:9.1f} us/call  "
              f"{flops/dt/1e12:.2f} TFLOP/s (MLP only)")

    # numeric agreement on TPU
    a = jax_path(params, y, yh, zh, tf)
    b = pallas_path(params, y, yh, zh, tf)
    err = max(float(jnp.abs(x - z).max()) for x, z in zip(a, b))
    print("max abs diff xla vs pallas:", err)


if __name__ == "__main__":
    main()
