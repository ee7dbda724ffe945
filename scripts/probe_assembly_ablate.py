"""Locate the fused assembly kernel's cost: N-scaling (sweep-bound?) vs
M-scaling (solve-bound?) vs iteration count."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from knode_cosserat_tpu.core.assembly import (AssemblyCarry,
                                              make_ring_assembly)
from knode_cosserat_tpu.ops.pallas_assembly import make_assembly_step_kernel


def bench_step(asm, max_iter, label):
    M, N = asm.M, int(asm.rods.N)
    step = make_assembly_step_kernel(asm, tol=1e-30, max_iter=max_iter)
    c = AssemblyCarry.initial(asm)
    c1 = float(np.asarray(asm.rods.c1)[0])
    c2 = float(np.asarray(asm.rods.c2)[0])
    args = (jnp.concatenate([c.G.reshape(-1), c.pp, c.hp]),
            c1 * c.y + c2 * c.y_prev, c1 * c.z + c2 * c.z_prev,
            jnp.asarray(np.full((M, 3), 0.1), jnp.float32),
            c1 * c.pp + c2 * c.pp_prev, c1 * c.vp + c2 * c.vp_prev,
            c1 * c.hp + c2 * c.hp_prev, c1 * c.wb + c2 * c.wb_prev)

    @jax.jit
    def chain(*a):
        def body(i, s):
            X, it = s
            X2, _, _, r2, it = step(*a)
            return (X2, it)
        return jax.lax.fori_loop(0, 20, body,
                                 (a[0], jnp.zeros((), jnp.int32)))

    out = jax.block_until_ready(chain(*args))
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < 1.5:
        out = jax.block_until_ready(chain(*args))
        n += 1
    dt = (time.perf_counter() - t0) / n / 20
    print("%s: %.0f us/step (iters=%d)" % (label, dt * 1e6, int(out[1])))
    return dt


def main():
    print("backend:", jax.default_backend())
    for M, N, it in [(3, 10, 1), (3, 10, 2), (3, 10, 4), (3, 34, 2),
                     (2, 10, 2), (6, 10, 2)]:
        asm = make_ring_assembly(n_rods=M, base_radius=0.05, N=N,
                                 dtype=jnp.float32)
        bench_step(asm, it, f"M={M} N={N} max_iter={it}")


if __name__ == "__main__":
    main()
