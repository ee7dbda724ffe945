"""Isolate the fused assembly kernel's launch cost from the scan glue."""
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


def main():
    print("backend:", jax.default_backend())
    asm = make_ring_assembly(n_rods=3, base_radius=0.05, N=10,
                             dtype=jnp.float32)
    M, N = asm.M, int(asm.rods.N)
    U = 6 * M + 7
    step = make_assembly_step_kernel(asm, tol=1e-10)
    c = AssemblyCarry.initial(asm)
    c1 = float(np.asarray(asm.rods.c1)[0])
    c2 = float(np.asarray(asm.rods.c2)[0])
    yh = c1 * c.y + c2 * c.y_prev
    zh = c1 * c.z + c2 * c.z_prev
    tf = jnp.asarray(np.full((M, 3), 0.1), jnp.float32)
    X0 = jnp.concatenate([c.G.reshape(-1), c.pp, c.hp])
    pph = c1 * c.pp + c2 * c.pp_prev
    vph = c1 * c.vp + c2 * c.vp_prev
    hph = c1 * c.hp + c2 * c.hp_prev
    wbh = c1 * c.wb + c2 * c.wb_prev

    jstep = jax.jit(step)
    out = jax.block_until_ready(jstep(X0, yh, zh, tf, pph, vph, hph, wbh))
    print("iters:", int(out[4]), "r2: %.2e" % float(out[3]))
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < 2.0:
        out = jax.block_until_ready(jstep(X0, yh, zh, tf, pph, vph,
                                          hph, wbh))
        n += 1
    dt = (time.perf_counter() - t0) / n
    print("one fused step (with jit dispatch): %.1f us" % (dt * 1e6))

    # amortize dispatch: 50 identical steps chained under one jit
    @jax.jit
    def chain(X0, yh, zh, tf, pph, vph, hph, wbh):
        def body(i, x):
            X, r2, it = x
            X2, _, _, r2, it = step(X0, yh, zh, tf, pph, vph, hph, wbh)
            return (X2, r2, it)
        return jax.lax.fori_loop(0, 50, body,
                                 (X0, jnp.zeros(()), jnp.zeros((), jnp.int32)))

    out = jax.block_until_ready(chain(X0, yh, zh, tf, pph, vph, hph, wbh))
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < 2.0:
        out = jax.block_until_ready(chain(X0, yh, zh, tf, pph, vph,
                                          hph, wbh))
        n += 1
    dt = (time.perf_counter() - t0) / n / 50
    print("one fused step (amortized, kernel+prep only): %.1f us" % (dt * 1e6))


if __name__ == "__main__":
    main()
