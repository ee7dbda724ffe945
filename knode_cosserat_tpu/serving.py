"""Serving: ahead-of-time-compiled steppers for control loops.

Production deployment of the simulator/hybrid model means calling one BDF-2
step (or a short horizon) at fixed shapes inside a real-time-ish loop —
e.g. model-predictive control of the physical robot through hw/bridge, or
digital-twin evaluation next to the firmware. This module AOT-compiles
those fixed-shape programs once (jit(...).lower().compile()) so first-call
latency is paid at build time, and keeps per-call overhead to a single
device dispatch.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core.params import RodParams
from .core.shooting import newton_solve
from .core.spatial import integrate_euler, tip_residual
from .core.stepper import initial_state
from .models.mlp import MLPSpec, bind

__all__ = ["StepState", "CompiledStepper"]


@dataclasses.dataclass
class StepState:
    """Carry of the BDF-2 recurrence for one (possibly batched) rod."""
    y: jnp.ndarray        # (..., N, 19)
    z: jnp.ndarray        # (..., N, 6)
    y_prev: jnp.ndarray
    z_prev: jnp.ndarray
    G: jnp.ndarray        # (..., 6)


class CompiledStepper:
    """AOT-compiled single BDF-2 step of the (hybrid) rod.

    Args:
      p: rod parameters (fixed at compile time).
      spec/nn_params: optional KNODE residual (weights are a runtime input,
        so retraining does NOT require recompilation).
      batch: None for a single rod or an int for a batch of rods stepping
        together (vmap, e.g. MPC candidate rollouts).
    """

    def __init__(self, p: RodParams, spec: Optional[MLPSpec] = None,
                 nn_params=None, batch: Optional[int] = None,
                 tol: float = 1e-10, max_iter: int = 20,
                 fast: bool = False, fast_impl: Optional[str] = None):
        self.p = p
        self.spec = spec
        self.batch = batch
        self._nn_params = nn_params
        self._fast = fast

        if fast:
            # fused-sweep path: one Pallas launch per Newton phase
            # (core/fast_rollout.make_fast_step); ~an order of magnitude
            # lower step latency than the scan path on TPU
            from .core.fast_rollout import make_fast_step
            impl = fast_impl or ("xla" if jax.default_backend() == "cpu"
                                 else "mega")
            inner = make_fast_step(p, spec, tol=tol, max_iter=max_iter,
                                   impl=impl)

            def one_step(nn_params, y, z, y_prev, z_prev, G, tensions):
                batched = y.ndim == 3
                up = (lambda a: a) if batched else (lambda a: a[None])
                down = (lambda a: a) if batched else (lambda a: a[0])
                y_n, z_n, G_n, r2, _ = inner(up(y), up(z), up(y_prev),
                                             up(z_prev), up(G), up(tensions),
                                             nn_params)
                return (down(y_n), down(z_n), down(G_n),
                        jnp.sqrt(jnp.max(r2)))

            fn = one_step
        else:
            def one_step(nn_params, y, z, y_prev, z_prev, G, tensions):
                nn_fn = bind(spec, nn_params) if spec is not None else None
                yh = p.c1 * y + p.c2 * y_prev
                zh = p.c1 * z + p.c2 * z_prev
                tf = jnp.einsum("t,tc->c", tensions,
                                jnp.asarray(p.tendon_dirs, tensions.dtype),
                                precision=jax.lax.Precision.HIGHEST)

                def res(Gx):
                    yi, _ = integrate_euler(p, Gx, yh, zh, tf, nn_fn)
                    return tip_residual(p, yi)

                G_new, stats = newton_solve(res, G, tol=tol,
                                            max_iter=max_iter)
                y_new, z_body = integrate_euler(p, G_new, yh, zh, tf, nn_fn)
                z_new = jnp.concatenate([z_body, z[-1:]], axis=0)
                return y_new, z_new, G_new, stats.residual_norm

            fn = one_step
            if batch is not None:
                fn = jax.vmap(one_step, in_axes=(None, 0, 0, 0, 0, 0, 0))

        state = self.reset()
        tensions = self._tensions_like()
        self._compiled = (
            jax.jit(fn)
            .lower(nn_params, state.y, state.z, state.y_prev, state.z_prev,
                   state.G, tensions)
            .compile())
        self.compile_cost = self._compiled.cost_analysis()

    def _tensions_like(self):
        shape = (4,) if self.batch is None else (self.batch, 4)
        return jnp.zeros(shape, self.p.dtype)

    def reset(self) -> StepState:
        y0, z0 = initial_state(self.p)
        G0 = jnp.zeros(6, self.p.dtype)
        if self.batch is not None:
            rep = lambda a: jnp.broadcast_to(a, (self.batch,) + a.shape)
            y0, z0, G0 = rep(y0), rep(z0), rep(G0)
        return StepState(y=y0, z=z0, y_prev=y0, z_prev=z0, G=G0)

    def step(self, state: StepState, tensions) -> Tuple[StepState, dict]:
        """Advance one del_t. tensions: (4,) or (batch, 4) newtons."""
        tensions = jnp.asarray(tensions, self.p.dtype)
        y_new, z_new, G_new, res = self._compiled(
            self._nn_params, state.y, state.z, state.y_prev, state.z_prev,
            state.G, tensions)
        new = StepState(y=y_new, z=z_new, y_prev=state.y, z_prev=state.z,
                        G=G_new)
        return new, {"residual": res}

    def benchmark(self, n: int = 100, reps: int = 3) -> dict:
        """Steady-state latency of the compiled step: best of ``reps``
        timed loops of ``n`` steps (a remote-attached chip — e.g. the axon
        tunnel — adds host-round-trip jitter that a single loop can double;
        the min is the honest dispatch+device time)."""
        state = self.reset()
        tensions = self._tensions_like() + 5.0
        state, _ = self.step(state, tensions)  # warm
        jax.block_until_ready(state.y)
        dt = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                state, _ = self.step(state, tensions)
            jax.block_until_ready(state.y)
            dt = min(dt, (time.perf_counter() - t0) / n)
        # Dispatch floor: the same chained-dependency loop on a trivial
        # compiled program. On a remote-attached chip (axon tunnel) this
        # is almost all of the step latency — publishing it lets a reader
        # split `latency_ms` into transport RTT vs device work, and
        # explains why the metric swings between sessions while the
        # device-side rollout rates do not.
        tiny = (jax.jit(lambda x: x + 1.0)
                .lower(jnp.zeros((), self.p.dtype)).compile())
        x = tiny(jnp.zeros((), self.p.dtype))
        jax.block_until_ready(x)
        floor = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                x = tiny(x)
            jax.block_until_ready(x)
            floor = min(floor, (time.perf_counter() - t0) / n)
        return {"latency_ms": dt * 1e3,
                "dispatch_floor_ms": floor * 1e3,
                "steps_per_sec": (self.batch or 1) / dt,
                "realtime_factor": float(self.p.del_t) / dt}
