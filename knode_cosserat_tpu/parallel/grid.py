"""Experiment-grid training: the (data x mod x seed) sweep as ONE program.

Replaces the reference orchestrator physics_multitrain.py:85-157, which
fan-outs `physics_train.py` subprocesses in batches of 2 and regex-parses
their stdout. Here every grid cell is a vmap lane: rod parameters (the mods
are just different RodParams leaf values with identical structure), data,
and per-seed MLP params all stack, and the grid axis shards over the mesh's
"data" axis. One jit step trains the WHOLE grid per epoch.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.params import RodParams, apply_mod
from ..models.mlp import MLPSpec, clamp_nonnegative, init_mlp
from ..training.data import TrajSpec, make_training_data, parse_traj_specs
from ..training.loss import teacher_forced_loss
from ..training.train import TrainConfig, make_optimizer
from .mesh import data_sharding

__all__ = ["GridCell", "GridResult", "grid_train", "build_grid"]


@dataclasses.dataclass(frozen=True)
class GridCell:
    data: str            # trajectory spec string, e.g. "sine sine 0.5 1.0"
    mod: Optional[str]   # parameter perturbation
    seed: int


@dataclasses.dataclass
class GridResult:
    cells: List[GridCell]
    params: list                 # per-cell MLP params (unstacked)
    loss_history: np.ndarray     # (epochs, n_cells)
    spec: MLPSpec


def build_grid(datas: Sequence[str], mods: Sequence[Optional[str]],
               n_seeds: int) -> List[GridCell]:
    """Grid enumeration order matching physics_multitrain.py:144-150."""
    return [GridCell(d, m, s)
            for d in datas for m in mods for s in range(n_seeds)]


def _stack_pytrees(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def grid_train(
    cells: Sequence[GridCell],
    cfg: TrainConfig,
    reference_rod: Optional[RodParams] = None,
    train_len: int = 30,
    mesh=None,
    original: bool = False,
    log=None,
) -> GridResult:
    """Train every grid cell simultaneously.

    Data generation (per unique data spec) runs once on the reference rod;
    each cell's trajectories get cell-specific noise drawn from its seed,
    mirroring the per-process torch.manual_seed in the reference
    (physics_train.py:180, --noise_traj/controls).
    """
    if reference_rod is None:
        reference_rod = apply_mod(None, original=original)
    dtype = jnp.dtype(cfg.dtype)
    spec = cfg.spec()

    # --- per-unique-data trajectories (reference-rod rollouts) ---
    unique_datas = sorted({c.data for c in cells})
    data_cache = {}
    for d in unique_datas:
        specs = parse_traj_specs(d.split(" "))
        data_cache[d] = make_training_data(reference_rod, specs,
                                           train_len=train_len)

    # Cells whose data specs have different trajectory counts can't stack
    # into one program; partition into same-shape sub-grids and merge.
    n_traj_of = {d: len(v[0]) for d, v in data_cache.items()}
    counts = sorted({n_traj_of[c.data] for c in cells})
    if len(counts) > 1:
        results = {}
        spec_out = None
        for n in counts:
            sub = [c for c in cells if n_traj_of[c.data] == n]
            r = grid_train(sub, cfg, reference_rod=reference_rod,
                           train_len=train_len, mesh=mesh,
                           original=original, log=log)
            spec_out = r.spec
            for c, pr, lh in zip(r.cells, r.params, r.loss_history.T):
                results[c] = (pr, lh)
        params = [results[c][0] for c in cells]
        losses = np.stack([results[c][1] for c in cells], axis=1)
        return GridResult(cells=list(cells), params=params,
                          loss_history=losses, spec=spec_out)

    # --- stack everything along the grid axis ---
    rods = _stack_pytrees([apply_mod(c.mod, original=original).replace(
        N=reference_rod.N) for c in cells])
    trajs = jnp.stack([jnp.asarray(data_cache[c.data][0], dtype)
                       for c in cells])          # (G, n_traj, T, N, 25)
    ctls = jnp.stack([jnp.asarray(data_cache[c.data][1], dtype)
                      for c in cells])           # (G, n_traj, T, 4)
    params = _stack_pytrees([
        init_mlp(spec, jax.random.PRNGKey(c.seed), dtype) for c in cells])

    # --- fused whole-training-run path: the entire grid in ONE compiled
    # program, every (rod, params, data) cell a vmap lane of the Pallas
    # whole-run kernel (zero per-epoch AND per-cell dispatch). Chunked at
    # log_every via the opaque opt-state round-trip. cfg.fused semantics
    # match training.train (auto = only on TPU backend). Under a mesh the
    # SAME kernel runs sharded: shard_map splits the grid axis over "data"
    # and each device trains its local cells (the grid is embarrassingly
    # parallel) — per-device results bit-match the single-device program
    # (tests/test_interop_parallel.py pins it).
    from ..training.train import _resolve_fused
    n_cells_model = int(trajs.shape[1] * (trajs.shape[2] - 1)
                        * len(cfg.keypoints))
    fused_mode = _resolve_fused(cfg, spec, n_cells_model, None)
    if fused_mode:
        from ..ops.pallas_train import (make_fused_grid_training_run,
                                        make_sharded_grid_training_run)
        interp = fused_mode == "interpret"
        G = len(cells)
        if mesh is not None:
            # pad the grid axis to a multiple of the data axis (shard_map
            # needs even shards); padded lanes repeat the last cell and
            # are dropped from the results below
            n_data = int(mesh.shape["data"])
            pad = (-G) % n_data
            if pad:
                rep = lambda x: jnp.concatenate(
                    [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
                rods = jax.tree.map(rep, rods)
                params = jax.tree.map(rep, params)
                trajs = rep(trajs)
                ctls = rep(ctls)
            make_run_fused = lambda n: make_sharded_grid_training_run(
                spec, cfg, n, mesh, interpret=interp)
        else:
            make_run_fused = lambda n: make_fused_grid_training_run(
                spec, cfg, n, interpret=interp)
        # no log consumer -> the WHOLE run is one kernel launch; otherwise
        # chunk at the log cadence (opt state round-trips between chunks)
        chunk = (cfg.epochs if log is None
                 else max(1, min(cfg.log_every, cfg.epochs)))
        run_chunk = make_run_fused(chunk)
        losses: list = []
        state = None
        done = 0
        while done < cfg.epochs:
            n = min(chunk, cfg.epochs - done)
            runner = run_chunk if n == chunk else make_run_fused(n)
            params, ls, state = runner(rods, params, trajs, ctls, state)
            losses.extend(np.asarray(ls).T[:, :G])  # (G', n) -> n x (G,)
            done += n
            if log:
                log(f"epoch {done - 1} losses {losses[-1]}")
        flat = jax.device_get(params)
        per_cell = [jax.tree.map(lambda x, i=i: x[i], flat)
                    for i in range(G)]
        return GridResult(cells=list(cells), params=per_cell,
                          loss_history=np.asarray(losses), spec=spec)

    optimizer = make_optimizer(cfg)
    opt_state = jax.vmap(optimizer.init)(params)

    kp = tuple(cfg.keypoints)
    clamp = cfg.clamp_weights

    def cell_loss(rod, p_nn, traj, ctl):
        per = jax.vmap(
            lambda t, c: teacher_forced_loss(rod, spec, p_nn, t, c, kp)
        )(traj, ctl)
        return jnp.sum(per)

    def cell_step(rod, p_nn, opt_s, traj, ctl):
        loss, grads = jax.value_and_grad(cell_loss, argnums=1)(
            rod, p_nn, traj, ctl)
        updates, opt_s = optimizer.update(grads, opt_s, p_nn, value=loss)
        p_nn = optax.apply_updates(p_nn, updates)
        if clamp:
            p_nn = clamp_nonnegative(p_nn)
        return p_nn, opt_s, loss

    vstep = jax.vmap(cell_step)

    if mesh is not None:
        # every stacked pytree shards its leading (grid) axis over "data"
        place = lambda tree: jax.tree.map(
            lambda x: jax.device_put(x, data_sharding(mesh, jnp.ndim(x))),
            tree)
        rods = place(rods)
        params = place(params)
        opt_state = place(opt_state)
        trajs = place(trajs)
        ctls = place(ctls)
    # Epochs run on device in lax.scan chunks (one XLA program per chunk,
    # no per-epoch host dispatch — same recipe as training.make_epoch_scan).
    def make_run(n_epochs: int):
        @partial(jax.jit, donate_argnums=(1, 2))
        def run(rods, params, opt_state, trajs, ctls):
            def body(carry, _):
                p_nn, opt_s = carry
                p_nn, opt_s, loss = vstep(rods, p_nn, opt_s, trajs, ctls)
                return (p_nn, opt_s), loss
            (p_nn, opt_s), losses = jax.lax.scan(
                body, (params, opt_state), None, length=n_epochs)
            return p_nn, opt_s, losses
        return run

    chunk = max(1, min(cfg.log_every, cfg.epochs))
    run_chunk = make_run(chunk)
    losses: list = []
    done = 0
    while done < cfg.epochs:
        n = min(chunk, cfg.epochs - done)
        runner = run_chunk if n == chunk else make_run(n)
        params, opt_state, ls = runner(rods, params, opt_state, trajs, ctls)
        losses.extend(np.asarray(ls))     # (n, G) rows
        done += n
        if log:
            log(f"epoch {done - 1} losses {losses[-1]}")

    # unstack per-cell params
    flat = jax.device_get(params)
    per_cell = [jax.tree.map(lambda x, i=i: x[i], flat)
                for i in range(len(cells))]
    return GridResult(cells=list(cells), params=per_cell,
                      loss_history=np.asarray(losses), spec=spec)
