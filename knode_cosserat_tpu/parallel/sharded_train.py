"""Multi-chip KNODE training: DP over trajectories + TP over the MLP hidden
dimension, expressed as GSPMD sharding constraints under one jit.

This is the multi-device replacement for the reference's single-device torch
loop (physics_train.py) — no NCCL/torch.distributed analogue is needed:
gradients psum over the "data" axis and the TP layer-1 contraction
all-reduces over "model", both inserted by XLA and riding ICI.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.params import RodParams
from ..models.mlp import MLPSpec, clamp_nonnegative, init_mlp
from ..training.loss import DEFAULT_KEYPOINTS_FAST, teacher_forced_loss
from ..training.train import TrainConfig, make_optimizer
from .mesh import data_sharding, shard_params_tp

__all__ = ["ShardedTrainer"]


class ShardedTrainer:
    """Owns the sharded params/opt state and the jitted training step.

    trajs (B, T, N, 25) and controls (B, T, 4) are sharded over "data";
    MLP params are sharded over "model" (see mesh.shard_params_tp). B must
    be divisible by the data-axis size. Losses are summed over the batch
    exactly like the host trainer, so results are independent of the mesh
    shape (up to float reduction order).
    """

    def __init__(self, mesh: Mesh, p_mod: RodParams, cfg: TrainConfig):
        self.mesh = mesh
        self.p = p_mod
        self.cfg = cfg
        self.spec = cfg.spec()
        self.optimizer = make_optimizer(cfg)

        params = init_mlp(self.spec, jax.random.PRNGKey(cfg.seed),
                          jnp.dtype(cfg.dtype))
        self.param_sharding = shard_params_tp(mesh, params)
        self.params = jax.device_put(params, self.param_sharding)
        self.opt_state = jax.jit(
            self.optimizer.init,
            out_shardings=None)(self.params)

        kp = tuple(cfg.keypoints)
        clamp = cfg.clamp_weights
        spec = self.spec
        p = self.p
        optimizer = self.optimizer

        def total_loss(params, trajs, controls):
            per = jax.vmap(
                lambda t, c: teacher_forced_loss(p, spec, params, t, c, kp)
            )(trajs, controls)
            return jnp.sum(per)

        # trajectories shard over "data"; the TIME axis shards over "seq"
        # (sequence parallelism — the loss's y_prev shift becomes a halo
        # exchange XLA inserts automatically)
        traj_shard = data_sharding(mesh, 4, seq_axis=1)
        ctl_shard = data_sharding(mesh, 3, seq_axis=1)

        @partial(jax.jit,
                 in_shardings=(self.param_sharding, None,
                               traj_shard, ctl_shard),
                 out_shardings=(self.param_sharding, None, None),
                 donate_argnums=(0, 1))
        def step(params, opt_state, trajs, controls):
            loss, grads = jax.value_and_grad(total_loss)(
                params, trajs, controls)
            updates, opt_state = optimizer.update(grads, opt_state, params,
                                                  value=loss)
            params = optax.apply_updates(params, updates)
            if clamp:
                params = clamp_nonnegative(params)
            return params, opt_state, loss

        self._step = step

    def shard_data(self, trajs, controls):
        dtype = jnp.dtype(self.cfg.dtype)
        trajs = jax.device_put(jnp.asarray(trajs, dtype),
                               data_sharding(self.mesh, 4, seq_axis=1))
        controls = jax.device_put(jnp.asarray(controls, dtype),
                                  data_sharding(self.mesh, 3, seq_axis=1))
        return trajs, controls

    def step(self, trajs, controls) -> float:
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, trajs, controls)
        return loss

    def fit(self, trajs, controls, epochs=None, log=None):
        """Run `epochs` on-device: epochs execute in `lax.scan` chunks of
        `cfg.log_every` (one XLA program per chunk, zero per-epoch host
        dispatch — same recipe as the single-device make_epoch_scan, which
        is ~10x the per-epoch host loop this replaced)."""
        from ..training.train import make_epoch_scan
        epochs = epochs or self.cfg.epochs
        trajs, controls = self.shard_data(trajs, controls)
        chunk = max(1, min(self.cfg.log_every, epochs))
        run_chunk = make_epoch_scan(self.p, self.spec, self.optimizer,
                                    self.cfg.keypoints,
                                    self.cfg.clamp_weights, chunk)
        losses: list = []
        while len(losses) < epochs:
            n = min(chunk, epochs - len(losses))
            runner = run_chunk if n == chunk else make_epoch_scan(
                self.p, self.spec, self.optimizer, self.cfg.keypoints,
                self.cfg.clamp_weights, n)
            self.params, self.opt_state, ls = runner(
                self.params, self.opt_state, trajs, controls)
            losses.extend(float(x) for x in np.asarray(ls))
            if log:
                log(f"epoch {len(losses) - 1} loss {losses[-1]:.6e}")
        return losses

    def gathered_params(self):
        return jax.device_get(self.params)
