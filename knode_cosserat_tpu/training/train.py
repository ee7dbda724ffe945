"""KNODE training: one jitted optax step over the whole batch.

Rebuild of the reference trainers (physics_train.py sim track,
train_segment.py real track) with the `--fast` path as the only path — but
fully batched: every (trajectory, timestep, keypoint) is one fused forward/
backward on device, instead of a Python loop accumulating per-step losses.

Optimizer parity: Adam(lr=1e-2, weight_decay) + ReduceLROnPlateau(
patience=80, factor=0.5) (physics_train.py:199-206) via
optax.contrib.reduce_on_plateau, plus the post-step non-negative weight
clamp (physics_train.py:299-304). Periodic evaluation rolls the hybrid
model out on a validation schedule and scores tip DTW against the reference
rod (evaluate, physics_train.py:136-167); the best-DTW parameters are kept
(the reference stashes whole-robot pickles in BytesIO buffers keyed by DTW,
physics_train.py:163-167,410-417 — we keep the params pytree).
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.params import RodParams
from ..core.stepper import simulate_scan
from ..evaluation.metrics import tip_dtw
from ..models.mlp import MLPSpec, bind, clamp_nonnegative, init_mlp
from .loss import DEFAULT_KEYPOINTS_FAST, teacher_forced_loss

__all__ = ["TrainConfig", "TrainResult", "train_knode", "make_train_step",
           "rollout_with_nn"]


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 2000
    lr: float = 1e-2
    weight_decay: float = 0.0
    hidden: int = 512
    keypoints: Tuple[int, ...] = DEFAULT_KEYPOINTS_FAST
    history: bool = False
    activation: str = "elu"
    seed: int = 0
    clamp_weights: bool = True              # physics_train.py:26,299-304
    plateau_patience: int = 80
    plateau_factor: float = 0.5
    eval_every: int = 200                   # physics_train.py:379 (fast path)
    eval_len: int = 100
    log_every: int = 10
    checkpoint_every: int = 500             # physics_train.py:386
    dtype: str = "float32"
    # mixed precision for the residual net: "bfloat16" casts the MLP matmul
    # inputs down for the MXU passes (accumulation, loss, physics, and the
    # f32 master weights are untouched). A MEMORY knob on TPU — DEFAULT
    # precision already rides bf16 MXU passes for f32, so this measured
    # slightly slower, not faster (models/mlp.py docstring); use it to halve
    # activation residuals on very wide nets. The fused whole-run kernel
    # declines mixed specs; the XLA epoch scan carries them.
    nn_dtype: Optional[str] = None
    # fused whole-training-run Pallas kernels:
    #   "auto"      VMEM-resident kernel (ops/pallas_train.py) when
    #               supported, else the HBM-streamed wide kernel
    #               (ops/pallas_train_wide.py) for hidden > 512, else the
    #               XLA epoch scan; kernels only when the backend is TPU
    #   "on"        force the VMEM-resident kernel
    #   "wide"      force the streamed wide kernel
    #   "interpret" / "wide_interpret"   force in interpret mode (CPU
    #               parity testing)
    #   "off"       always use the XLA epoch scan
    fused: str = "auto"
    # validation DTW metric: "device" = exact DTW via the anti-diagonal
    # wavefront kernel (ops/dtw.py) — rollout and score stay on device;
    # "host" = the reference's fastdtw approximation on host. Both select
    # the same best epoch (tests/test_training.py pins it).
    eval_dtw: str = "device"
    # validation rollout implementation: "auto" = the mega step kernel on
    # TPU (whole Newton solve per launch) and the XLA scan elsewhere;
    # "xla" forces the scan path (robust newton_solve) if a marginal
    # model's validation rollout misbehaves under the kernel; "mega"
    # forces the kernel.
    eval_impl: str = "auto"
    # write checkpoints on a background thread (AsyncCheckpointWriter) so
    # long runs never stall on host IO at checkpoint boundaries
    checkpoint_async: bool = False

    def spec(self) -> MLPSpec:
        return MLPSpec.for_knode(self.hidden, self.history, self.activation,
                                 getattr(self, "nn_dtype", None))


@dataclasses.dataclass
class TrainResult:
    params: tuple                 # final params
    best_params: tuple            # best-validation-DTW params
    best_dtw: float
    loss_history: np.ndarray      # (epochs,)
    dtw_history: list             # [(epoch, dtw)]
    spec: MLPSpec
    config: TrainConfig
    epochs_per_sec: float = 0.0


def _resolve_fused(cfg: TrainConfig, spec: MLPSpec, n_cells: int, mesh):
    """Map cfg.fused -> None (XLA epoch scan) | "on" | "interpret".

    mesh is not None declines the fused path for THIS trainer only: a
    single model's whole-run kernel has no batch axis to shard (the mesh
    here means TP/SP/DP over one model's program — XLA GSPMD territory).
    The multi-chip FAST path is the grid: parallel.grid.grid_train(mesh=)
    shard_maps the vmapped whole-run kernel over the "data" axis (each
    device trains whole experiment cells), so callers with many models
    should route there; it calls this resolver with mesh=None."""
    mode = getattr(cfg, "fused", "auto")
    forced = mode in ("on", "interpret", "wide", "wide_interpret")
    if mode == "off":
        return None
    if mesh is not None or jnp.dtype(cfg.dtype) != jnp.float32:
        if forced and mesh is not None:
            raise ValueError(
                f"cfg.fused={mode!r}: train_knode's fused trainers are "
                "single-device (one model = no shardable batch axis); "
                "for the multi-chip fused path train a GRID — "
                "parallel.grid.grid_train(mesh=...) shard_maps the "
                "whole-run kernel over the mesh's data axis")
        if forced:
            raise ValueError(f"cfg.fused={mode!r}: the fused trainers "
                             "are float32-only")
        return None
    from ..ops.pallas_train import fused_trainer_supported
    from ..ops.pallas_train_wide import wide_trainer_supported
    if mode in ("wide", "wide_interpret"):
        if not wide_trainer_supported(spec, n_cells, cfg.weight_decay):
            raise ValueError(f"cfg.fused={mode!r} but the wide (streamed) "
                             f"trainer does not support this config "
                             f"(spec={spec}, n_cells={n_cells})")
        return mode
    if not fused_trainer_supported(spec, n_cells, cfg.weight_decay):
        if forced:
            raise ValueError(f"cfg.fused={mode!r} but the fused trainer "
                             f"does not support this config "
                             f"(spec={spec}, n_cells={n_cells}); wide "
                             f"hidden widths can force cfg.fused='wide'")
        # auto: wide hidden -> the HBM-streamed kernel when it supports
        # the shape, else the XLA epoch scan. Crossover measured at the
        # train-real cell count (docs/BENCHMARKS.md wide roofline):
        # h=1024 XLA 6,527 vs wide 6,125 eps (latency regime), h=2048
        # wide 1.15x, h=32768 wide 3.98x — route wide from h=2048 up.
        if (spec.dims[1] >= 2048
                and wide_trainer_supported(spec, n_cells, cfg.weight_decay)
                and jax.default_backend() == "tpu"):
            return "wide"
        return None
    if forced:
        return mode
    return "on" if jax.default_backend() == "tpu" else None


def make_optimizer(cfg: TrainConfig):
    if cfg.weight_decay:
        base = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    else:
        base = optax.adam(cfg.lr)
    plateau = optax.contrib.reduce_on_plateau(
        factor=cfg.plateau_factor, patience=cfg.plateau_patience,
        rtol=1e-4, atol=0.0, cooldown=0, accumulation_size=1)
    return optax.chain(base, plateau)


def make_train_step(p: RodParams, spec: MLPSpec, optimizer,
                    keypoints: Sequence[int], clamp: bool,
                    use_pallas: bool = False, skip_first: bool = False):
    """Build the jitted (params, opt_state, trajs, controls) -> ... step.

    trajs: (n_traj, T, N, 25); controls: (n_traj, T, 4). The per-trajectory
    losses are summed, matching the reference accumulation
    (physics_train.py:313-365). use_pallas routes the teacher-forced RHS
    through the fused Pallas kernel (trajectories unrolled statically —
    pallas_call composes with the kernel's custom VJP, not with vmap).
    skip_first drops each trajectory's first (self-prev-history)
    transition — see teacher_forced_loss; used by the online adapter
    whose windows start mid-motion."""
    kp = tuple(keypoints)
    fused_fn = None
    if use_pallas:
        from ..ops.pallas_rhs import make_fused_next_segment
        fused_fn = make_fused_next_segment(p, spec)

    def total_loss(params, trajs, controls):
        if fused_fn is not None:
            return sum(
                teacher_forced_loss(p, spec, params, trajs[i], controls[i],
                                    kp, fused_fn=fused_fn,
                                    skip_first=skip_first)
                for i in range(trajs.shape[0]))
        per = jax.vmap(
            lambda t, c: teacher_forced_loss(p, spec, params, t, c, kp,
                                             skip_first=skip_first)
        )(trajs, controls)
        return jnp.sum(per)

    @jax.jit
    def step(params, opt_state, trajs, controls):
        loss, grads = jax.value_and_grad(total_loss)(params, trajs, controls)
        updates, opt_state = optimizer.update(grads, opt_state, params,
                                              value=loss)
        params = optax.apply_updates(params, updates)
        if clamp:
            params = clamp_nonnegative(params)
        return params, opt_state, loss

    return step, total_loss


def make_epoch_scan(p: RodParams, spec: MLPSpec, optimizer,
                    keypoints: Sequence[int], clamp: bool,
                    n_epochs: int):
    """Whole-training-run-on-device: ``lax.scan`` over epochs so there is no
    per-epoch host dispatch at all — the TPU-idiomatic training loop. The
    reference pays a Python loop + torch dispatch per epoch
    (physics_train.py:307-408); here E epochs are one XLA program.

    Returns jitted fn: (params, opt_state, trajs, controls) ->
    (params, opt_state, losses (E,))."""
    kp = tuple(keypoints)

    def total_loss(params, trajs, controls):
        per = jax.vmap(
            lambda t, c: teacher_forced_loss(p, spec, params, t, c, kp)
        )(trajs, controls)
        return jnp.sum(per)

    @jax.jit
    def run(params, opt_state, trajs, controls):
        def body(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(total_loss)(params, trajs,
                                                         controls)
            updates, opt_state = optimizer.update(grads, opt_state, params,
                                                  value=loss)
            params = optax.apply_updates(params, updates)
            if clamp:
                params = clamp_nonnegative(params)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=n_epochs)
        return params, opt_state, losses

    return run


def _default_tol(dtype) -> float:
    """Newton tolerance on sum(r^2): 1e-16 is below f32 resolution, which
    would make every solve run to max_iter; pick by dtype instead."""
    return 1e-16 if jnp.dtype(dtype) == jnp.float64 else 1e-10


@partial(jax.jit, static_argnames=("spec", "method", "max_iter"))
def _rollout_with_nn_xla(p, controls, spec, nn_params, method, tol, max_iter):
    nn_fn = bind(spec, nn_params)
    return simulate_scan(p, controls, nn_fn=nn_fn, nn_history=spec.history,
                         method=method, tol=tol, max_iter=max_iter).traj


def rollout_with_nn(p: RodParams, controls, spec: MLPSpec, nn_params,
                    method: str = "euler", tol: Optional[float] = None,
                    max_iter: int = 50, impl: str = "xla"):
    """Closed-loop rollout with the hybrid (physics + MLP) RHS — replaces
    the reference's numpy NN shim re-execution (cosserat_ode.py:81-112 +
    physics_train.py:139-144): one core, no torch->numpy export.

    impl="mega" routes through the mega step kernel (the whole Newton
    shooting solve in one Pallas launch per time step,
    core.fast_rollout/ops.pallas_step) — ~8x the XLA scan on TPU; the
    converged trajectory matches to solver tolerance."""
    if tol is None:
        tol = _default_tol(p.dtype)
    if impl == "mega":
        from ..core.fast_rollout import mega_rollout_cached
        roll = mega_rollout_cached(p, spec, tol=tol, max_iter=max_iter,
                                   method=method)
        traj, _, _ = roll(jnp.asarray(controls, p.dtype)[None], nn_params)
        return traj[0]
    return _rollout_with_nn_xla(p, controls, spec, nn_params, method, tol,
                                max_iter)


def train_knode(
    p_mod: RodParams,
    trajs,
    controls,
    cfg: TrainConfig,
    validation_controls=None,
    validation_reference=None,
    eval_rod: Optional[RodParams] = None,
    log: Optional[Callable[[str], None]] = print,
    resume_from: Optional[str] = None,
    checkpoint_path: Optional[str] = None,
    mesh=None,
) -> TrainResult:
    """Train the KNODE residual for a (possibly perturbed) rod ``p_mod`` on
    teacher-forcing data from the reference rod.

    validation_controls/validation_reference: optional (T,4) schedule and
    (T,N,25) reference rollout for DTW-based best-model selection.
    eval_rod: rod used for validation rollouts (defaults to p_mod).
    resume_from: checkpoint path to resume params/opt state/loss history
    from (the reference's RESUME_TRAINING flag, physics_train.py:186-204).
    mesh: optional jax.sharding.Mesh ("data","seq","model" axes). When
    given, the FULL trainer (epoch scan, eval, best-DTW, checkpointing,
    resume) runs sharded: MLP params TP over "model", trajectories DP over
    "data" (when the batch divides), time SP over "seq". Results match the
    single-device path up to float reduction order.
    """
    spec = cfg.spec()
    dtype = jnp.dtype(cfg.dtype)
    params = init_mlp(spec, jax.random.PRNGKey(cfg.seed), dtype)
    optimizer = make_optimizer(cfg)
    resumed_loss: list = []
    ckpt = None
    if resume_from:
        from .checkpoint import load_checkpoint
        ckpt, _ = load_checkpoint(resume_from)
        params = jax.tree.unflatten(jax.tree.structure(params),
                                    jax.tree.leaves(ckpt["params"]))
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
        if ckpt.get("loss") is not None:
            resumed_loss = [float(x) for x in np.asarray(ckpt["loss"])]

    if mesh is not None:
        from ..parallel.mesh import shard_params_tp
        params = jax.device_put(params, shard_params_tp(mesh, params))
    opt_state = optimizer.init(params)  # inherits params' sharding
    if ckpt is not None and ckpt.get("opt_state") is not None:
        loaded = jax.tree.unflatten(jax.tree.structure(opt_state),
                                    jax.tree.leaves(ckpt["opt_state"]))
        # restore values into the (possibly sharded) template
        opt_state = jax.tree.map(
            lambda tgt, src: jax.device_put(jnp.asarray(src, tgt.dtype),
                                            tgt.sharding),
            opt_state, loaded)

    trajs = jnp.asarray(trajs, dtype)
    controls_a = jnp.asarray(controls, dtype)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        # DP over trajectories only when the batch divides the axis;
        # the time axis always shards over "seq"
        dp = "data" if trajs.shape[0] % mesh.shape["data"] == 0 else None
        trajs = jax.device_put(trajs, NamedSharding(mesh, P(dp, "seq")))
        controls_a = jax.device_put(controls_a,
                                    NamedSharding(mesh, P(dp, "seq")))

    eval_rod = eval_rod if eval_rod is not None else p_mod
    do_eval = (validation_controls is not None
               and validation_reference is not None)
    # validation rollouts ride the mega step kernel on TPU (one Newton
    # shooting solve per launch); XLA scan elsewhere / under a mesh.
    # cfg.eval_impl overrides (see TrainConfig).
    if cfg.eval_impl == "auto":
        eval_impl = ("mega" if (mesh is None
                                and jax.default_backend() == "tpu")
                     else "xla")
    else:
        eval_impl = cfg.eval_impl
    if do_eval:
        # accept BOTH trajectory layouts like evaluation.metrics.tip_dtw:
        # state-last (T, N, >=19) or the reference's (T, >=19, N)
        validation_reference = np.asarray(validation_reference)
        if validation_reference.shape[-1] < 19:
            validation_reference = np.moveaxis(validation_reference, 1, 2)

    # Epochs run on device in chunks (zero per-epoch host dispatch); the
    # host only intervenes at eval/log boundaries. When the fused
    # whole-training-run Pallas kernel supports the config (cfg.fused), each
    # chunk is ONE kernel launch; otherwise an XLA lax.scan over epochs.
    # The optax chain state stays canonical either way — fused chunks
    # convert through fused_state_from_optax/optax_state_from_fused, so
    # checkpoints, resume, and mixed fused/XLA runs all compose.
    n_cells = int(trajs.shape[0] * (trajs.shape[1] - 1)
                  * len(cfg.keypoints))
    fused_mode = _resolve_fused(cfg, spec, n_cells, mesh)
    chunk = cfg.eval_every if do_eval else max(cfg.log_every, 1)
    chunk = max(1, min(chunk, cfg.epochs + 1))
    if fused_mode in ("wide", "wide_interpret"):
        from ..ops.pallas_train import (fused_state_from_optax,
                                        optax_state_from_fused)
        from ..ops.pallas_train_wide import make_wide_training_run
        make_runner = lambda n: make_wide_training_run(
            p_mod, spec, cfg, n, interpret=fused_mode == "wide_interpret")
    elif fused_mode:
        from ..ops.pallas_train import (fused_state_from_optax,
                                        make_fused_training_run,
                                        optax_state_from_fused)
        make_runner = lambda n: make_fused_training_run(
            p_mod, spec, cfg, n, interpret=fused_mode == "interpret")
    else:
        make_runner = lambda n: make_epoch_scan(
            p_mod, spec, optimizer, cfg.keypoints, cfg.clamp_weights, n)
    run_chunk = make_runner(chunk)

    loss_hist = list(resumed_loss)
    dtw_hist = []
    best_dtw, best_params = np.inf, params
    ckpt_writer = None
    if checkpoint_path and getattr(cfg, "checkpoint_async", False):
        from .checkpoint import AsyncCheckpointWriter
        ckpt_writer = AsyncCheckpointWriter()
    t_start = time.perf_counter()
    t0_compiled = None

    epoch = 0
    while epoch <= cfg.epochs:
        if do_eval and epoch % cfg.eval_every == 0:
            # reference quirk: the epoch-0 eval scores the NO-NN baseline
            # (physics_train.py:275,380 pass None at epoch 0)
            nn_p = None if epoch == 0 else (
                jax.device_get(params) if mesh is not None else params)
            if nn_p is None:
                # jitted wrapper (the bare scan would dispatch eagerly)
                from ..core.stepper import simulate
                traj = simulate(eval_rod,
                                jnp.asarray(validation_controls,
                                            eval_rod.dtype),
                                tol=_default_tol(eval_rod.dtype))
            else:
                traj = rollout_with_nn(eval_rod,
                                       jnp.asarray(validation_controls,
                                                   eval_rod.dtype),
                                       spec, nn_p, impl=eval_impl)
            if cfg.eval_dtw == "device":
                from ..ops.dtw import tip_dtw_device
                d = float(tip_dtw_device(
                    jnp.asarray(traj)[None, :, :, :25],
                    jnp.asarray(validation_reference))[0])
            else:
                d = tip_dtw(np.asarray(traj)[:, :, :25],
                            validation_reference)
            dtw_hist.append((epoch, d))
            if log:
                log(f"Validation DTW Distance XYZ {d}")
            if d < best_dtw:
                best_dtw, best_params = d, jax.tree.map(lambda x: x, params)

        n = min(chunk, cfg.epochs + 1 - epoch)
        runner = run_chunk if n == chunk else make_runner(n)
        if fused_mode:
            fstate = fused_state_from_optax(opt_state)
            params, losses, fstate = runner(params, trajs, controls_a,
                                            fstate)
            opt_state = optax_state_from_fused(fstate, opt_state)
        else:
            params, opt_state, losses = runner(params, opt_state, trajs,
                                               controls_a)
        losses = np.asarray(losses)
        loss_hist.extend(float(x) for x in losses)
        if t0_compiled is None:
            jax.block_until_ready(losses)
            t0_compiled = time.perf_counter()
        epoch += n
        if checkpoint_path and (epoch % cfg.checkpoint_every) < n:
            tree = {"params": params, "opt_state": opt_state,
                    "loss": np.asarray(loss_hist), "dtw": dtw_hist}
            if ckpt_writer is not None:
                ckpt_writer.save(checkpoint_path, tree,
                                 meta={"epoch": epoch})
            else:
                from .checkpoint import save_checkpoint
                save_checkpoint(checkpoint_path, tree,
                                meta={"epoch": epoch})
        if log and (epoch // chunk) % max(1, cfg.log_every // chunk) == 0:
            log(f"Epoch {epoch - 1} of {cfg.epochs}")
            log(f"Total loss: {losses[-1]:.6e}")

    if ckpt_writer is not None:
        ckpt_writer.close()   # all enqueued checkpoints durable
    elapsed = time.perf_counter() - (t0_compiled or t_start)
    eps = cfg.epochs / elapsed if elapsed > 0 else 0.0
    if not do_eval:
        best_dtw, best_params = np.nan, params
    if mesh is not None:
        # hand unsharded pytrees back to the caller
        params = jax.device_get(params)
        best_params = jax.device_get(best_params)
    return TrainResult(params=params, best_params=best_params,
                       best_dtw=float(best_dtw),
                       loss_history=np.asarray(loss_hist),
                       dtw_history=dtw_hist, spec=spec, config=cfg,
                       epochs_per_sec=eps)
