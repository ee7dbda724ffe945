"""Pallas TPU kernel: whole-run KNODE training with HBM-STREAMED weights
(the wide-hidden fused trainer).

ops/pallas_train.py keeps parameters, Adam moments, and data VMEM-resident
for the whole run — unbeatable at the reference width (hidden<=512), but
a dead end for wide nets: at hidden>=1024 the params+moments residents
blow the VMEM budget (fused_trainer_supported declines, measured Mosaic
failures documented there), and the XLA epoch scan that catches those
callers MATERIALIZES the (cells, hidden) activations to HBM ~4x per
epoch — an arithmetic-intensity ceiling of ~9% MFU on v5e no schedule
can beat (docs/BENCHMARKS.md roofline study).

This kernel removes the materialization instead of the width:

  * parameters + Adam moments live in HBM, packed hidden-on-LANES
    (W1e (DP, H): feature rows + the bias folded as row ``din`` against
    a constant-1 feature row; W2e (32, H): the 25 output rows padded),
    so every streamed tile is a 128-aligned lane slice with zero pad
    traffic;
  * per epoch, two passes of an in-kernel fori_loop DMA (64+32, HT)
    weight tiles VMEM<->HBM: forward accumulates the MLP output across
    hidden tiles, the loss/plateau/cotangent runs once on the (32, C)
    result, and the backward pass RECOMPUTES each tile's activations
    (one extra thin matmul) to form gradients and apply in-kernel AdamW
    + clamp, writing updated tiles back in place
    (``input_output_aliases``);
  * per-epoch HBM traffic is 3 reads + 1 write of params+moments
    (~36*H*(DP+32)/3 bytes) instead of ~4 materializations of
    (cells, hidden) activations — at the train-real shape (1904 cells,
    hidden 8192) that is ~24 MB vs ~250 MB, lifting the roofline from
    the ~9% HBM ceiling toward the 32.3% thin-matmul MXU bound.

Loss, optimizer, plateau, clamp, and the opaque ``opt_state`` round-trip
are IDENTICAL in semantics to ops/pallas_train.py (same reference chain:
optax.adam(w) + reduce_on_plateau + clamp_nonnegative, reference
physics_train.py:299-376); tests/test_pallas_train.py pins exact parity
of both kernels against the XLA epoch scan.

Scope guards (``wide_trainer_supported``): 2-layer ELU MLP in full f32,
cells <= one lane tile after padding (train-real's 1904 fits), any
hidden width >= 1 (the stream makes VMEM usage width-independent).

Why the cell envelope is not extended: past one VMEM-resident cell tile
the kernel would have to stream data tiles too, and the dW contraction
(x @ da1^T over the cell axis) then re-reads either the weights per
cell tile or the features per hidden tile — per-epoch traffic grows to
~n_tiles x (weights|features), which lands back at the materializing
path's arithmetic intensity (~9% MFU) that this kernel exists to beat.
Every actual product config (train-real 1904, multitrain 112/model)
fits the resident tile; the huge-cell regime belongs to the XLA scan.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.mlp import MLPSpec
from .pallas_train import (_ADAM_B1, _ADAM_B2, _ADAM_EPS, VMEM_BUDGET,
                           _euler_backward, _euler_forward, _fresh_state)

__all__ = ["make_wide_training_run", "wide_trainer_supported"]

# one lane tile of cells; train-real is 1904 -> Cp=1920
WIDE_MAX_CELLS = 4096


def _dims(spec: MLPSpec):
    din, hidden, dout = spec.dims
    DP = ((din + 1 + 7) // 8) * 8        # feature rows + ones row, 8-align
    return din, hidden, dout, DP


def _pick_ht(cp: int, dp: int) -> int:
    """Largest hidden-tile width whose live set fits the VMEM budget.
    Live at peak (phase B): 3 (HT, Cp) f32 intermediates (hact, dh, da1)
    + 6 streamed (DP|32, HT) tile buffers + the (DP+~54+64, Cp) resident
    data/scratch rows + Mosaic headroom (shared VMEM_BUDGET model)."""
    resident = 4 * cp * (dp + 54 + 64)
    for ht in (512, 384, 256, 128):
        live = 4 * ht * (3 * cp + 3 * (dp + 32))
        if resident + live <= VMEM_BUDGET:
            return ht
    return 0


def wide_trainer_supported(spec: MLPSpec, n_cells: int,
                           weight_decay: float = 0.0) -> bool:
    """True when the streamed kernel handles this config. Width-agnostic
    by design (weights never reside whole in VMEM); the binding
    constraint is the cell count, which must fit one lane tile."""
    if not (len(spec.dims) == 3 and spec.activation == "elu"
            and getattr(spec, "compute_dtype", None) is None
            and 0 < n_cells <= WIDE_MAX_CELLS):
        return False
    din, hidden, dout, DP = _dims(spec)
    if dout != 25:
        return False
    cp = ((n_cells + 127) // 128) * 128
    return _pick_ht(cp, DP) >= 128


# ------------------------------------------------------------- packing

def _pack(params, moments, din, DP, Hp):
    """(params, 8 moments) -> 6 hidden-on-lanes HBM arrays + 3 small.

    W1e rows: 0..din-1 = W1^T, row din = B1 (driven by the constant-1
    feature row), rows din+1.. = 0. W2e rows 0..24 = W2, rest 0. The
    moment arrays pack identically, so AdamW in packed space is AdamW
    in param space entry-for-entry."""
    f32 = jnp.float32
    (mW1, vW1, mB1, vB1, mW2, vW2, mB2, vB2) = moments

    def pack1(W, B):                      # (h, din), (h, 1) -> (DP, Hp)
        h = W.shape[0]
        out = jnp.zeros((DP, Hp), f32)
        out = out.at[:din, :h].set(jnp.asarray(W, f32).T)
        return out.at[din, :h].set(jnp.asarray(B, f32)[:, 0])

    def pack2(W):                         # (25, h) -> (32, Hp)
        h = W.shape[1]
        return jnp.zeros((32, Hp), f32).at[:25, :h].set(
            jnp.asarray(W, f32))

    def small(B):                         # (25, 1) -> (32, 1)
        return jnp.zeros((32, 1), f32).at[:25].set(jnp.asarray(B, f32))

    W1, B1 = params[0]["w"], params[0]["b"][:, None]
    W2, B2 = params[1]["w"], params[1]["b"][:, None]
    return ((pack1(W1, B1), pack1(mW1, mB1), pack1(vW1, vB1),
             pack2(W2), pack2(mW2), pack2(vW2)),
            (small(B2), small(mB2), small(vB2)))


def _unpack(big, smalls, din, hidden):
    w1e, m1e, v1e, w2e, m2e, v2e = big
    b2, mb2, vb2 = smalls

    def un1(A):
        return A[:din, :hidden].T, A[din, :hidden][:, None]

    W1, B1 = un1(w1e)
    mW1, mB1 = un1(m1e)
    vW1, vB1 = un1(v1e)
    W2, mW2, vW2 = (A[:25, :hidden] for A in (w2e, m2e, v2e))
    params = ({"w": W1, "b": B1[:, 0]}, {"w": W2, "b": b2[:25, 0]})
    moments = (mW1, vW1, mB1, vB1, mW2, vW2, mb2[:25], vb2[:25])
    return params, moments


# --------------------------------------------------------------- kernel

def _make_run_one(spec: MLPSpec, cfg, n_epochs: int, interpret: bool):
    from ..core.rhs import nn_input_features, rhs
    from ..ops.quaternion import quaternion_to_euler
    if (len(spec.dims) != 3 or spec.activation != "elu"
            or getattr(spec, "compute_dtype", None) is not None):
        raise NotImplementedError(
            "wide trainer supports 2-layer ELU MLPs in full f32; use the "
            "XLA epoch scan otherwise")
    din, hidden, dout, DP = _dims(spec)
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
        """Per-cell constants on LANES, (rows, Cp) — the single-lane-tile
        sibling of pallas_train's precompute (same reference quirks)."""
        ds = jnp.asarray(p.ds, trajs.dtype)
        kpa = jnp.asarray(kp)
        ys = trajs[:, :-1, :, :19]
        zs = trajs[:, :-1, :, 19:]
        y_prev = jnp.concatenate([ys[:, :1], ys[:, :-1]], axis=1)
        z_prev = jnp.concatenate([zs[:, :1], zs[:, :-1]], axis=1)
        yh = p.c1 * ys + p.c2 * y_prev
        zh = p.c1 * zs + p.c2 * z_prev
        G = trajs[:, 1:]
        y_in = G[:, :, kpa - 1, :19]
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
        if C > WIDE_MAX_CELLS:
            raise ValueError(f"{C} cells > WIDE_MAX_CELLS="
                             f"{WIDE_MAX_CELLS}")
        Cp = ((C + 127) // 128) * 128

        def lanes(a):   # (B, T-1, K, d) -> (d, Cp), f32 boundary
            flat = a.reshape(C, a.shape[-1])
            flat = jnp.pad(flat, ((0, Cp - C), (0, 0))).astype(jnp.float32)
            return flat.T
        mask = jnp.pad(jnp.ones((1, C), jnp.float32), ((0, 0), (0, Cp - C)))
        # constant-1 feature row drives the folded B1 (row din of W1e);
        # padded lanes keep the 1 too — their gradients are mask-killed
        xp = jnp.concatenate(
            [lanes(feats), jnp.ones((1, Cp), jnp.float32),
             jnp.zeros((DP - din - 1, Cp), jnp.float32)], axis=0)
        inv = {
            "pos": 1.0 / (Tm1 * K * 3),
            "states": 1.0 / (Tm1 * K * 12),
            "eul": 1.0 / (Tm1 * K * 3),
            "z": 1.0 / (Tm1 * K * 6),
        }
        return (xp, lanes(y_base), lanes(z_phys), lanes(tgt_y),
                lanes(tgt_z), lanes(e_tgt), mask, inv, ds, Cp)

    def kernel(x_ref, yb_ref, zp_ref, ty_ref, tz_ref, te_ref, m_ref,
               w1i, m1i, v1i, w2i, m2i, v2i, b2_ref, mb2_ref, vb2_ref,
               ss_ref,
               w1o, m1o, v1o, w2o, m2o, v2o, b2o_ref, mb2o_ref, vb2o_ref,
               sso_ref, loss_ref,
               wt1, mt1, vt1, wt2, mt2, vt2, g_s, nn_s, sem,
               inv_pos, inv_states, inv_eul, inv_z, HT, n_ht):
        f32 = x_ref.dtype
        Ep = loss_ref.shape[1]
        lane_e = jax.lax.broadcasted_iota(jnp.int32, (1, Ep), 1)
        rows1 = jax.lax.broadcasted_iota(jnp.int32, (DP, 1), 0)
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
        clamp1 = rows1 != din                   # spare the folded bias row
        clamp2 = rows2 < 25

        def dot(a, b, dims):
            # DEFAULT matmul precision — same single-pass MXU lowering
            # the XLA path's mlp_apply gets (physics precomputed outside)
            return jax.lax.dot_general(a, b, dimension_numbers=(dims,
                                                                ((), ())),
                                       preferred_element_type=f32)

        def tile_slice(t):
            return pl.ds(pl.multiple_of(t * HT, HT), HT)

        def stream_in(t, refs_pairs):
            copies = [pltpu.make_async_copy(src.at[:, tile_slice(t)], dst,
                                            sem.at[i])
                      for i, (src, dst) in enumerate(refs_pairs)]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

        def stream_out(t, refs_pairs):
            copies = [pltpu.make_async_copy(src, dst.at[:, tile_slice(t)],
                                            sem.at[i])
                      for i, (src, dst) in enumerate(refs_pairs)]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()

        ss = ss_ref[:]
        t0 = ss[0, 0]
        ds = ss[0, 4]
        x = x_ref[:]
        mask = m_ref[:]
        y_base = yb_ref[:]
        z_phys = zp_ref[:]
        tgt_y = ty_ref[:]
        tgt_z = tz_ref[:]
        e_tgt = te_ref[:]

        def body(e, carry):
            best, pcount, scale, losses, B2, mB2, vB2 = carry

            # ---- phase A: forward, hidden tiles streamed ----
            nn_s[:] = jnp.broadcast_to(B2, nn_s.shape)

            def fwd_tile(t, _):
                stream_in(t, ((w1o, wt1), (w2o, wt2)))
                a1 = dot(wt1[:], x, ((0,), (0,)))          # (HT, Cp)
                hact = jnp.where(a1 > 0, a1, jnp.exp(a1) - 1.0)
                nn_s[:] += dot(wt2[:], hact, ((1,), (0,)))  # (32, Cp)
                return 0

            jax.lax.fori_loop(0, n_ht, fwd_tile, 0)
            nn = nn_s[:]

            # ---- loss + output cotangent (identical to pallas_train) ----
            yg = y_base + ds * nn[0:19, :]
            z_pred = z_phys + nn[19:25, :]
            dpos = (yg[0:3, :] - tgt_y[0:3, :]) * mask
            dstates = (yg[7:19, :] - tgt_y[7:19, :]) * mask
            dz = (z_pred - tgt_z) * mask
            q_rows = [yg[3 + i:4 + i, :] for i in range(4)]
            e_rows, aux = _euler_forward(q_rows)
            de = [(e_rows[i] - e_tgt[i:i + 1, :]) * mask for i in range(3)]
            loss = (jnp.sum(dpos * dpos) * inv_pos
                    + jnp.sum(dstates * dstates) * inv_states
                    + (jnp.sum(de[0] * de[0]) + jnp.sum(de[1] * de[1])
                       + jnp.sum(de[2] * de[2])) * inv_eul
                    + jnp.sum(dz * dz) * inv_z)
            cot_e = [2.0 * inv_eul * de[i] for i in range(3)]
            dq = _euler_backward(aux, cot_e)
            g = jnp.concatenate(
                [2.0 * ds * inv_pos * dpos]
                + [ds * dq[i] for i in range(4)]
                + [2.0 * ds * inv_states * dstates,
                   2.0 * inv_z * dz,
                   jnp.zeros((7, x.shape[1]), f32)], axis=0)   # (32, Cp)
            g_s[:] = g

            # ---- reduce_on_plateau, then AdamW with the new scale ----
            improved = loss < (1.0 - rtol) * best
            best = jnp.where(improved, loss, best)
            cnt = jnp.where(improved, 0, pcount + 1)
            hit = cnt == patience
            scale = jnp.where(hit, scale * factor, scale)
            pcount = jnp.where(hit, 0, cnt)

            t = t0 + (e + 1).astype(f32)
            bc1 = 1.0 - jnp.exp(t * float(np.log(_ADAM_B1)))
            bc2 = 1.0 - jnp.exp(t * float(np.log(_ADAM_B2)))
            step_sz = lr * scale

            def adam(P, Gd, mu, nu, clamp_mask):
                mu = _ADAM_B1 * mu + (1.0 - _ADAM_B1) * Gd
                nu = _ADAM_B2 * nu + (1.0 - _ADAM_B2) * Gd * Gd
                upd = (mu / bc1) / (jnp.sqrt(nu / bc2) + _ADAM_EPS)
                if wd:
                    upd = upd + wd * P
                P = P - step_sz * upd
                if clamp and clamp_mask is not None:
                    P = jnp.where(clamp_mask, jnp.maximum(P, 0.0), P)
                return P, mu, nu

            dB2 = jnp.sum(g * mask, axis=1, keepdims=True)
            B2, mB2, vB2 = adam(B2, dB2, mB2, vB2, None)

            # ---- phase B: recompute + backward + update, streamed ----
            def bwd_tile(t_, _):
                stream_in(t_, ((w1o, wt1), (m1o, mt1), (v1o, vt1),
                               (w2o, wt2), (m2o, mt2), (v2o, vt2)))
                a1 = dot(wt1[:], x, ((0,), (0,)))
                hact = jnp.where(a1 > 0, a1, jnp.exp(a1) - 1.0)
                gl = g_s[:]
                dh = dot(wt2[:], gl, ((0,), (0,)))          # (HT, Cp)
                da1 = dh * jnp.where(a1 > 0, 1.0, jnp.exp(a1))
                dW1t = dot(x, da1, ((1,), (1,)))            # (DP, HT)
                dW2t = dot(gl, hact, ((1,), (1,)))          # (32, HT)
                W1n, m1n, v1n = adam(wt1[:], dW1t, mt1[:], vt1[:], clamp1)
                W2n, m2n, v2n = adam(wt2[:], dW2t, mt2[:], vt2[:], clamp2)
                wt1[:] = W1n
                mt1[:] = m1n
                vt1[:] = v1n
                wt2[:] = W2n
                mt2[:] = m2n
                vt2[:] = v2n
                stream_out(t_, ((wt1, w1o), (mt1, m1o), (vt1, v1o),
                                (wt2, w2o), (mt2, m2o), (vt2, v2o)))
                return 0

            jax.lax.fori_loop(0, n_ht, bwd_tile, 0)

            losses = jnp.where(lane_e == e, loss, losses)
            return (best, pcount, scale, losses, B2, mB2, vB2)

        init = (ss[0, 1], ss[0, 2].astype(jnp.int32), ss[0, 3],
                jnp.full((1, Ep), jnp.nan, f32),
                b2_ref[:], mb2_ref[:], vb2_ref[:])
        best, pcount, scale, losses, B2, mB2, vB2 = jax.lax.fori_loop(
            0, E, body, init)
        b2o_ref[:] = B2
        mb2o_ref[:] = mB2
        vb2o_ref[:] = vB2
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        sso_ref[:] = jnp.where(
            lane128 == 0, t0 + E, jnp.where(
                lane128 == 1, best, jnp.where(
                    lane128 == 2, pcount.astype(jnp.float32), jnp.where(
                        lane128 == 3, scale, jnp.where(
                            lane128 == 4, ds, 0.0))))).astype(jnp.float32)
        loss_ref[:] = losses

    def run_one(p, params, trajs, controls, opt_state):
        f32 = jnp.float32
        trajs = jnp.asarray(trajs, f32)
        controls = jnp.asarray(controls, f32)
        (xp, y_base, z_phys, tgt_y, tgt_z, e_tgt, mask,
         inv, ds, Cp) = precompute(p, trajs, controls)
        HT = _pick_ht(Cp, DP)
        if HT < 128:
            raise ValueError(f"no hidden tile fits VMEM at Cp={Cp}")
        HT = min(HT, ((hidden + 127) // 128) * 128)
        Hp = ((hidden + HT - 1) // HT) * HT
        n_ht = Hp // HT
        moments = tuple(opt_state["moments"])
        big, smalls = _pack(params, moments, din, DP, Hp)
        ss = opt_state["scalars"].at[0, 4].set(jnp.asarray(ds, f32))
        Ep = ((E + 127) // 128) * 128
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        big_shapes = [jax.ShapeDtypeStruct(a.shape, f32) for a in big]
        small_shapes = [jax.ShapeDtypeStruct((32, 1), f32)] * 3
        outs = pl.pallas_call(
            partial(kernel, inv_pos=inv["pos"], inv_states=inv["states"],
                    inv_eul=inv["eul"], inv_z=inv["z"], HT=HT, n_ht=n_ht),
            in_specs=[vmem] * 7 + [any_spec] * 6 + [vmem] * 4,
            out_specs=tuple([any_spec] * 6 + [vmem] * 5),
            out_shape=tuple(big_shapes + small_shapes
                            + [jax.ShapeDtypeStruct((1, 128), f32),
                               jax.ShapeDtypeStruct((1, Ep), f32)]),
            scratch_shapes=[pltpu.VMEM((DP, HT), f32),
                            pltpu.VMEM((DP, HT), f32),
                            pltpu.VMEM((DP, HT), f32),
                            pltpu.VMEM((32, HT), f32),
                            pltpu.VMEM((32, HT), f32),
                            pltpu.VMEM((32, HT), f32),
                            pltpu.VMEM((32, Cp), f32),
                            pltpu.VMEM((32, Cp), f32),
                            pltpu.SemaphoreType.DMA((6,))],
            input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3, 11: 4, 12: 5},
            interpret=interpret,
        )(xp, y_base, z_phys, tgt_y, tgt_z, e_tgt, mask, *big, *smalls, ss)
        params_out, moments_out = _unpack(outs[:6], outs[6:9], din, hidden)
        opt_out = {"moments": moments_out, "scalars": outs[9]}
        return params_out, outs[10][0, :E], opt_out

    return run_one


def make_wide_training_run(p, spec: MLPSpec, cfg, n_epochs: int,
                           interpret: bool = False):
    """Streamed-weights sibling of pallas_train.make_fused_training_run —
    same signature, same opaque ``opt_state`` round-trip (moments +
    scalars), numerically matching training.train.make_epoch_scan driven
    by make_optimizer(cfg). Use for hidden widths the VMEM-resident
    kernel declines (fused_trainer_supported -> False at hidden > 512)."""
    run_one = _make_run_one(spec, cfg, n_epochs, interpret)

    @jax.jit
    def run(params, trajs, controls, opt_state=None):
        if opt_state is None:
            opt_state = _fresh_state(params)
        return run_one(p, params, trajs, controls, opt_state)

    return run
