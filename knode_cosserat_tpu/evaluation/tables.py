"""Experiment-grid evaluation: DTW/pose-MSE tables vs the no-NN baseline.

Rebuild of the eval sweeps in physics_multitrain.py:169-233 (per-cell
rollout -> fastdtw + pose MSE -> % change vs baseline table, records saved
to evals/) and the cross-seed aggregation in physics_multigraphs.py:99-148.
Rollouts for all grid cells are batched on device via vmap; metrics are
host-side.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..controls import calc_controls
from ..core.params import RodParams, apply_mod
from ..core.stepper import simulate, simulate_scan
from ..models.mlp import MLPSpec, bind
from .metrics import pct_error, pose_mse, tip_dtw

__all__ = ["EvalRecord", "make_eval_data", "evaluate_cells",
           "format_table", "aggregate_seeds"]


@dataclasses.dataclass
class EvalRecord:
    label: str            # e.g. "sine sine 0.5 1.0 nsw 0" or "baseline nsw"
    eval_name: str        # e.g. "sine 1.5"
    dtw: float
    mse: float
    dtw_pct: Optional[float] = None   # vs the matching baseline
    mse_pct: Optional[float] = None
    tensions: Optional[np.ndarray] = None
    reference: Optional[np.ndarray] = None
    predicted: Optional[np.ndarray] = None


def make_eval_data(reference_rod: RodParams, eval_set: Sequence[str],
                   eval_len: int = 100) -> Dict[str, dict]:
    """Reference rollouts for each eval schedule (calc_evaldata,
    physics_multitrain.py:132-138). Newton tolerance is dtype-appropriate
    (a below-f32-resolution tol would force max_iter on every step)."""
    from ..training.train import _default_tol
    out = {}
    tol = _default_tol(reference_rod.dtype)
    for name in eval_set:
        kind, arg = name.split(" ")
        controls = calc_controls(kind, float(arg),
                                 float(reference_rod.del_t), eval_len)
        traj = np.asarray(simulate(reference_rod, controls,
                                   tol=tol))[:, :, :25]
        out[name] = {"controls": controls, "interpolated": traj}
    return out


def _batched_nn_rollouts(rods, spec: MLPSpec, params_stacked, controls):
    """vmap the hybrid rollout over stacked rods + per-cell MLP params."""
    from ..training.train import _default_tol
    tol = _default_tol(controls.dtype)

    def one(rod, nn_params):
        nn_fn = bind(spec, nn_params)
        return simulate_scan(rod, controls, nn_fn=nn_fn,
                             nn_history=spec.history, tol=tol).traj
    return jax.jit(jax.vmap(one))(rods, params_stacked)


_MEGA_VMAP_CACHE: dict = {}


def _mega_nn_rollouts(cells, spec: MLPSpec, params_list, controls,
                      original: bool, interpret: bool = False):
    """Hybrid eval rollouts on the mega step kernel (ops/pallas_step.py):
    cells grouped by mod (one kernel per unique rod, via the shared
    content-keyed mega-rollout LRU in core.fast_rollout), the group's
    per-cell MLP params vmapped over the kernel — the Pallas batching rule
    lifts the whole-Newton-solve launch over the cell axis. Returns trajs
    ordered like ``cells``."""
    from ..core.fast_rollout import mega_rollout_cached
    from ..training.train import _default_tol

    out = [None] * len(cells)
    by_mod: Dict[Optional[str], list] = {}
    for i, c in enumerate(cells):
        by_mod.setdefault(c.mod, []).append(i)
    for mod, idxs in by_mod.items():
        rod = apply_mod(mod, original=original)
        base = mega_rollout_cached(rod, spec, tol=_default_tol(rod.dtype),
                                   interpret=interpret)
        # one vmapped wrapper per cached base rollout (vmap is cheap to
        # re-derive but jit caching keys on the wrapper object identity;
        # the entry holds base so the id key cannot alias after GC)
        hit = _MEGA_VMAP_CACHE.get(id(base))
        if hit is not None and hit[0] is base:
            roll = hit[1]
        else:
            roll = jax.jit(jax.vmap(base, in_axes=(None, 0)))
            _MEGA_VMAP_CACHE[id(base)] = (base, roll)
        params_st = jax.tree.map(lambda *xs: jnp.stack(xs),
                                 *[params_list[i] for i in idxs])
        trajs, _, _ = roll(controls[None], params_st)   # (G, 1, T, N, 50)
        for j, i in enumerate(idxs):
            out[i] = trajs[j, 0]
    return jnp.stack(out)


def evaluate_cells(
    cells,                       # Sequence[GridCell]
    params_list,                 # per-cell MLP params
    spec: MLPSpec,
    eval_set: Sequence[str],
    reference_rod: Optional[RodParams] = None,
    eval_len: int = 100,
    original: bool = False,
    save_dir: Optional[str] = None,
    keep_arrays: bool = False,
    impl: str = "auto",
    dtw_impl: str = "device",
) -> List[EvalRecord]:
    """Roll out every trained cell + every no-NN baseline on every eval
    schedule; score DTW + pose MSE with % change vs the baseline of the same
    mod (physics_multitrain.py:178-233).

    impl: "auto" (= "xla"), "mega", "mega-interpret" (CPU testing), or
    "xla". Wide-grid eval is a THROUGHPUT problem: the batched XLA scan
    rollout vmaps every (cell, rod) pair in ONE compiled program and runs
    the robust newton_solve (LM stall escalation, max-effort tol) — the
    right default. "mega" trades that for the one-launch-per-step latency
    kernel (one Mosaic compile per mod, plain-stall Newton): measured
    slower end-to-end at 40 cells and less robust on marginally-stable
    hybrid rollouts; use it for small cell counts when the kernels are
    already compiled. dtw_impl: "device" scores the whole batch with the
    exact anti-diagonal-wavefront DTW (ops/dtw.py) in one program; "host"
    keeps the per-cell fastdtw approximation (the reference's metric —
    equal on these smooth tip trajectories, pinned by
    tests/test_framework.py)."""
    if impl == "auto":
        impl = "xla"
    if reference_rod is None:
        reference_rod = apply_mod(None, original=original)
    dtype = reference_rod.dtype
    eval_data = make_eval_data(reference_rod, eval_set, eval_len)

    def score_dtw(trajs_b, ref_traj):
        """(B, T, N, >=25) predicted batch -> list of B DTW distances."""
        if dtw_impl == "device":
            from ..ops.dtw import tip_dtw_device
            return [float(d) for d in np.asarray(tip_dtw_device(
                jnp.asarray(trajs_b)[:, :, :, :25],
                jnp.asarray(ref_traj)))]
        return [tip_dtw(np.asarray(t)[:, :, :25], ref_traj)
                for t in trajs_b]

    mods = sorted({c.mod for c in cells}, key=str)
    records: List[EvalRecord] = []
    baselines: Dict[Tuple[str, Optional[str]], Dict[str, float]] = {}

    for eval_name in eval_set:
        controls = jnp.asarray(eval_data[eval_name]["controls"], dtype)
        ref_traj = eval_data[eval_name]["interpolated"]

        # --- baselines: modified rods, no NN, batched over mods ---
        rods_b = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[apply_mod(m, original=original) for m in mods])
        from ..training.train import _default_tol
        base_trajs = jax.jit(jax.vmap(
            lambda rod: simulate_scan(
                rod, controls, tol=_default_tol(dtype)).traj))(rods_b)
        base_dtws = score_dtw(base_trajs, ref_traj)
        for mod, traj, dtw in zip(mods, np.asarray(base_trajs), base_dtws):
            mse = pose_mse(traj[:, :, :25], ref_traj)
            baselines[(eval_name, mod)] = {"dtw": dtw, "mse": mse}
            records.append(_record(f"baseline {mod}", eval_name, dtw, mse,
                                   None, None, eval_data[eval_name], traj,
                                   save_dir, keep_arrays, original))

        # --- trained cells, batched ---
        if cells:
            if impl.startswith("mega"):
                cell_trajs_d = _mega_nn_rollouts(
                    cells, spec, params_list, controls, original,
                    interpret=impl == "mega-interpret")
            else:
                rods_c = jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[apply_mod(c.mod, original=original) for c in cells])
                params_st = jax.tree.map(lambda *xs: jnp.stack(xs),
                                         *params_list)
                cell_trajs_d = _batched_nn_rollouts(
                    rods_c, spec, params_st, controls)
            cell_dtws = score_dtw(cell_trajs_d, ref_traj)
            cell_trajs = np.asarray(cell_trajs_d)
            for cell, traj, dtw in zip(cells, cell_trajs, cell_dtws):
                mse = pose_mse(traj[:, :, :25], ref_traj)
                base = baselines[(eval_name, cell.mod)]
                records.append(_record(
                    f"{cell.data} {cell.mod} {cell.seed}", eval_name, dtw,
                    mse, pct_error(dtw, base["dtw"]),
                    pct_error(mse, base["mse"]), eval_data[eval_name], traj,
                    save_dir, keep_arrays, original))
    return records


def _record(label, eval_name, dtw, mse, dtw_pct, mse_pct, eval_data, traj,
            save_dir, keep_arrays, original):
    rec = EvalRecord(label=label, eval_name=eval_name, dtw=dtw, mse=mse,
                     dtw_pct=dtw_pct, mse_pct=mse_pct)
    if keep_arrays:
        rec.tensions = eval_data["controls"]
        rec.reference = eval_data["interpolated"]
        rec.predicted = traj[:, :, :25]
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        prefix = "physics_original" if original else "physics"
        fname = (eval_name.replace(" ", "_") + "+"
                 + label.replace(" ", "_"))
        np.savez_compressed(
            os.path.join(save_dir, f"{prefix}_{fname}.npz"),
            tensions=eval_data["controls"],
            reference=eval_data["interpolated"],
            predicted=traj[:, :, :25])
    return rec


def format_table(records: List[EvalRecord], space: int = 40) -> str:
    """The semicolon-padded text table (physics_multitrain.py:172-233)."""
    eval_names = sorted({r.eval_name for r in records})
    labels = list(dict.fromkeys(r.label for r in records))
    by = {(r.label, r.eval_name): r for r in records}

    lines = [" " * space + "".join(
        (";" + e + " DTW").ljust(20) + (";" + e + " PQ MSE").ljust(20)
        for e in eval_names)]
    for label in labels:
        row = label.ljust(space)
        for e in eval_names:
            r = by.get((label, e))
            if r is None:
                row += ";-".ljust(40)
            elif r.dtw_pct is None:
                row += f";{r.dtw:.2f}".ljust(20) + f";{r.mse:.2f}".ljust(20)
            else:
                row += (f";{r.dtw:.2f} ({r.dtw_pct:+.1f}%)".ljust(20)
                        + f";{r.mse:.2f} ({r.mse_pct:+.1f}%)".ljust(20))
        lines.append(row)
    return "\n".join(lines)


def aggregate_seeds(records: List[EvalRecord]) -> List[EvalRecord]:
    """Average DTW/MSE across seeds per (data, mod, eval) and recompute %
    change vs the baseline (physics_multigraphs.py:108-148)."""
    def strip_seed(label: str) -> str:
        parts = label.split(" ")
        return " ".join(parts[:-1]) if parts[-1].isdigit() else label

    groups: Dict[Tuple[str, str], List[EvalRecord]] = {}
    baselines = {}
    for r in records:
        if r.label.startswith("baseline"):
            baselines[(r.label, r.eval_name)] = r
        else:
            groups.setdefault((strip_seed(r.label), r.eval_name),
                              []).append(r)

    out = list(baselines.values())
    for (label, eval_name), rs in groups.items():
        dtw = float(np.mean([r.dtw for r in rs]))
        mse = float(np.mean([r.mse for r in rs]))
        mod = label.split(" ")[-1]
        base = baselines.get((f"baseline {mod}", eval_name))
        out.append(EvalRecord(
            label=label, eval_name=eval_name, dtw=dtw, mse=mse,
            dtw_pct=pct_error(dtw, base.dtw) if base else None,
            mse_pct=pct_error(mse, base.mse) if base else None))
    return out
