"""Rod parameters as a JAX pytree.

TPU-first rewrite of the reference ``CosseratRod`` parameter block
(reference: knode_cosserat/cosserat_ode.py:14-78). Instead of a mutable
class with ``compute_intermediate_terms`` side effects, parameters live in a
frozen dataclass pytree; derived terms are produced by :func:`derive`, a pure
function. This makes the whole parameter set jittable, vmappable (e.g. a
batch of perturbed rods) and shardable.

State conventions (reference: cosserat_ode.py:114-130):
  y (19,) = [p(3), h(4), n(3), m(3), q(3), w(3)]
  z  (6,) = [v(3), u(3)]
All array layouts in this package are *state-last*: ``(..., N, 19)`` etc.,
so batch/node axes map onto TPU lanes and the small state axis stays local.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "RodParams",
    "make_rod",
    "derive",
    "derive_traced",
    "experimental_rod",
    "original_rod",
    "apply_mod",
    "MODS",
    "MODS_ORIGINAL",
]


def _pytree_dataclass(cls):
    """Register a frozen dataclass as a pytree (all fields are leaves except
    those listed in ``cls.__static_fields__``)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    static = getattr(cls, "__static_fields__", ())
    data_fields = [f.name for f in dataclasses.fields(cls) if f.name not in static]

    def flatten(obj):
        children = tuple(getattr(obj, name) for name in data_fields)
        aux = tuple(getattr(obj, name) for name in static)
        return children, aux

    def unflatten(aux, children):
        kwargs = dict(zip(data_fields, children))
        kwargs.update(dict(zip(static, aux)))
        return cls(**kwargs)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class RodParams:
    """Physical + derived parameters for one tendon-driven Cosserat rod.

    Base fields mirror reference cosserat_ode.py:14-47; derived fields mirror
    compute_intermediate_terms (cosserat_ode.py:58-78). ``N`` (node count) is
    static so shapes stay compile-time constant under jit.
    """

    __static_fields__ = ("N", "n_tendons")

    # --- static (shape-determining) ---
    N: int
    n_tendons: int

    # --- base physical parameters ---
    L: Any
    E: Any
    r: Any
    rho: Any
    vstar: Any          # (3,)
    g: Any              # (3,)
    Bse: Any            # (3,3)
    Bbt: Any            # (3,3)
    C: Any              # (3,)
    del_t: Any
    F_tip: Any          # (3,)
    M_tip: Any          # (3,)
    T0: Any
    tendon_offset: Any
    tendon_dirs: Any    # (n_tendons, 3)

    # --- boundary conditions ---
    p0: Any             # (3,)
    h0: Any             # (4,)
    q0: Any             # (3,)
    w0: Any             # (3,)

    # --- derived (filled by `derive`) ---
    A: Any = None
    Gmod: Any = None
    ds: Any = None
    J: Any = None               # (3,3)
    Kse: Any = None             # (3,3)
    Kbt: Any = None             # (3,3)
    c0: Any = None
    c1: Any = None
    c2: Any = None
    Kse_c0Bse_inv: Any = None   # (3,3)
    Kbt_c0Bbt_inv: Any = None   # (3,3)
    Kse_vstar: Any = None       # (3,)
    # `v_rest` = Kse_c0Bse_inv @ Kse_vstar, precomputed in f64 on host so the
    # f32 TPU path avoids the catastrophic cancellation of adding O(1e5)
    # stiffness terms to O(1) internal forces (cosserat_ode.py:140).
    v_rest: Any = None          # (3,)
    rhoA: Any = None
    rhoAg: Any = None           # (3,)
    rhoJ: Any = None            # (3,3)

    def replace(self, **kw) -> "RodParams":
        return dataclasses.replace(self, **kw)

    @property
    def dtype(self):
        return jnp.asarray(self.L).dtype


def derive(p: RodParams, dtype=None) -> RodParams:
    """Pure-functional equivalent of compute_intermediate_terms
    (reference: cosserat_ode.py:58-78). Computed in float64 numpy on host for
    conditioning, then cast to ``dtype`` (default: keep float64 under x64,
    else float32)."""
    L = float(np.asarray(p.L))
    E = float(np.asarray(p.E))
    r = float(np.asarray(p.r))
    rho = float(np.asarray(p.rho))
    del_t = float(np.asarray(p.del_t))
    Bse = np.asarray(p.Bse, np.float64)
    Bbt = np.asarray(p.Bbt, np.float64)
    vstar = np.asarray(p.vstar, np.float64)
    g = np.asarray(p.g, np.float64)

    A = np.pi * r ** 2
    Gmod = E / (2 * (1 + 0.3))
    ds = L / (p.N - 1)
    J = np.diag([np.pi * r ** 4 / 4, np.pi * r ** 4 / 4, np.pi * r ** 4 / 2])
    Kse = np.diag([Gmod * A, Gmod * A, E * A])
    Kbt = np.diag([E * J[0, 0], E * J[1, 1], Gmod * J[2, 2]])

    c0 = 1.5 / del_t
    c1 = -2.0 / del_t
    c2 = 0.5 / del_t

    Kse_c0Bse_inv = np.linalg.inv(Kse + c0 * Bse)
    Kbt_c0Bbt_inv = np.linalg.inv(Kbt + c0 * Bbt)
    Kse_vstar = Kse @ vstar
    v_rest = Kse_c0Bse_inv @ Kse_vstar

    if dtype is None:
        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    cast = lambda x: jnp.asarray(x, dtype)

    return p.replace(
        L=cast(L), E=cast(E), r=cast(r), rho=cast(rho), del_t=cast(del_t),
        vstar=cast(vstar), g=cast(g), Bse=cast(Bse), Bbt=cast(Bbt),
        C=cast(np.asarray(p.C, np.float64)),
        F_tip=cast(np.asarray(p.F_tip, np.float64)),
        M_tip=cast(np.asarray(p.M_tip, np.float64)),
        T0=cast(float(np.asarray(p.T0))),
        tendon_offset=cast(float(np.asarray(p.tendon_offset))),
        tendon_dirs=cast(np.asarray(p.tendon_dirs, np.float64)),
        p0=cast(np.asarray(p.p0, np.float64)),
        h0=cast(np.asarray(p.h0, np.float64)),
        q0=cast(np.asarray(p.q0, np.float64)),
        w0=cast(np.asarray(p.w0, np.float64)),
        A=cast(A), Gmod=cast(Gmod), ds=cast(ds), J=cast(J),
        Kse=cast(Kse), Kbt=cast(Kbt), c0=cast(c0), c1=cast(c1), c2=cast(c2),
        Kse_c0Bse_inv=cast(Kse_c0Bse_inv), Kbt_c0Bbt_inv=cast(Kbt_c0Bbt_inv),
        Kse_vstar=cast(Kse_vstar), v_rest=cast(v_rest),
        rhoA=cast(rho * A), rhoAg=cast(rho * A * g), rhoJ=cast(rho * J),
    )


def _inv3(M):
    """Closed-form (adjugate) 3x3 inverse: differentiable and lowerable on
    every backend/dtype (TPU has no f64 LuDecomposition, which
    jnp.linalg.inv would require)."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    return jnp.stack([jnp.stack([A, B, C]),
                      jnp.stack([D, E, F]),
                      jnp.stack([G, H, I])]) / det


def derive_traced(p: RodParams) -> RodParams:
    """Traceable, differentiable twin of :func:`derive`.

    Recomputes every derived field from the base physical parameters with
    jnp ops, so gradients flow from any downstream loss back to E, L, r,
    rho, Bse/Bbt, C, g, ... — the enabler for gradient-based system
    identification (training/sysid.py), which the reference architecture
    (host-side compute_intermediate_terms, cosserat_ode.py:58-78) cannot
    express.

    Runs in the dtype of the base leaves. Under x64 this matches the host
    :func:`derive` bit-for-bit in practice (<1e-12 relative, pinned by
    tests/test_sysid.py); under f32 the 3x3 inverses lose a little
    conditioning, but every shipped config has Bse = 0 so
    (Kse + c0*Bse)^-1 is a diagonal reciprocal and the v_rest
    reformulation stays exact.
    """
    dtype = p.dtype
    f = lambda x: jnp.asarray(x, dtype)
    L, E, r, rho, del_t = f(p.L), f(p.E), f(p.r), f(p.rho), f(p.del_t)
    Bse, Bbt, vstar, g = f(p.Bse), f(p.Bbt), f(p.vstar), f(p.g)

    A = jnp.pi * r ** 2
    Gmod = E / (2 * (1 + 0.3))
    ds = L / (p.N - 1)
    J = jnp.diag(jnp.stack([jnp.pi * r ** 4 / 4, jnp.pi * r ** 4 / 4,
                            jnp.pi * r ** 4 / 2]))
    Kse = jnp.diag(jnp.stack([Gmod * A, Gmod * A, E * A]))
    Kbt = jnp.diag(jnp.stack([E * J[0, 0], E * J[1, 1], Gmod * J[2, 2]]))

    c0 = 1.5 / del_t
    c1 = -2.0 / del_t
    c2 = 0.5 / del_t

    Kse_c0Bse_inv = _inv3(Kse + c0 * Bse)
    Kbt_c0Bbt_inv = _inv3(Kbt + c0 * Bbt)
    Kse_vstar = Kse @ vstar
    v_rest = Kse_c0Bse_inv @ Kse_vstar

    return p.replace(
        L=L, E=E, r=r, rho=rho, del_t=del_t,
        vstar=vstar, g=g, Bse=Bse, Bbt=Bbt,
        C=f(p.C), F_tip=f(p.F_tip), M_tip=f(p.M_tip),
        T0=f(p.T0), tendon_offset=f(p.tendon_offset),
        tendon_dirs=f(p.tendon_dirs),
        p0=f(p.p0), h0=f(p.h0), q0=f(p.q0), w0=f(p.w0),
        A=A, Gmod=Gmod, ds=ds, J=J,
        Kse=Kse, Kbt=Kbt, c0=c0, c1=c1, c2=c2,
        Kse_c0Bse_inv=Kse_c0Bse_inv, Kbt_c0Bbt_inv=Kbt_c0Bbt_inv,
        Kse_vstar=Kse_vstar, v_rest=v_rest,
        rhoA=rho * A, rhoAg=rho * A * g, rhoJ=rho * J,
    )


def make_rod(N: int = 10, dtype=None, **overrides) -> RodParams:
    """Rod with the reference's default ("paper") parameters
    (cosserat_ode.py:14-47): L=0.4 m, E=109 GPa, r=1.2 mm, rho=8000,
    4 tendons at 45-degree-offset directions, cantilever base BCs."""
    n_tendons = int(overrides.pop("n_tendons", 4))
    theta = np.pi / n_tendons
    tendon_dirs = np.array([
        [np.cos(theta + k * np.pi / 2), np.sin(theta + k * np.pi / 2), 0.0]
        for k in range(4)
    ])
    base = dict(
        N=N, n_tendons=n_tendons,
        L=0.4, E=109e9, r=0.0012, rho=8000.0,
        vstar=np.array([0.0, 0.0, 1.0]),
        g=np.array([0.0, 0.0, -9.81]),
        Bse=np.zeros((3, 3)),
        Bbt=np.diag([3e-2, 3e-2, 3e-2]),
        C=np.array([1e-4, 1e-4, 1e-4]),
        del_t=0.005,
        F_tip=np.zeros(3), M_tip=np.zeros(3),
        T0=5.0, tendon_offset=0.02, tendon_dirs=tendon_dirs,
        p0=np.zeros(3), h0=np.array([1.0, 0.0, 0.0, 0.0]),
        q0=np.zeros(3), w0=np.zeros(3),
    )
    base.update(overrides)
    return derive(RodParams(**base), dtype=dtype)


# --- configurations + perturbation "mods" (fault-injection registry) -------

MODS = ("noair", "nsw", "short", "damping", "dampstiff", "lengthstiff", "youngs")
MODS_ORIGINAL = ("nsw", "short", "damping", "diameter", "youngs", "dampstiff",
                 "lengthstiff")


def experimental_rod(mod: str | None = None, N: int = 10, dtype=None) -> RodParams:
    """Measured-hardware (Delrin rod) parameters + optional perturbation mod
    (reference: knode.py:6-53). Mods deliberately inject wrong physics that
    the KNODE residual must compensate for."""
    kw = dict(del_t=0.05, L=0.635, tendon_offset=0.04445,
              r=0.003175, rho=1411.6751, E=2.757903e9)
    Bbt = 3e-2
    if mod is None:
        pass
    elif mod == "noair":
        kw["C"] = np.zeros(3)
    elif mod == "nsw":
        kw["g"] = np.zeros(3)
    elif mod == "short":
        kw["L"] = 0.4
    elif mod == "damping":
        Bbt = 0.2
    elif mod == "dampstiff":
        Bbt, kw["E"] = 0.2, 10e9
    elif mod == "lengthstiff":
        kw["L"], kw["E"] = 0.4, 10e9
    elif mod == "youngs":
        kw["E"] = 10e9
    else:
        raise ValueError(f"Unknown mod {mod!r}")
    kw["Bbt"] = np.diag([Bbt, Bbt, Bbt])
    return make_rod(N=N, dtype=dtype, **kw)


def original_rod(mod: str | None = None, N: int = 10, dtype=None) -> RodParams:
    """Original-paper parameters + mods (reference: prepare.py:35-73)."""
    kw = dict(del_t=0.005, L=0.4, E=209e9, r=0.0012, rho=8000.0)
    Bbt = 5e-4
    if mod is None:
        pass
    elif mod == "nsw":
        kw["g"] = np.zeros(3)
    elif mod == "short":
        kw["L"] = 0.3
    elif mod == "damping":
        Bbt = 9e-4
    elif mod == "diameter":
        kw["r"] = 0.002
    elif mod == "youngs":
        kw["E"] = 109e9
    elif mod == "dampstiff":
        Bbt, kw["E"] = 3e-2, 109e9
    elif mod == "lengthstiff":
        kw["L"], kw["E"] = 0.3, 109e9
    else:
        raise ValueError(f"Unknown mod {mod!r}")
    kw["Bbt"] = np.diag([Bbt, Bbt, Bbt])
    return make_rod(N=N, dtype=dtype, **kw)


def apply_mod(mod: str | None, original: bool = False, N: int = 10, dtype=None
              ) -> RodParams:
    """Dispatch matching reference setup_robot(robot, mod, original)."""
    if original:
        return original_rod(mod, N=N, dtype=dtype)
    return experimental_rod(mod, N=N, dtype=dtype)
