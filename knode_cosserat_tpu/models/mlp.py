"""The KNODE residual MLP as a plain JAX pytree.

Parity target: the reference's nn.ModuleList MLP
(cosserat_ode_torch.py:53-105): Linear(in -> hidden) - ELU - Linear(hidden
-> 25), input 28 = [y, z, tendon_forces] or 53 with history, output 25 =
residual on [ys(19), z(6)]. Initialization is non-negative |N(0.01, 0.01)|
for weights and N(0, 0.01) for biases (:76-105); after every optimizer step
ALL weight matrices are clamped >= 0 (physics_train.py:299-304 — the
"layer1" name filter there never matches a ModuleList entry, so every Linear
weight is clamped; we replicate that).

No framework dependency: params are a tuple of {'w','b'} dicts, apply() is a
couple of jnp.dot calls that land on the MXU. The activation registry covers
every activation the reference's numpy shim recognizes
(cosserat_ode.py:90-112: tanh, softplus, relu, elu).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["MLPSpec", "init_mlp", "mlp_apply", "clamp_nonnegative",
           "count_params", "bind", "ACTIVATIONS"]

ACTIVATIONS = {
    "tanh": jnp.tanh,
    "softplus": jax.nn.softplus,
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "identity": lambda x: x,
}


@dataclasses.dataclass(frozen=True)
class MLPSpec:
    """Static architecture description (hashable — usable as a jit static arg).

    dims: layer widths, e.g. (28, 512, 25) for the reference default
      (cosserat_ode_torch.py:60-62 with n_layers=512, physics_train.py:47).
    activation: name from ACTIVATIONS applied between Linear layers.
    history: 53-input variant using [y, yh, z, zh, tf] (cosserat_ode.py:173).
    compute_dtype: optional matmul storage dtype ("bfloat16") for mixed
      precision — inputs and weights are cast down for the MXU passes while
      accumulation, bias add, activation, and the returned output stay in
      the caller's dtype (master weights are untouched). NOTE: on TPU this
      is a MEMORY knob, not a throughput knob — XLA's DEFAULT precision
      already runs f32 matmuls as single-pass bf16 MXU ops, so explicit
      bf16 storage measured 15-20% SLOWER at 15k cells x hidden 4096/8192
      (the casts are extra VPU work); it halves activation residuals for
      nets too wide to fit otherwise (docs/ROADMAP.md round-3 measurement).
    """
    dims: Tuple[int, ...] = (28, 512, 25)
    activation: str = "elu"
    history: bool = False
    compute_dtype: str | None = None

    @staticmethod
    def for_knode(hidden: int = 512, history: bool = False,
                  activation: str = "elu",
                  compute_dtype: str | None = None) -> "MLPSpec":
        return MLPSpec(dims=(53 if history else 28, hidden, 25),
                       activation=activation, history=history,
                       compute_dtype=compute_dtype)


def init_mlp(spec: MLPSpec, key: jax.Array, dtype=jnp.float32):
    """Non-negative normal init matching non_negative_normal_init
    (cosserat_ode_torch.py:90-105): W = |N(0.01, 0.01)|, b = N(0, 0.01)."""
    params = []
    for din, dout in zip(spec.dims[:-1], spec.dims[1:]):
        key, kw, kb = jax.random.split(key, 3)
        w = jnp.abs(0.01 + 0.01 * jax.random.normal(kw, (dout, din), dtype))
        b = 0.01 * jax.random.normal(kb, (dout,), dtype)
        params.append({"w": w, "b": b})
    return tuple(params)


def mlp_apply(spec: MLPSpec, params, x: jnp.ndarray) -> jnp.ndarray:
    """Forward pass on (..., din) -> (..., dout). Matmuls hit the MXU; keep
    the batch axis large (timesteps x keypoints x trajectories).

    When ``spec.compute_dtype`` is set ("bfloat16"), each matmul's inputs
    are cast down while the MXU accumulates in the caller's dtype — classic
    mixed precision with f32 master weights; gradients flow through the
    casts and land back on the full-precision params."""
    act = ACTIVATIONS[spec.activation]
    cd = jnp.dtype(spec.compute_dtype) if spec.compute_dtype else None
    acc_dtype = x.dtype
    n = len(params)
    for i, layer in enumerate(params):
        w, b = layer["w"], layer["b"]
        if cd is not None:
            x, w = x.astype(cd), w.astype(cd)
        x = jnp.dot(x, w.T, preferred_element_type=acc_dtype) + b
        if i < n - 1:
            x = act(x)
    return x


def bind(spec: MLPSpec, params) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Close the weights over the apply function -> an ``nn_fn`` for
    core.rhs / core.stepper."""
    return lambda x: mlp_apply(spec, params, x)


def clamp_nonnegative(params, skip_first: bool = False):
    """Post-step weight clamp (physics_train.py:299-304). The reference
    clamps every Linear weight (see module docstring); ``skip_first`` exists
    for the documented-but-inert "layer1" exemption."""
    out = []
    for i, layer in enumerate(params):
        if skip_first and i == 0:
            out.append(layer)
        else:
            out.append({"w": jnp.maximum(layer["w"], 0.0), "b": layer["b"]})
    return tuple(out)


def count_params(params) -> int:
    return sum(int(p.size) for layer in params for p in layer.values())
