"""Diagnostic: split the on-chip GN identifiability eigenvalue inflation
(7.9e-7 vs CPU-f64 7.9e-11) into its two candidate causes:

  (a) the Jacobian J itself is less precise on TPU (MXU default-precision
      bf16 matmuls inside jacfwd through the physics), or
  (b) the dd_gram (double-double) contraction mis-lowers on Mosaic/VPU.

Protocol matches tests/test_tpu_kernels.py::test_tpu_gn_identifiability...
Computes J on chip, then eigendecomposes three Grams:
  1. host-f64 Gram of the chip J        -> isolates J quality
  2. dd_gram on chip of the chip J      -> isolates the dd lowering
  3. same two with jax.default_matmul_precision('highest')
Also computes J on CPU f32 for the baseline.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def protocol(p_mod):
    from knode_cosserat_tpu import calc_controls, experimental_rod
    from knode_cosserat_tpu.core.stepper import simulate_scan
    p = experimental_rod(dtype=jnp.float32)
    ctl = jnp.asarray(calc_controls("sine", 0.5, float(p.del_t), 30),
                      jnp.float32)
    traj = simulate_scan(p, ctl).traj[:, :, :25]
    return p, ctl, traj


def jac_and_grams(tag):
    from knode_cosserat_tpu.models.mlp import MLPSpec
    from knode_cosserat_tpu.ops.dd import dd_gram, dd_to_float64
    from knode_cosserat_tpu.training import sysid as S

    p, ctl, traj = protocol(None)
    fields = ("E", "r", "L", "rho", "Bbt")
    theta = S.theta_init(p, fields)
    vec0, labels, unpack = S._flatten_theta(theta)
    res_fn = S._make_residual_fn(p, traj[None], ctl[None], "teacher",
                                 S.DEFAULT_KEYPOINTS_FAST,
                                 MLPSpec.for_knode(), None, "euler",
                                 None, 50, skip_first=False)

    def res_of_vec(v):
        return res_fn({"phys": unpack(v)})

    J = np.asarray(jax.jit(jax.jacfwd(res_of_vec))(vec0), np.float64)
    G_host = J.T @ J
    w_host = np.linalg.eigvalsh(2.0 * G_host)
    hi, lo = jax.jit(dd_gram)(jnp.asarray(J, jnp.float32))
    w_dd = np.linalg.eigvalsh(2.0 * dd_to_float64(hi, lo))
    print(f"[{tag}] J shape {J.shape}  |J|max {np.abs(J).max():.3e}")
    print(f"[{tag}] host-f64 Gram eig: min {w_host[0]:.4e} max {w_host[-1]:.4e}")
    print(f"[{tag}] chip dd  Gram eig: min {w_dd[0]:.4e} max {w_dd[-1]:.4e}")
    # singular values of J directly (the ground truth for this J)
    s = np.linalg.svd(J, compute_uv=False)
    print(f"[{tag}] J sigma: min {s[-1]:.4e} max {s[0]:.4e} "
          f"-> 2*s_min^2 {2*s[-1]**2:.4e}")
    return w_host, w_dd


def main():
    print("devices:", jax.devices())
    print("== default matmul precision ==")
    jac_and_grams("default")
    print("== highest matmul precision ==")
    with jax.default_matmul_precision("highest"):
        jac_and_grams("highest")


if __name__ == "__main__":
    main()
