"""Mixed-precision residual nets (MLPSpec.compute_dtype / TrainConfig.nn_dtype).

bf16 casts apply ONLY to the MLP matmul inputs: accumulation, physics,
loss, and the f32 master weights stay full precision. The fused whole-run
kernel declines mixed-precision specs (it is an exact-f32-parity kernel);
the XLA epoch scan carries them.
"""
import jax
import jax.numpy as jnp
import numpy as np

from knode_cosserat_tpu.core.params import make_rod
from knode_cosserat_tpu.models.mlp import MLPSpec, init_mlp, mlp_apply
from knode_cosserat_tpu.ops.pallas_train import fused_trainer_supported
from knode_cosserat_tpu.training.train import (TrainConfig, _resolve_fused,
                                               train_knode)


def test_bf16_apply_matches_f32_within_bf16_eps():
    spec32 = MLPSpec.for_knode(64)
    spec16 = MLPSpec.for_knode(64, compute_dtype="bfloat16")
    params = init_mlp(spec32, jax.random.PRNGKey(0), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 28), jnp.float32)
    y32 = mlp_apply(spec32, params, x)
    y16 = mlp_apply(spec16, params, x)
    assert y16.dtype == jnp.float32            # caller dtype preserved
    rel = np.abs(np.asarray(y16 - y32)).max() / (
        np.abs(np.asarray(y32)).max() + 1e-12)
    assert rel < 2e-2, rel                     # bf16 has ~3 decimal digits


def test_bf16_gradients_flow_to_f32_master_weights():
    spec = MLPSpec.for_knode(64, compute_dtype="bfloat16")
    params = init_mlp(spec, jax.random.PRNGKey(0), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 28), jnp.float32)

    def loss(p):
        return jnp.sum(mlp_apply(spec, p, x) ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for layer in grads:
        assert layer["w"].dtype == jnp.float32
        assert np.isfinite(np.asarray(layer["w"])).all()
        assert np.abs(np.asarray(layer["w"])).max() > 0


def test_fused_trainer_declines_mixed_precision():
    spec = MLPSpec.for_knode(512, compute_dtype="bfloat16")
    assert not fused_trainer_supported(spec, 128)
    cfg = TrainConfig(hidden=512, nn_dtype="bfloat16", fused="auto")
    assert _resolve_fused(cfg, cfg.spec(), 128, None) is None


def test_train_knode_bf16_trains():
    """End-to-end: a few epochs of mixed-precision training reduce the loss
    on the same data as the f32 path."""
    from knode_cosserat_tpu.controls import calc_controls
    from knode_cosserat_tpu.core.stepper import simulate_scan

    rod = make_rod(N=10, dtype=jnp.float32)
    ctl = jnp.asarray(calc_controls("sine", 0.5, float(rod.del_t), 12),
                      jnp.float32)
    traj = simulate_scan(rod, ctl, tol=1e-10).traj[:, :, :25]
    cfg = TrainConfig(epochs=40, hidden=64, eval_every=1000, log_every=1000,
                      nn_dtype="bfloat16", fused="off", seed=0)
    res = train_knode(rod, traj[None], ctl[None], cfg, log=None)
    assert res.params[0]["w"].dtype == jnp.float32   # master weights
    hist = res.loss_history
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]
