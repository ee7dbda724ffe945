"""End-to-end KNODE experiment: training the residual on reference-rod data
must improve the perturbed rod's validation DTW vs its no-NN baseline —
the paper's headline result (arXiv 2408.07776), at smoke-test scale."""
import numpy as np

from knode_cosserat_tpu import apply_mod
from knode_cosserat_tpu.training import (TrainConfig, make_training_data,
                                         make_validation_reference,
                                         train_knode)


def test_knode_beats_no_nn_baseline():
    ref = apply_mod(None)
    p_mod = apply_mod("nsw")  # physics deliberately wrong: no gravity
    trajs, ctls = make_training_data(ref, [("sine", 0.5)], train_len=10)
    vc, vr = make_validation_reference(ref, ("sine", 1.25), eval_len=20)
    cfg = TrainConfig(epochs=30, eval_every=15, log_every=10**9,
                      hidden=64, dtype="float64")
    res = train_knode(p_mod, trajs, ctls, cfg, vc, vr, eval_rod=p_mod,
                      log=None)
    baseline_dtw = dict(res.dtw_history)[0]   # epoch-0 eval = no-NN
    assert res.best_dtw < baseline_dtw * 0.85, (
        f"KNODE best DTW {res.best_dtw} vs baseline {baseline_dtw}")
    # loss went down substantially too
    assert res.loss_history[-1] < res.loss_history[0] * 0.1
