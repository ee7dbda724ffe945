"""On-device wavefront DTW == host exact DTW (ops/dtw.py)."""
import numpy as np
import pytest

from knode_cosserat_tpu.evaluation.metrics import dtw
from knode_cosserat_tpu.ops.dtw import (batch_dtw_device, dtw_device,
                                        tip_dtw_device)


@pytest.mark.parametrize("dist_ord", [1, 2])
@pytest.mark.parametrize("shape", [((30, 3), (30, 3)), ((25, 3), (40, 3)),
                                   ((17,), (9,)), ((1, 2), (12, 2))])
def test_matches_host_exact_dtw(dist_ord, shape):
    rng = np.random.default_rng(hash(shape) % 2**32)
    x = rng.normal(size=shape[0])
    y = rng.normal(size=shape[1])
    host, _ = dtw(x, y, dist_ord=dist_ord)
    dev = float(dtw_device(x, y, dist_ord=dist_ord))
    assert dev == pytest.approx(host, rel=1e-12)


def test_identical_series_zero():
    x = np.random.default_rng(0).normal(size=(20, 3))
    assert float(dtw_device(x, x)) == 0.0


def test_batched():
    rng = np.random.default_rng(1)
    xs = rng.normal(size=(5, 30, 3))
    ys = rng.normal(size=(5, 30, 3))
    dev = np.asarray(batch_dtw_device(xs, ys))
    host = np.array([dtw(x, y)[0] for x, y in zip(xs, ys)])
    np.testing.assert_allclose(dev, host, rtol=1e-12)


def test_tip_dtw_device_matches_metric():
    """Whole-batch tip DTW on device == per-rollout host tip_dtw(exact)."""
    from knode_cosserat_tpu.evaluation.metrics import tip_dtw
    rng = np.random.default_rng(2)
    preds = rng.normal(size=(3, 40, 10, 50))
    ref = rng.normal(size=(40, 10, 50))
    dev = np.asarray(tip_dtw_device(preds, ref))
    host = np.array([tip_dtw(p, ref, exact=True) for p in preds])
    np.testing.assert_allclose(dev, host, rtol=1e-12)
