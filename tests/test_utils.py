"""Utility-module tests: metrics logging, profiling timers, normalization."""
import json
import os

import numpy as np

from knode_cosserat_tpu.utils import (MetricsLogger, Timer, normalize_data,
                                      denormalize_data, timed)


def test_metrics_logger_jsonl_and_stdout(tmp_path, capsys):
    path = str(tmp_path / "metrics.jsonl")
    log = MetricsLogger(path, stdout=True, run_name="t")
    log.log(0, loss=1.5)
    log.log(10, loss=0.5, dtw=2.0)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 0 and lines[0]["loss"] == 1.5
    assert lines[1]["dtw"] == 2.0
    out = capsys.readouterr().out
    # reference-compatible stdout format (physics_multitrain regex target)
    assert "Epoch 0" in out and "Total loss:" in out


def test_timer_phases():
    t = Timer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a" in t.report() and "avg" in t.report()


def test_timed_logs(capsys):
    with timed("thing"):
        pass
    assert "thing:" in capsys.readouterr().out


def test_normalize_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(20, 5) * 3 + 1
    n, mn, rg = normalize_data(x)
    assert n.min() >= 0 and n.max() <= 1 + 1e-12
    back = denormalize_data(n, mn, rg)
    np.testing.assert_allclose(back, x, rtol=1e-12)
    # 3D: normalization over (time, space); returned mins/ranges are
    # squeezed per the reference contract (denormalize then needs a
    # broadcastable shape, i.e. vals[:, None])
    x3 = rng.randn(20, 5, 7) * 3 + 1
    n3, mn3, rg3 = normalize_data(x3)
    assert n3.min() >= 0 and n3.max() <= 1 + 1e-12
    back3 = denormalize_data(n3, mn3[:, None], rg3[:, None])
    np.testing.assert_allclose(back3, x3, rtol=1e-12)
