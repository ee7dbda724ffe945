"""The driver's bench gate must be un-timeout-able (round-4 failure:
BENCH_r04.json recorded rc=124/parsed=null because bench.py printed the
headline LAST, after every extra and a live torch baseline).

Pins the round-5 contract:
  * the headline JSON line is the FIRST thing on stdout and prints even
    with a zero extras budget;
  * extras respect KNODE_BENCH_BUDGET_S and are listed in
    extra["skipped"] when the budget is exhausted;
  * the process exits 0 (regressions report to stderr/DETAIL, not rc).
"""
import json
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench_run(tmp_path_factory):
    detail = tmp_path_factory.mktemp("bench") / "DETAIL.json"
    env = dict(os.environ)
    env.pop("KNODE_BENCH_DEADLINE", None)
    env.update({
        "KNODE_PLATFORM": "cpu",
        "KNODE_BENCH_EPOCHS": "3",     # shrink the headline program
        "KNODE_BENCH_BUDGET_S": "0",   # extras budget exhausted at start
        "KNODE_BENCH_DETAIL": str(detail),
    })
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        capture_output=True, text=True, env=env, cwd=HERE, timeout=600)
    return proc, detail


def test_headline_prints_first_and_rc_zero(bench_run):
    proc, _ = bench_run
    assert proc.returncode == 0, proc.stderr[-2000:]
    stdout_lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert stdout_lines, f"no stdout; stderr: {proc.stderr[-2000:]}"
    head = json.loads(stdout_lines[0])
    assert head["metric"] == "knode_batched_training_throughput"
    assert head["value"] > 0
    assert "training_xla_epochs_per_sec" in head["extra"]


def test_budget_skips_extras_and_streams_detail(bench_run):
    proc, detail_path = bench_run
    with open(detail_path) as f:
        detail = json.load(f)
    assert detail["backend"] == "cpu"
    skipped = detail["extra"]["skipped"]
    # zero budget: every extra step must have been skipped, none measured
    assert "rollout_fused" in skipped and "serving" in skipped
    assert "rollout_xla_steps_per_sec_n10" not in detail["extra"]
    # the regression report is still present (computed from the headline)
    assert "regressions" in detail["extra"]


def test_deadline_not_reset_by_reexec_env():
    """KNODE_BENCH_DEADLINE is absolute: a re-exec that inherits it keeps
    the original budget window instead of restarting it. And importing
    bench.py must NOT write the env var (a long-lived importer would leak
    an expired deadline into later bench subprocesses)."""
    import importlib.util
    env_backup = os.environ.get("KNODE_BENCH_DEADLINE")
    try:
        os.environ.pop("KNODE_BENCH_DEADLINE", None)
        spec = importlib.util.spec_from_file_location(
            "bench_probe", os.path.join(HERE, "bench.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        # import is side-effect free: no env write, full budget fallback
        assert "KNODE_BENCH_DEADLINE" not in os.environ
        assert mod.DEADLINE is None
        assert mod._remaining() == mod.BUDGET_S
        # the re-exec path: an inherited absolute deadline wins
        os.environ["KNODE_BENCH_DEADLINE"] = "123.0"
        assert mod._init_deadline() == 123.0
        assert mod._remaining() < 0
    finally:
        if env_backup is None:
            os.environ.pop("KNODE_BENCH_DEADLINE", None)
        else:
            os.environ["KNODE_BENCH_DEADLINE"] = env_backup
