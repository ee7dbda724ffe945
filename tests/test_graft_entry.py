"""The driver's external gates, exercised in-repo so they can never regress
silently again (round-1 lesson: MULTICHIP_r01 failed because nothing in
tests/ ever called dryrun_multichip).

Two layers:
- in-process: dryrun_multichip(8) under the test conftest (8 virtual CPUs
  already provisioned) and entry() compile+run.
- subprocess: the driver's exact invocation — a FRESH python process with no
  JAX env prep at all, where dryrun_multichip must provision its own virtual
  CPU devices before backend init (the round-1 failure mode).
"""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as ge


def test_entry_jits_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    y_new, z_new, G_new, res = jax.tree.map(np.asarray, out)
    assert y_new.shape[-1] == 19 and z_new.shape[-1] == 6
    assert G_new.shape == (6,)
    assert np.isfinite(res) and res < 1e-6
    assert np.all(np.isfinite(y_new))


def test_dryrun_multichip_in_process():
    # conftest already provisioned 8 virtual CPU devices
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_fresh_process():
    """Exactly what the driver runs: no XLA_FLAGS, no JAX_PLATFORMS, import
    the module and call dryrun_multichip(8)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    code = ("import __graft_entry__ as ge; ge.dryrun_multichip(8); "
            "print('FRESH_OK')")
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "FRESH_OK" in r.stdout
