"""Test configuration: run everything on CPU with 8 virtual devices and x64.

- CPU: deterministic, and lets multi-chip sharding tests run without real
  TPUs (XLA_FLAGS=--xla_force_host_platform_device_count=8 — the TPU-world
  answer to testing multi-node without a cluster, SURVEY.md section 4).
- x64: the reference solver is float64 numpy (knode.py:58-67); parity tests
  need matching precision. f32 behavior is exercised explicitly via dtype
  arguments where relevant.

On-TPU tier: `KNODE_TEST_PLATFORM=tpu python -m pytest tests/ -m tpu`
runs the `tpu`-marked tests on the real chip (Mosaic lowering of every
Pallas kernel family — see tests/test_tpu_kernels.py); the platform pin
and x64 are skipped so the chip is reachable. tpu-marked tests are
deselected from the default CPU run (pytest.ini).
"""
import os
import sys

_TEST_PLATFORM = os.environ.get("KNODE_TEST_PLATFORM", "cpu")

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

if _TEST_PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: this box has a single CPU core, so XLA
# compiles dominate the suite's wall clock. Caching compiled executables
# across runs cuts repeat runs severalfold (first run populates). The dir
# is scoped by a host-CPU fingerprint (arch + model name + flags):
# XLA:CPU cache entries embed AOT machine code tuned to the COMPILING
# host's CPU model, and replaying them after a VM migration SIGSEGVs
# (observed mid-suite in compilation_cache.get_executable_and_time; see
# cli.machine_fingerprint's docstring). Writes are additionally made
# atomic so concurrent processes sharing the dir can't read half-written
# entries. Importing the package here is safe: the platform pin above
# already happened, and importing does not initialize a backend.
from knode_cosserat_tpu.cli import (install_atomic_cache_writes,
                                    machine_fingerprint)

_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache", machine_fingerprint())
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
install_atomic_cache_writes()

import numpy as np
import pytest

# Memory-mapping guard: a full-suite process accumulates tens of
# thousands of memory mappings (every compiled/deserialized XLA:CPU
# executable maps code pages — measured ~3 maps per small executable,
# hundreds for the big vmapped/jacfwd programs) and the kernel's default
# vm.max_map_count is 65530. When the suite crosses it (observed
# repeatedly at ~63%), the next mmap fails and XLA SIGSEGVs inside
# deserialize_executable. Two defenses:
#  1. best-effort raise of the limit (works when running as root);
#  2. per-module jax.clear_caches() below — dropping executable
#     references reclaims ~95% of their mappings (measured).
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 262144:
            _f.seek(0)
            _f.write("262144")
except (OSError, ValueError):
    pass


@pytest.fixture(autouse=True, scope="module")
def _bound_executable_mappings():
    """Release compiled-executable mappings at every module boundary (see
    the max_map_count note above). The persistent compile cache makes the
    next module's re-instantiations cheap deserializes, not recompiles."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def golden_dir():
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
    if not os.path.isdir(d) or not os.listdir(d):
        pytest.skip("golden data not generated (scripts/gen_golden.py)")
    return d


def load_golden(golden_dir, name):
    data = np.load(os.path.join(golden_dir, name + ".npz"))
    return data["controls"], data["traj"]
