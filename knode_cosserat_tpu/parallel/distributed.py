"""Multi-host (multi-slice) initialization.

The reference has no distributed backend at all (SURVEY.md section 2.3 —
its only transports are POSIX pipes, pyserial and ROS topics). In the
TPU-native design, scale-out beyond one host is `jax.distributed` + the
same ("data", "seq", "model") mesh: collectives ride ICI within a slice and
DCN across slices; no NCCL/MPI analogue is needed.

Call ``init_distributed()`` once per process before any other jax call on
multi-host pods (on single-host it is a no-op), then build meshes with
``parallel.make_mesh`` over ``jax.devices()`` (global) as usual. Shardings
that keep the "data" axis outermost map data-parallel gradient reductions
onto DCN and everything else onto ICI — the standard layout rule.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["init_distributed", "is_multihost", "process_summary"]


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process; returns True
    if distributed mode is active. Arguments default to the standard env
    (TPU pods auto-configure; GPU/CPU clusters use JAX_COORDINATOR_ADDRESS
    etc.)."""
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    # some single-chip tunnels export a warning STRING here; only treat it
    # as a pod when it looks like a comma-separated hostname list
    auto_tpu = hostnames and " " not in hostnames and "," in hostnames
    if not (explicit or auto_tpu or num_processes):
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_summary() -> str:
    return (f"process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local of "
            f"{jax.device_count()} global devices")
