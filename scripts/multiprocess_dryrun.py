"""Multi-process CI recipe: jax.distributed over K local processes.

Validates the multi-host story (parallel/distributed.py) without a pod:
K worker processes each expose 4 virtual CPU devices, rendezvous through
``jax.distributed.initialize``, build ONE global ("data","seq","model")
mesh over all K*4 devices, and run a jitted computation whose psum spans
processes. On a real pod slice the same code path runs with
``init_distributed()`` picking the coordinator from the TPU environment
— this script is the single-box CI stand-in (docs/ROADMAP.md
"multi-process CI recipe").

Run:  python scripts/multiprocess_dryrun.py            (launcher, K=2)
      python scripts/multiprocess_dryrun.py --worker I (internal)
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
K = 2
LOCAL_DEVICES = 4
PORT = int(os.environ.get("KNODE_MP_PORT", "52123"))


def worker(pid: int):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from knode_cosserat_tpu.parallel.distributed import (init_distributed,
                                                         process_summary)
    from knode_cosserat_tpu.parallel import make_mesh

    active = init_distributed(f"localhost:{PORT}", num_processes=K,
                              process_id=pid)
    assert active, "init_distributed did not activate"
    assert jax.process_count() == K
    assert jax.device_count() == K * LOCAL_DEVICES
    print(process_summary(), flush=True)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(data=K, seq=2, model=2)

    # a globally-sharded array built from process-local shards, reduced
    # across the whole mesh — the collective crosses process boundaries
    global_shape = (K * LOCAL_DEVICES, 8)
    sharding = NamedSharding(mesh, P(("data", "seq", "model"), None))
    x = jax.make_array_from_callback(
        global_shape, sharding,
        lambda idx: np.arange(global_shape[0], dtype=np.float32)[idx[0],
                                                                 None]
        * np.ones((1, 8), np.float32))

    total = jax.jit(lambda a: jnp.sum(a),
                    out_shardings=NamedSharding(mesh, P()))(x)
    expect = float(np.arange(K * LOCAL_DEVICES).sum() * 8)
    got = float(jax.device_get(total))
    assert got == expect, (got, expect)
    if pid == 0:
        print("MULTIPROCESS OK", flush=True)


def launch():
    procs = []
    for pid in range(K):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(pid)],
            stdout=None if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if pid == 0 else subprocess.DEVNULL))
    rcs = [p.wait(timeout=300) for p in procs]
    if any(rcs):
        raise SystemExit(f"worker exit codes {rcs}")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    else:
        launch()
