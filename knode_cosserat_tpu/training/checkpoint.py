"""Structured pytree checkpoints.

The reference checkpoints by pickling the ENTIRE robot object (torch.save of
{'robot', 'dtw', 'loss', 'optim'}, physics_train.py:284-288,413-417), which
couples saved experiments to the exact class code. Here checkpoints are
plain arrays + explicit JSON metadata:

  <path>.npz          leaves (leaf_00000, ...) + structure.json + meta.json
  (or an orbax directory when use_orbax=True)

Any pytree of arrays goes in (MLP params, optax state, loss histories);
loading with ``like=`` restores the exact container types (e.g. optax
NamedTuples); loading without it returns nested dicts/lists.
"""
from __future__ import annotations

import json
import os
import queue
import threading
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "AsyncCheckpointWriter"]


def _serialize(tree, leaves: list):
    if isinstance(tree, dict):
        return {"__kind__": "dict",
                "items": {k: _serialize(v, leaves) for k, v in tree.items()}}
    if isinstance(tree, (list, tuple)):
        kind = "list" if isinstance(tree, list) else "tuple"
        if hasattr(tree, "_fields"):  # namedtuple (e.g. optax states)
            kind = "namedtuple:" + type(tree).__name__
        return {"__kind__": kind,
                "items": [_serialize(v, leaves) for v in tree]}
    if tree is None:
        return {"__kind__": "none"}
    if isinstance(tree, (int, float, str, bool)):
        return {"__kind__": "scalar", "value": tree}
    idx = len(leaves)
    leaves.append(np.asarray(jax.device_get(tree)))
    return {"__kind__": "leaf", "index": idx}


def _deserialize(node, leaves):
    kind = node["__kind__"]
    if kind == "dict":
        return {k: _deserialize(v, leaves) for k, v in node["items"].items()}
    if kind in ("list", "tuple") or kind.startswith("namedtuple:"):
        items = [_deserialize(v, leaves) for v in node["items"]]
        return items if kind == "list" else tuple(items)
    if kind == "none":
        return None
    if kind == "scalar":
        return node["value"]
    return leaves[node["index"]]


def save_checkpoint(path: str, tree: Any, meta: Optional[dict] = None,
                    use_orbax: bool = False) -> str:
    """Save a pytree + JSON-able metadata. Returns the written path."""
    if use_orbax:
        import orbax.checkpoint as ocp
        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, jax.device_get(tree), force=True)
        if meta:
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f)
        return path

    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    leaves: list = []
    structure = _serialize(tree, leaves)
    arrays = {f"leaf_{i:05d}": leaf for i, leaf in enumerate(leaves)}
    np.savez_compressed(path, __structure__=json.dumps(structure),
                        __meta__=json.dumps(meta or {}), **arrays)
    return path


class AsyncCheckpointWriter:
    """Non-blocking checkpoint writes for long training/grid runs.

    ``save`` snapshots the pytree at enqueue time — the container
    STRUCTURE is rebuilt (so a live list the caller keeps appending to,
    e.g. a training loop's dtw history, is frozen as-of-now), while array
    leaves are held by reference (jax/numpy arrays are not mutated by the
    training loop, so no data copy lands on the caller's thread) — and
    enqueues the device->host transfer + serialization on a worker
    thread; the training loop never stalls on checkpoint IO (the roadmap
    "async checkpointing for long grid runs" item). ``use_orbax=True`` writes through
    ``orbax.checkpoint.AsyncCheckpointer`` (directory format) instead of
    the npz codec; both load back with ``load_checkpoint``.

    Writes to the same writer are ordered; ``wait()`` blocks until every
    enqueued save is durable (and re-raises the first worker error).
    Usable as a context manager.
    """

    def __init__(self, use_orbax: bool = False):
        self._use_orbax = use_orbax
        self._q: "queue.Queue" = queue.Queue()
        self._err: Optional[BaseException] = None
        self._orbax_ckptr = None
        if use_orbax:
            import orbax.checkpoint as ocp
            self._orbax_ckptr = ocp.AsyncCheckpointer(
                ocp.PyTreeCheckpointHandler())
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            path, tree, meta = item
            try:
                if self._orbax_ckptr is not None:
                    path = os.path.abspath(path)
                    self._orbax_ckptr.save(path, jax.device_get(tree),
                                           force=True)
                    self._orbax_ckptr.wait_until_finished()
                    if meta:
                        with open(os.path.join(path, "meta.json"), "w") as f:
                            json.dump(meta, f)
                else:
                    save_checkpoint(path, tree, meta)
            except BaseException as e:  # surfaced by wait()
                if self._err is None:
                    self._err = e
            finally:
                self._q.task_done()

    def save(self, path: str, tree: Any, meta: Optional[dict] = None):
        if self._err is not None:
            err, self._err = self._err, None
            raise err
        # Rebuild the container structure so mutations the caller makes
        # AFTER this call (list appends, dict inserts) can't leak into the
        # serialized snapshot; leaves are shared by reference.
        tree = jax.tree.map(lambda x: x, tree)
        meta = dict(meta) if meta else meta
        self._q.put((path, tree, meta))

    def wait(self):
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def close(self):
        self.wait()
        self._q.put(None)
        self._q.join()
        self._thread.join(timeout=10)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def load_checkpoint(path: str, like: Any = None):
    """Load (tree, meta). With ``like``, the saved leaves are poured into
    ``like``'s exact structure (container types preserved)."""
    if os.path.isdir(path):  # orbax directory
        import orbax.checkpoint as ocp
        tree = ocp.PyTreeCheckpointer().restore(path)
        meta_path = os.path.join(path, "meta.json")
        meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
        return tree, meta

    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    structure = json.loads(str(data["__structure__"]))
    meta = json.loads(str(data["__meta__"]))
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [data[f"leaf_{i:05d}"] for i in range(n)]
    tree = _deserialize(structure, leaves)
    if like is not None:
        flat = jax.tree.leaves(tree)
        treedef = jax.tree.structure(like)
        tree = jax.tree.unflatten(treedef, flat)
    return tree, meta
