"""Checkpointing (Orbax) with the reference's contract: the checkpoint
carries everything needed to rebuild the model, including the config
(reference train.py:684-693 stores `args`; validate.py:85-94 reconstructs
the model from it)."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np

from tokenreduction_tpu.core.config import ViTConfig


def _to_numpy(tree):
    """Fetch a tree to host numpy for the Orbax write.

    Leaves that are NOT fully addressable (multi-process FSDP/DP-sharded
    jax.Arrays: this process holds only its shards) are passed through
    as jax.Arrays -- Orbax's array handler writes each process's local
    shards and merges them into one global array in the checkpoint, so
    multi-host sharded state saves without ever being gathered to one
    host. Fully-addressable leaves go through numpy as before (required
    by the single-host async snapshot path)."""
    def cv(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x
        return np.asarray(x)

    return jax.tree_util.tree_map(cv, tree)


def save_checkpoint(path: str, *, params, ema_params=None, opt_state=None,
                    epoch: int = 0, step: int = 0,
                    model_cfg: Optional[ViTConfig] = None,
                    run_args: Optional[dict] = None,
                    ema_best: bool = False, max_accuracy: float = 0.0):
    """Write an orbax checkpoint dir + config sidecar.

    Multi-process: every process must call this (orbax synchronizes
    inside save). Fully-addressable trees are fetched to host numpy
    first; multi-host sharded leaves (FSDP across processes) stay
    jax.Arrays so Orbax writes per-process shards natively -- see
    _to_numpy. Restoring such a checkpoint in a different process
    topology works because the stored arrays are global: load_checkpoint
    returns host numpy and the caller re-shards (train/loop.py resume)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tree = {"params": _to_numpy(params)}
    if ema_params is not None:
        tree["ema_params"] = _to_numpy(ema_params)
    if opt_state is not None:
        tree["opt_state"] = _to_numpy(opt_state)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "tree"), tree, force=True)
    # orbax synchronizes across processes inside save (EVERY process must
    # call it -- loop.py does); the sidecar is written by process 0 only
    if jax.process_index() == 0:
        meta = {
            "epoch": epoch,
            "step": step,
            "ema_best": ema_best,
            "max_accuracy": max_accuracy,
            "model_cfg": dataclasses.asdict(model_cfg)
            if model_cfg else None,
            "run_args": run_args,
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)


class AsyncCheckpointer:
    """Non-blocking checkpoint writes.

    `save` snapshots the trees on-device (jnp.copy -- cheap, and the
    copies are fresh buffers so later train steps can donate the
    originals) and hands host fetch + Orbax write to a background
    thread; on this TPU relay the device->host fetch alone can take
    seconds, which would otherwise stall the train loop every epoch.
    A new save waits for the previous one (at most one in flight).
    """

    def __init__(self):
        self._thread = None
        self._error = None

    def save(self, path: str, *, params, ema_params=None, opt_state=None,
             **meta):
        import threading

        import jax.numpy as jnp

        if jax.process_count() > 1:
            # Orbax's cross-process sync is sync_global_devices -- a DEVICE
            # collective (orbax multihost.py, default barrier). Running it
            # on a background thread would race the main thread's next
            # train/eval collectives: hosts could enqueue the barrier psum
            # and the train step in different orders -> distributed
            # deadlock. Save synchronously; async is a single-host latency
            # optimization for the TPU relay's slow device->host fetch.
            self.wait()
            save_checkpoint(path, params=params, ema_params=ema_params,
                            opt_state=opt_state, **meta)
            return

        snap = {
            "params": jax.tree_util.tree_map(jnp.copy, params),
            "ema_params": jax.tree_util.tree_map(jnp.copy, ema_params)
            if ema_params is not None else None,
            "opt_state": jax.tree_util.tree_map(jnp.copy, opt_state)
            if opt_state is not None else None,
        }
        self.wait()

        def work():
            try:
                save_checkpoint(path, params=snap["params"],
                                ema_params=snap["ema_params"],
                                opt_state=snap["opt_state"], **meta)
            except BaseException as e:  # surfaced on next wait()/save()
                self._error = e

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


def load_checkpoint(path: str, item: Any = None):
    """Returns (tree, meta). `item` optionally restores into a structure.

    When `item` leaves are live (sharded) jax.Arrays, their shardings
    are passed to Orbax as restore targets — required to restore a
    checkpoint written by a different process/device topology (e.g. a
    2-process FSDP save restored single-process: the stored sharding
    metadata names devices that no longer exist, so Orbax must be told
    the new placement instead of replaying the old one)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if item is not None:
        def _restore_arg(leaf):
            # Only mesh-committed leaves carry a restore target; scalar
            # counters etc. live on an uncommitted single device and
            # must come back as host arrays (committing them to device 0
            # would poison the next jitted step's device consistency).
            if isinstance(leaf, jax.Array) and isinstance(
                    getattr(leaf, "sharding", None),
                    jax.sharding.NamedSharding):
                return ocp.ArrayRestoreArgs(sharding=leaf.sharding)
            # force host numpy: a leaf can have been SAVED sharded (a
            # jitted step commits even scalar counters to the mesh)
            # while the restore template's counterpart is uncommitted —
            # without an explicit restore_type orbax would demand a
            # sharding for it
            return ocp.RestoreArgs(restore_type=np.ndarray)

        restore_args = jax.tree_util.tree_map(_restore_arg, item)
        tree = ckptr.restore(os.path.join(path, "tree"), item=item,
                             restore_args=restore_args)
    else:
        tree = ckptr.restore(os.path.join(path, "tree"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return tree, meta


def config_from_meta(meta: dict) -> ViTConfig:
    d = dict(meta["model_cfg"])
    for k in ("reduction_loc", "keep_rate"):
        if k in d and d[k] is not None:
            d[k] = tuple(d[k])
    return ViTConfig(**d)
