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
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, *, params, ema_params=None, opt_state=None,
                    epoch: int = 0, step: int = 0,
                    model_cfg: Optional[ViTConfig] = None,
                    run_args: Optional[dict] = None,
                    ema_best: bool = False, max_accuracy: float = 0.0):
    """Write an orbax checkpoint dir + config sidecar.

    Multi-process: every process must call this (orbax synchronizes
    inside save). Trees are fetched to host numpy first, which requires
    fully-addressable (replicated or single-host) arrays -- multi-HOST
    FSDP-sharded state would need the jax.Array-native orbax path and is
    not supported yet (single-host FSDP and all DP configs are)."""
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
    """Returns (tree, meta). `item` optionally restores into a structure."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if item is not None:
        tree = ckptr.restore(os.path.join(path, "tree"), item=item)
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
