"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL DDP stack
(reference utils.py:216-238, train.py:406):
- a 1-D "data" mesh over all chips (ICI within a slice, DCN across slices)
- batches sharded over "data", params replicated
- gradient averaging happens inside jit via the sharding propagation
  (XLA inserts the psum), replacing DDP's allreduce hooks
- metric sync = the jitted step returns already-reduced scalars
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> dict:
    """Multi-host init (replaces reference utils.py:216-238 env/SLURM rank
    discovery + NCCL process group). On single-host this is a no-op."""
    info = {
        "process_index": 0,
        "process_count": 1,
        "initialized": False,
    }
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if coord and nproc:
        if jax.config.jax_platforms == "cpu":
            # CPU cross-process collectives need the gloo backend
            # (exercised by tests/test_multiprocess.py's 2-process run)
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        info["initialized"] = True
    info["process_index"] = jax.process_index()
    info["process_count"] = jax.process_count()
    return info


def data_parallel_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch(batch, mesh: Mesh, batch_axis: int = 0):
    """Place a batch sharded over the data axis.

    Single-process: `batch` is the host-global numpy batch, device_put
    splits it over the local devices. Multi-process (single-controller
    SPMD): `batch` is this PROCESS's shard (the sampler already strides
    by rank, reference DistributedSampler semantics) and the global array
    is assembled from the per-process shards.

    batch_axis selects which array axis carries the per-device batch
    (axis 1 for [steps, batch, ...] stacks fed to multi-step calls)."""
    multiproc = jax.process_count() > 1

    def put(x):
        if not hasattr(x, "ndim") or x.ndim < 1:
            return x
        spec = [None] * x.ndim
        axis = min(batch_axis, x.ndim - 1)
        spec[axis] = "data"
        sharding = NamedSharding(mesh, P(*spec))
        if multiproc:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())


def fsdp_shardings(tree, mesh: Mesh, axis: str = "data",
                   min_size: int = 2 ** 14):
    """FSDP-style (ZeRO-3) parameter shardings: each large array is
    sharded over `axis` along its largest evenly-divisible dimension;
    small arrays stay replicated.

    Under jit, XLA inserts the all-gather before each use and the
    reduce-scatter on the gradients automatically -- the optimizer state
    initialized from sharded params inherits the sharding, so param,
    grad-moment, and EMA memory all scale 1/n_devices. The reference has
    no equivalent (its DDP replicates everything); this is the TPU-native
    extension for models that do not fit replicated."""
    n = mesh.shape[axis]

    def spec_for(x):
        if not hasattr(x, "ndim") or x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % n == 0:
                spec = [None] * x.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, tree)


def shard_params(tree, mesh: Mesh, fsdp: bool = False):
    """Place a param/EMA tree: replicated (DDP-equivalent) or FSDP."""
    if not fsdp:
        return replicate(tree, mesh)
    return jax.tree_util.tree_map(
        jax.device_put, tree, fsdp_shardings(tree, mesh))
