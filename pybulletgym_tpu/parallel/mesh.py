"""Device-mesh helpers: env-axis data parallelism over TPU chips/hosts.

The reference has no parallelism at all (one Bullet world per env object,
SURVEY §2.3); here scaling is first-class: a 1-D ``('env',)`` mesh shards
the env batch, params stay replicated, and XLA inserts the psum/all-gather
collectives over ICI/DCN from sharding annotations alone (pjit recipe).
TP/PP/SP/EP are deliberately N/A — policy MLPs are tiny and replicated
(documented scope decision, SURVEY §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("env",))


def make_mesh_2d(n_hosts: Optional[int] = None,
                 devices: Optional[Sequence] = None) -> Mesh:
    """('host', 'env') mesh for multi-host slices: the env batch shards
    over BOTH axes (host-major), so per-host env blocks stay local during
    stepping and learner all-reduces ride ICI within a host before DCN
    across hosts (BASELINE config 5 layout)."""
    if devices is None:
        devices = jax.devices()
    if n_hosts is None:
        n_hosts = max(1, jax.process_count())
    devices = np.asarray(devices)
    assert len(devices) % n_hosts == 0, (len(devices), n_hosts)
    return Mesh(devices.reshape(n_hosts, -1), ("host", "env"))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` with TPU-pod
    auto-detection when no arguments are given (the replacement for the
    NCCL/MPI world the reference never had — SURVEY §2.3)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def _batch_axes(mesh: Mesh):
    """Mesh axes the env batch shards over: ('env',) on a 1-D mesh,
    ('host', 'env') host-major on a 2-D mesh."""
    return tuple(a for a in ("host", "env") if a in mesh.axis_names)


def env_sharding(mesh: Mesh, ndim: int, batch_axis: int = -1) -> NamedSharding:
    """Sharding for an array whose `batch_axis` is the env axis."""
    spec = [None] * ndim
    spec[batch_axis] = _batch_axes(mesh)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(state, mesh: Mesh):
    """Place an EnvState pytree with the trailing (env) axis sharded."""

    def put(x):
        if getattr(x, "ndim", 0) == 0:
            return x
        return jax.device_put(x, env_sharding(mesh, x.ndim, -1))

    return jax.tree.map(put, state)


def shard_params(params, mesh: Mesh):
    """Replicate learner params across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), params)
