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


def env_sharding(mesh: Mesh, ndim: int, batch_axis: int = -1) -> NamedSharding:
    """Sharding for an array whose `batch_axis` is the env axis."""
    spec = [None] * ndim
    spec[batch_axis] = "env"
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
