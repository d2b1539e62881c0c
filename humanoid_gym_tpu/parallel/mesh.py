"""Mesh + sharding helpers for the env-data-parallel training program.

Usage:
    mesh = make_env_mesh()                      # all devices on one 'env' axis
    state = shard_env_axis(state, mesh)         # env-batched pytree -> sharded
    ts    = replicate(ts, mesh)                 # params/opt state -> replicated
    train_iter = jax.jit(train_iter, ...)       # global program; XLA inserts
                                                # psums for batch statistics

Multi-host: call jax.distributed.initialize() before any jax API (runner does
this when JAX_COORDINATOR_ADDRESS is set), then the same code runs with the
global device set; per-host env shards never leave their chips.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_env_mesh(devices: Optional[Sequence] = None, axis_name: str = "env") -> Mesh:
    """1-D mesh over all (or given) devices; the env batch axis shards over it."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_env_axis(tree, mesh: Mesh, axis_name: str = "env"):
    """Place a pytree whose leaves have a leading env axis onto the mesh,
    sharded along that axis."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, optimizer state, scalars) on every device."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def env_sharding(mesh: Mesh, axis_name: str = "env") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
