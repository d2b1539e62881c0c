"""Multi-host assembly: per-host env shards -> global sharded arrays.

On a multi-host mesh every process owns only its local devices; a global
env-sharded array must be assembled from process-local shards
(jax.make_array_from_single_device_arrays). Each host initializes ONLY its
own envs (num_envs/num_hosts of them) — env state never exists fully on any
single host, which is what makes 16k+ env jobs fit (BASELINE config[4]).

Usage (see scripts/train.py):
    jax.distributed.initialize()
    mesh = make_env_mesh()                      # global mesh, all processes
    state = host_sharded_env_state(env, key, mesh)
    ts    = replicate(ts, mesh)                 # params identical everywhere
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_env_slice(num_envs: int) -> tuple[int, int]:
    """(start, count) of this process's env block."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per = num_envs // n_proc
    assert num_envs % n_proc == 0, "num_envs must divide process count"
    return pid * per, per


def assemble_global(tree, mesh: Mesh, axis_name: str = "env"):
    """Lift a pytree of process-LOCAL arrays (leading axis = local envs) into
    global arrays sharded along the mesh's env axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    n_proc = jax.process_count()

    def lift(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        local_devices = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
        per_dev = x.shape[0] // len(local_devices)
        shards = [
            jax.device_put(x[i * per_dev : (i + 1) * per_dev], d)
            for i, d in enumerate(local_devices)
        ]
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, shards
        )

    return jax.tree.map(lift, tree)


def host_sharded_env_state(env, key, mesh: Mesh):
    """Initialize only this host's env block and assemble the global state."""
    num_envs = env.num_envs
    start, count = local_env_slice(num_envs)
    keys = jax.random.split(key, num_envs)[start : start + count]
    idx = jnp.arange(start, start + count)
    local_state = jax.jit(env.init_state)(keys, idx)
    local_state = jax.device_get(local_state)
    return assemble_global(local_state, mesh)


def local_env_shard(tree):
    """Extract this process's env block from globally-sharded arrays as
    host numpy (the exact inverse of `assemble_global`): concatenate the
    process-addressable shards in env-axis order. Fully-addressable leaves
    (single-process arrays, replicated scalars) pass through as numpy."""

    def pull(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            shards = sorted(
                x.addressable_shards,
                key=lambda s: (s.index[0].start or 0) if s.index else 0,
            )
            return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        return np.asarray(jax.device_get(x))

    return jax.tree.map(pull, tree)


def broadcast_str(s: str | None, width: int = 1024) -> str:
    """Share process 0's string with every process (fixed-width uint8
    broadcast) — e.g. the timestamped checkpoint directory, which each
    process would otherwise compute with its own clock."""
    from jax.experimental import multihost_utils

    raw = (s or "").encode()[:width]
    buf = np.zeros((width,), np.uint8)
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out[out != 0]).decode()
