"""Mesh construction and sharding helpers."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def init_distributed(**kwargs) -> None:
    """Multi-host init (jax.distributed). The reference has no multi-node
    support at all (SURVEY.md §5); on TPU pods this one call is the entire
    communication backend setup."""
    jax.distributed.initialize(**kwargs)


def data_mesh(devices: Optional[Sequence] = None,
              n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over all (or the first n) devices: the analogue of
    SetGPUNum(n) (cufhe_gates_gpu.cu:38)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def shard_spec(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicate_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(x, mesh: Mesh):
    """Place a [B, ...] array with B sharded over the data axis (streams →
    batch-axis mapping; B must be divisible by mesh size)."""
    return jax.device_put(x, shard_spec(mesh))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (keys) to every device — the multi-GPU key upload
    loop (bootstrap_gpu.cu:115-137, keyswitch_gpu.cu:9-16) as one placement."""
    return jax.device_put(tree, replicate_spec(mesh))
