"""Mesh + sharding helpers for data-parallel training."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D 'data' mesh over the first num_devices local devices.

    Raises if fewer devices exist than requested: silently shrinking would
    make a "passing" multichip dryrun meaningless (it would test a 1-device
    mesh while claiming N).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"data_mesh: requested {num_devices} devices but only "
                f"{len(devices)} available on platform "
                f"{devices[0].platform if devices else '?'}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch on the mesh, sharded along the leading (batch)
    axis. Leaf batch sizes must divide the mesh size."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
