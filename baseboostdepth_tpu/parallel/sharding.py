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
    axis.

    Single process: one device_put of the full global batch. Multi-process
    (multi-host): each process passes its OWN batch slice (global_batch /
    process_count samples, in process order) and the global jax.Array is
    assembled from the process-local shards -- no host ever materializes the
    global batch. Leaf batch sizes must divide the local mesh share.
    """
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        pc = jax.process_count()

        def put(x):
            global_shape = (x.shape[0] * pc,) + x.shape[1:]
            return jax.make_array_from_process_local_data(sharding, x, global_shape)

        return jax.tree.map(put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/opt state) over the mesh.

    Multi-process: every process must hold identical values (same init seed
    / same restored checkpoint); each contributes its addressable replicas.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_callback(
                np.shape(x), sharding, lambda idx, _x=x: np.asarray(_x)[idx]
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize wrapper (the multi-host backend the
    reference never had; SURVEY.md section 2.10 item 3).

    Must run before any other JAX API touches a backend. On TPU pods call
    with no arguments (auto-detection from the TPU environment); on CPU/GPU
    clusters pass all three.
    """
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
