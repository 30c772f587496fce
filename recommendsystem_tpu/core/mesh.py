"""Device-mesh construction and distributed init.

The reference's only two parallel axes are (a) data parallelism via MPI-style
worker sharding (``tn.core.shard_num``/``self_shard_id`` — reference
``staytime/parse.py:77-79``) and (b) parameter-server row sharding of sparse
tables inside tensornet.  The TPU-native equivalent is a single
``jax.sharding.Mesh``: dense towers are data-parallel over ``DATA_AXIS`` and
embedding tables are row-sharded over the same axis (all-to-all on ICI for
lookup).  ``MODEL_AXIS`` is reserved for optional tensor/expert parallelism of
the dense towers (unused by the reference-scale models, available for scaling).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def process_count() -> int:
    """tn.core.shard_num() equivalent."""
    return jax.process_count()


def process_index() -> int:
    """tn.core.self_shard_id() equivalent."""
    return jax.process_index()


def distributed_init(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host init (DCN).  No-op when single-process."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def create_mesh(devices: Sequence[jax.Device] | None = None,
                model_parallel: int = 1,
                axis_names: tuple[str, str] = (DATA_AXIS, MODEL_AXIS)) -> Mesh:
    """Build a 2-D ``(data, model)`` mesh over all (or given) devices.

    ``model_parallel=1`` (the default) gives pure data parallelism, which is
    what every reference model uses; a larger value carves an inner
    model-parallel axis for tensor-parallel dense layers.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=axis_names)


def local_mesh(n: int | None = None) -> Mesh:
    """Mesh over the first ``n`` local devices (testing convenience)."""
    devs = jax.devices()
    if n is not None:
        devs = devs[:n]
    return create_mesh(devs)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a batch: leading dim split over DATA_AXIS."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for an embedding table: rows split over DATA_AXIS."""
    return NamedSharding(mesh, P(DATA_AXIS, None))


def num_virtual_cpu_devices() -> int:
    flags = os.environ.get("XLA_FLAGS", "")
    for tok in flags.split():
        if tok.startswith("--xla_force_host_platform_device_count="):
            return int(tok.split("=", 1)[1])
    return 1
