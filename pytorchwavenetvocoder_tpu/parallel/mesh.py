"""Device mesh construction and sharding helpers.

The framework's parallelism is a 1-D ``data`` mesh axis (the model is a
small dilated-conv stack — batch is the scalable dimension for both
training and the AR decode fleet; see SURVEY.md §2.3).  A ``model`` axis
hook is provided for future model-dim sharding of the 512-channel convs.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    ``model_parallel`` devices per model-parallel group; the rest go to
    the data axis.  Defaults to pure data parallelism.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % model_parallel == 0
    grid = devices.reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batched arrays: leading dim split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch dim sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
