"""Multi-host (multi-process) initialization and global mesh construction.

The reference is single-host (``nn.DataParallel`` over local GPUs); TPU
pods are multi-host by construction, so this framework adds the
process-aware entry path: every host runs the same program,
``initialize_distributed`` wires them into one JAX runtime, and
``make_global_mesh`` lays the ``data`` axis across ALL hosts' devices so
the gradient psum rides ICI.

Single-process runs are unaffected: ``initialize_distributed`` is a
no-op unless a coordinator is configured (explicitly or via environment:
``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``, or
SLURM/OpenMPI autodetection built into ``jax.distributed``).
"""

from __future__ import annotations

import logging
import os

import numpy as np


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    Returns True if a multi-process runtime was initialized.  Safe to
    call unconditionally: without any coordinator configuration (args,
    JAX_* env vars, or a SLURM/MPI environment) it does nothing.
    """
    import jax

    env = os.environ
    configured = (coordinator_address is not None
                  or env.get("JAX_COORDINATOR_ADDRESS")
                  or env.get("COORDINATOR_ADDRESS")
                  or env.get("SLURM_JOB_NUM_NODES", "1") not in ("", "1")
                  or env.get("OMPI_COMM_WORLD_SIZE", "1") not in ("", "1"))
    if not configured:
        return False
    # explicit JAX_* env vars take effect even on jax versions whose
    # initialize() only autodetects cluster environments (SLURM/MPI)
    if coordinator_address is None:
        coordinator_address = (env.get("JAX_COORDINATOR_ADDRESS")
                               or env.get("COORDINATOR_ADDRESS"))
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logging.info("jax.distributed: process %d / %d, %d local / %d global "
                 "devices", jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())
    return True


def make_global_mesh(model_parallel: int = 1):
    """('data', 'model') mesh over ALL processes' devices.

    The data axis spans hosts (device order from ``jax.devices()`` keeps
    each host's devices contiguous, so the batch shards land on the
    owning hosts); ``model_parallel`` must divide the local device count
    so model groups never straddle a host boundary.
    """
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n = devices.size
    assert n % model_parallel == 0
    if model_parallel > 1:
        assert jax.local_device_count() % model_parallel == 0, (
            "model-parallel groups must not straddle hosts")
    grid = devices.reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def shard_global_batch(mesh, batch):
    """Build globally-sharded arrays from per-process local batch shards.

    Each process passes ITS slice of the global batch (global_batch /
    process_count rows); returns arrays sharded over the mesh 'data'
    axis.  Works in single-process mode too (== shard_batch).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(put, batch)
