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


def _model_pspec(path, leaf, model_size: int) -> P:
    """PartitionSpec sharding a WaveNet param leaf over the 'model' axis.

    The scheme keeps every nonlinearity local (no resharding inside the
    gate): the gate convs contract over a model-sharded residual width
    (row-parallel — XLA emits one psum per layer for the (B, T, 2R) gate
    input), skip/res/causal are column-parallel (output channels
    sharded, no collective), and post1 is row-parallel over the sharded
    skip sum.  Biases added to replicated activations stay replicated.
    Works on any pytree that embeds the param dicts (TrainState, the
    optimizer's mu/nu moments): the group/name are read from the
    trailing dict keys of the leaf's path; leaves without them (step
    counters, Adam count) replicate.  A dim not divisible by the model
    axis falls back to replicated for that leaf.
    """
    from jax.tree_util import DictKey

    dict_keys = [k.key for k in path if isinstance(k, DictKey)]
    if len(dict_keys) < 2:
        return P()
    group, name = dict_keys[-2], dict_keys[-1]
    shape = getattr(leaf, "shape", ())

    def ok(dim: int) -> bool:
        return len(shape) > dim and shape[dim] % model_size == 0

    if name == "w":
        if group == "causal" and len(shape) == 3 and ok(2):
            return P(None, None, "model")        # (k, Q, R): out-col
        if group == "dil" and len(shape) == 4 and ok(2):
            return P(None, None, "model", None)  # (L, k, R, 2R): row
        if group in ("skip", "res") and len(shape) == 3 and ok(2):
            return P(None, None, "model")        # (L, R, S|R): out-col
        if group == "post1" and len(shape) == 2 and ok(0):
            return P("model", None)              # (S, S): row over skips
    elif name == "b":
        if group in ("skip", "res") and len(shape) == 2 and ok(1):
            return P(None, "model")              # follows the col output
    return P()


def state_shardings(mesh: Mesh, state):
    """NamedSharding pytree for a TrainState (or any state-shaped tree).

    With a model axis > 1, layer weights and their Adam moments are
    sharded per :func:`_model_pspec` — parameter + optimizer memory
    scales 1/model_parallel; everything else replicates.  With model
    axis 1 this is plain replication.
    """
    if mesh.shape.get("model", 1) == 1:
        repl = replicated_sharding(mesh)
        return jax.tree.map(lambda _: repl, state)
    model = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, _model_pspec(p, x, model)), state)


def shard_state(mesh: Mesh, state):
    """Device-put a train state with the mesh's param sharding layout."""
    return jax.tree_util.tree_map(
        jax.device_put, state, state_shardings(mesh, state))
