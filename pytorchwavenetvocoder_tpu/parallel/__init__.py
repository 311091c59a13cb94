"""SPMD parallelism over a jax.sharding.Mesh.

Replaces the reference's parallelism surface (SURVEY.md §2.3):
``nn.DataParallel`` training (`train.py:449-454`) and the one-process-
per-GPU decode fan-out (`decode.py:329-338`) with a single mesh +
sharding-annotated jit: batch dim sharded over the ``data`` axis,
parameters replicated, gradient psum riding ICI.
"""

from pytorchwavenetvocoder_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_state,
    state_shardings,
)
from pytorchwavenetvocoder_tpu.parallel.train import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    masked_ce_loss,
)
from pytorchwavenetvocoder_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
    make_global_mesh,
    shard_global_batch,
)
from pytorchwavenetvocoder_tpu.parallel.checkpoint import (  # noqa: F401
    find_latest_checkpoint,
    load_checkpoint,
    load_model_conf,
    save_checkpoint,
    save_model_conf,
)
