"""SPMD parallelism over TPU meshes (data + spatial axes)."""

from mode_tpu.parallel.mesh import (
    activate,
    active_mesh,
    batch_sharding,
    constrain_spatial,
    global_batch_from_local,
    initialize_distributed,
    make_mesh,
    replicated,
)

__all__ = [
    "activate", "active_mesh", "batch_sharding", "constrain_spatial",
    "global_batch_from_local", "initialize_distributed", "make_mesh",
    "replicated",
]
