from vcrnet_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from vcrnet_tpu.parallel.multihost import (
    global_batch_from_local,
    initialize,
    local_batch_slice,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "initialize",
    "local_batch_slice",
    "global_batch_from_local",
]
