from cfgan.parallel.mesh import create_mesh, local_device_count, multihost_initialize
from cfgan.parallel.sharding import (
    batch_sharding,
    replicate_sharding,
    shard_batch,
    replicate,
)

__all__ = [
    "create_mesh",
    "local_device_count",
    "multihost_initialize",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "replicate",
]
