from .mesh import (
    batch_sharding,
    get_mesh,
    make_mesh,
    replicate,
    shard_batch,
)
from .prefetch import prefetch_to_device, stack_batches
from .workers import BatchWorkerPool

__all__ = [
    "make_mesh",
    "get_mesh",
    "batch_sharding",
    "shard_batch",
    "replicate",
    "prefetch_to_device",
    "stack_batches",
    "BatchWorkerPool",
]
