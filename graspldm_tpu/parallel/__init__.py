from .mesh import (
    batch_sharding,
    get_mesh,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "get_mesh", "batch_sharding", "shard_batch", "replicate"]
