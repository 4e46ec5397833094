from .mesh import (data_sharding, initialize_distributed, make_mesh,
                   put_global_batch, replicated_sharding, shard_batch)

__all__ = [
    "make_mesh", "data_sharding", "replicated_sharding", "shard_batch",
    "initialize_distributed", "put_global_batch",
]
