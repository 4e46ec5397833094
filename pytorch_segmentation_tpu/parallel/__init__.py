from .mesh import (data_sharding, initialize_distributed, make_mesh,
                   process_batch_slice, replicated_sharding, shard_batch)

__all__ = [
    "make_mesh", "data_sharding", "replicated_sharding", "shard_batch",
    "initialize_distributed", "process_batch_slice",
]
