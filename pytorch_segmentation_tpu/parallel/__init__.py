from .mesh import (data_sharding, initialize_distributed, make_mesh,
                   put_global_batch, replicated_sharding, shard_batch)
from .ep import (ep_param_spec, ep_state_shardings,
                 ep_zero_state_shardings, make_ep_mesh, shard_ep)
from .pp import make_pp_mesh, pipeline_blocks, pp_state_shardings, shard_pp
from .tp import make_tp_mesh, shard_tp, tp_param_spec, tp_state_shardings
from .zero import shard_zero, zero_leaf_spec, zero_state_shardings

__all__ = [
    "make_mesh", "data_sharding", "replicated_sharding", "shard_batch",
    "initialize_distributed", "put_global_batch",
    "make_tp_mesh", "shard_tp", "tp_param_spec", "tp_state_shardings",
    "make_pp_mesh", "pipeline_blocks", "pp_state_shardings", "shard_pp",
    "shard_zero", "zero_leaf_spec", "zero_state_shardings",
    "make_ep_mesh", "shard_ep", "ep_param_spec", "ep_state_shardings",
    "ep_zero_state_shardings",
]
