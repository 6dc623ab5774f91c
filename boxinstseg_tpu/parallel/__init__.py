from .mesh import (batch_sharding, get_data_mesh, init_distributed,
                   replicated_sharding, shard_batch)

__all__ = ['batch_sharding', 'get_data_mesh', 'init_distributed',
           'replicated_sharding', 'shard_batch']
