from .mesh import (batch_sharding, create_mesh, replicated,  # noqa: F401
                   shard_batch, shard_params)
