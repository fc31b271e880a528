from stif_tpu.parallel.mesh import make_mesh, default_mesh
from stif_tpu.parallel.sharding import (
    batch_sharding,
    replicated,
    param_shardings,
    shard_queries,
)

__all__ = [
    "make_mesh",
    "default_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "shard_queries",
]
