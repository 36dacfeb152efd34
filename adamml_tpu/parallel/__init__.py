from .mesh import (make_mesh, shard_batch, place_on_mesh, replicate,
                   param_shardings, batch_spec)

__all__ = ["make_mesh", "shard_batch", "place_on_mesh", "replicate",
           "param_shardings",
           "batch_spec"]
