from .mesh import (batch_multiple, batch_sharding, init_distributed,
                   make_mesh, replicated)

__all__ = ["make_mesh", "batch_sharding", "replicated", "batch_multiple",
           "init_distributed"]
