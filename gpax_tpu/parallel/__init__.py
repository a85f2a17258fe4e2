from .mesh import get_mesh, init_distributed, shard_leading_axis
from .sharded import sharded_acquisition, sharded_predict

__all__ = ["get_mesh", "init_distributed", "shard_leading_axis",
           "sharded_predict", "sharded_acquisition"]
