from deepphysinet_tpu.parallel.mesh import MeshConfig, make_mesh, batch_sharding, shard_batch
from deepphysinet_tpu.parallel.sharding import make_sharded_train_step

__all__ = [
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "shard_batch",
    "make_sharded_train_step",
]
