from reflecting_reality_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicate_tree, replicated, shard_batch,
    split_between_processes,
)
from reflecting_reality_tpu.parallel.sharded_vae import sharded_decode, tiled_decode

__all__ = [
    "batch_sharding", "make_mesh", "replicate_tree", "replicated",
    "shard_batch", "sharded_decode", "split_between_processes", "tiled_decode",
]
