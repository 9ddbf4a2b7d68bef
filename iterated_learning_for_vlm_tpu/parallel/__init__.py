from .mesh import create_mesh, shard_batch, replicate_tree, batch_sharding
