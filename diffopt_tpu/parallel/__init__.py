from .sharding import batch_pad, make_mesh, shard_batch

__all__ = ["make_mesh", "shard_batch", "batch_pad"]
