from .sharding import batch_pad, make_mesh, shard_batch
from .runtime import global_mesh, initialize_multihost, profile_trace
from . import schur

__all__ = [
    "make_mesh",
    "shard_batch",
    "batch_pad",
    "schur",
    "initialize_multihost",
    "global_mesh",
    "profile_trace",
]
