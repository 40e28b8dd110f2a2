from .mesh import SHARD_AXIS, make_mesh, replicated, shard_leading
from .sharded import (
    ShardedIndex,
    build_sharded,
    partition_round_robin,
    sharded_insert_wave,
)
from .sharded_api import ShardedReader, ShardedWriter, shard_of

__all__ = [
    "SHARD_AXIS",
    "make_mesh",
    "replicated",
    "shard_leading",
    "ShardedIndex",
    "build_sharded",
    "partition_round_robin",
    "sharded_insert_wave",
    "ShardedReader",
    "ShardedWriter",
    "shard_of",
]
