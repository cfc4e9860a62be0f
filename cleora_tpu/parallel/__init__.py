from .mesh import (
    CHIP_AXIS,
    HOST_AXIS,
    SHARD_AXIS,
    make_hier_mesh,
    make_mesh,
    shard_axes,
)
from .shard import ShardedCoo, shard_coo, shard_graph, pad_rows
from .embed import embed_sharded, build_sharded_embed
from .distributed import init_distributed
from .state import EmbeddingShards, ShardedCheckpoint

__all__ = [
    "SHARD_AXIS", "HOST_AXIS", "CHIP_AXIS",
    "make_mesh", "make_hier_mesh", "shard_axes",
    "ShardedCoo", "shard_coo", "shard_graph", "pad_rows",
    "embed_sharded", "build_sharded_embed",
    "init_distributed",
    "EmbeddingShards", "ShardedCheckpoint",
]
