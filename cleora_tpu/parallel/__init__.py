from .mesh import SHARD_AXIS, make_mesh
from .shard import ShardedCoo, shard_coo, shard_graph, pad_rows
from .embed import embed_sharded, build_sharded_embed

__all__ = [
    "SHARD_AXIS", "make_mesh",
    "ShardedCoo", "shard_coo", "shard_graph", "pad_rows",
    "embed_sharded", "build_sharded_embed",
]
