"""Multi-chip map parallelism: spatial sharding of the voxel grid and its
resident particles over a device mesh."""

from .sharding import (  # noqa: F401
    make_mesh,
    state_shardings,
    shard_state,
    make_sharded_step,
)
from .shard_step import make_shardmap_step  # noqa: F401
