"""Device-mesh utilities for multi-chip execution."""

from bear_tpu.parallel.mesh import (
    data_parallel_mesh,
    grid_mesh,
    local_device_count,
    replicate,
    shard_along,
)
from bear_tpu.parallel.counting import (
    KmerShardedTransitionCounter,
    ShardedTransitionCounter,
)
from bear_tpu.parallel import multihost
