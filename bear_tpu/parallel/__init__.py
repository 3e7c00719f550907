"""Device-mesh utilities for multi-chip execution."""

from bear_tpu.parallel.mesh import (
    data_parallel_mesh,
    local_device_count,
    replicate,
    shard_along,
)
