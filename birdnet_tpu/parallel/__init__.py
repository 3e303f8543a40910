"""Multi-chip parallelism: mesh construction, DP batch sharding, head TP,
multi-host (DCN) file sharding."""

from .multihost import (  # noqa: F401
    analyze_files_distributed,
    distributed_init,
    shard_files,
)
from .sharding import (  # noqa: F401
    make_mesh,
    make_sharded_program,
    make_sharded_stream_program,
    param_specs,
    shard_params,
)
