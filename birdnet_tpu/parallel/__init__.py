"""Multi-chip parallelism: mesh construction, DP batch sharding, head TP."""

from .sharding import (  # noqa: F401
    make_mesh,
    make_sharded_program,
    make_sharded_stream_program,
    param_specs,
    shard_params,
)
