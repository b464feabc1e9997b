from .sharding import (
    make_mesh,
    shard_pair,
    sharded_lws_sweeps,
    data_parallel_run,
)

__all__ = ["make_mesh", "shard_pair", "sharded_lws_sweeps", "data_parallel_run"]
