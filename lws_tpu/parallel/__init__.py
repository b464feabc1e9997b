from .sharding import (
    make_mesh,
    shard_pair,
    sharded_lws_sweeps,
    data_parallel_run,
)
from .multihost import init_distributed, make_host_mesh, scaling_report

__all__ = [
    "make_mesh",
    "shard_pair",
    "sharded_lws_sweeps",
    "data_parallel_run",
    "init_distributed",
    "make_host_mesh",
    "scaling_report",
]
