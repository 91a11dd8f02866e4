from .partition import (
    Factors23,
    Partition,
    basic_partitioning,
    box_minus,
    make_hole,
    partitioning_distributed_procs,
    subtract_interval,
)
from .mesh import make_mesh, partition_sharding, sharding_partition
from .dist import contraction, copy, redistribute

__all__ = [
    "Factors23",
    "Partition",
    "basic_partitioning",
    "box_minus",
    "make_hole",
    "partitioning_distributed_procs",
    "subtract_interval",
    "make_mesh",
    "partition_sharding",
    "sharding_partition",
    "contraction",
    "copy",
    "redistribute",
]
