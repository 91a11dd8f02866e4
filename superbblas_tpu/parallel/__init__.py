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
from .dist import contraction, copy, reshard
from .halo import crop_halos, exchange_halos
from .overlap import bsr_krylov_overlap
from .powers import bsr_krylov_ca
from .multihost import initialize_distributed, make_multihost_mesh
from .gather_sharded import (apply_gather_overlap,
                             apply_gather_sharded,
                             make_gather_halo_plan)
from .stencil_sharded import apply_stencil_soa_sharded
from .redistribute import (
    make_plan,
    may_need_communications,
    pack_global,
    redistribute_auto,
    redistribute_explicit,
    unpack_global,
)

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
    "reshard",
    "crop_halos",
    "exchange_halos",
    "bsr_krylov_overlap",
    "bsr_krylov_ca",
    "initialize_distributed",
    "make_multihost_mesh",
    "apply_gather_overlap",
    "apply_gather_sharded",
    "apply_stencil_soa_sharded",
    "make_gather_halo_plan",
    "make_plan",
    "may_need_communications",
    "pack_global",
    "redistribute_auto",
    "redistribute_explicit",
    "unpack_global",
]
