"""Halo-plan sharded execution of GATHER-mode BSR operators.

Under plain GSPMD the gather matvec's cross-shard ``jj_flat`` take
lowers to an all-reduce over the nnz-multiplied gathered array — on a
16x8x8x8 / nnz=10 probe that is ~80x the minimal halo bytes
(experiments/gather_traffic.py, round-3 VERDICT item 6).  The reference
runs general BSR through the same halo machinery as stencils: the
x-gather is a redistribution onto the extended domain
(bsr.h:2020-2192).  This module is that path for TPU: a host-side plan
remaps every neighbor index into a halo-extended LOCAL frame, one
ppermute pair exchanges the boundary planes, and the gather runs
entirely shard-local.

Scope: operators whose neighbor lists stay within ``w`` planes of the
owning shard along the (single) sharded lattice axis, with w <= the
local shard extent — bounded-offset irregularity (open boundaries,
defects, dislocations, random local couplings).  Unbounded operators
raise; route those through the replicated path.
"""

from __future__ import annotations

import weakref
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .. import cplx
from ..bsr import BSROperator, _apply_gather, _apply_gather_kron
from .halo import extend_local as _extend

__all__ = ["make_gather_halo_plan", "apply_gather_sharded"]

#: per-operator memo of (plan, device index tensor, shard_mapped callable)
#: keyed on (id(op), lat_axis, nshards, mesh, mesh_axis, nblk) — a Krylov
#: solver calls apply_gather_sharded once per matvec, and rebuilding the
#: O(voli*nnz*nd) host plan + re-uploading jj + re-tracing the shard_map
#: each iteration would dominate the solve.  Entries die with the
#: operator (weakref.finalize), so id() recycling cannot alias.
_GATHER_CACHE: dict = {}


def make_gather_halo_plan(op: BSROperator, lat_axis: int, nshards: int):
    """Host-side halo plan for one sharded lattice axis.

    Returns ``(w, jj_local)`` where ``w`` is the halo width (max plane
    distance any neighbor reaches outside its owner's slab) and
    ``jj_local`` is int32 [nshards, voli_local, nnz]: per-rank neighbor
    indices remapped into the halo-extended local frame (axis extent
    local + 2w, flattened C-order).  The analog of the reference's
    extended-domain index translation (bsr.h:2020-2116).
    """
    dim = tuple(op.dim_d)
    if tuple(op.dim_i) != dim:
        raise ValueError("halo-plan gather requires a square operator")
    k = lat_axis
    D = dim[k]
    if D % nshards:
        raise ValueError(f"lattice axis {k} must divide over {nshards}")
    L = D // nshards
    jj = np.asarray(op.jj_flat)                     # [voli, nnz]
    voli, nnz = jj.shape
    coords = np.stack(np.unravel_index(jj.reshape(-1), dim), axis=-1)
    coords = coords.reshape(voli, nnz, len(dim))
    site_k = np.unravel_index(np.arange(voli), dim)[k]

    # halo width: neighbor position relative to the owner's slab start.
    # pos in [0, L) is core; outside, the neighbor is reachable from the
    # high side (pos - L + 1 planes past the slab) or the low side
    # (D - pos planes before it) — a torus offers both, so each neighbor
    # NEEDS only the cheaper one (wrapped-interval pitfall, CLAUDE.md)
    own = site_k // L                               # owning shard per site
    pos = (coords[..., k] - (own * L)[:, None]) % D
    need = np.where(pos < L, 0,
                    np.minimum(pos - L + 1, D - pos))
    w = int(need.max(initial=0))
    if w > L:
        raise ValueError(
            f"gather offsets reach {w} planes past the shard (local "
            f"extent {L}): unbounded along the sharded axis — use the "
            "replicated path")

    ext = L + 2 * w
    ext_dim = dim[:k] + (ext,) + dim[k + 1:]
    # local flat order = global C-order restricted to the slab (the
    # restriction is an order-preserving bijection onto local C-order)
    jj_local = np.empty((nshards, L * voli // D, nnz), dtype=np.int64)
    for r in range(nshards):
        sel = (site_k >= r * L) & (site_k < (r + 1) * L)
        c = coords[sel]                             # [voli_loc, nnz, nd]
        lpos = (c[..., k] - (r * L - w)) % D
        if (lpos >= ext).any():
            raise ValueError(
                "neighbor outside the halo frame (plan width "
                "miscomputed)")   # defensive: w above bounds this
        lc = [c[..., a] for a in range(len(dim))]
        lc[k] = lpos
        jj_local[r] = np.ravel_multi_index(lc, ext_dim)
    if int(jj_local.max(initial=0)) < np.iinfo(np.int32).max:
        jj_local = jj_local.astype(np.int32)
    return w, jj_local


def apply_gather_sharded(op: BSROperator, x, mesh: Mesh,
                         axes: Dict[str, Optional[str]],
                         plan: Optional[Tuple[int, np.ndarray]] = None):
    """y = A x for a GATHER-mode operator on a lattice-sharded operand
    through one explicit halo exchange (the reference's extended-domain
    BSR matvec, bsr.h:2020-2192) — instead of GSPMD's nnz-times-field
    all-reduce.

    ``x``: CArray in canonical AoS order [*lat, KD?, BD, N] sharded on
    exactly ONE lattice axis per ``axes`` (lattice label -> mesh axis);
    ``op.blocks`` (and ``jj_flat``) may be replicated or sharded the
    same way — blocks are passed through the shard_map with the lattice
    spec.  Returns the input sharding.

    ``plan``: optional precomputed :func:`make_gather_halo_plan` result
    for the sharded axis.  Without it the plan, the device index tensor
    and the shard_mapped callable are all memoized per (operator, mesh,
    axis) — repeated applies (a Krylov solve) pay the host-side plan
    build and upload once, like the redistribution plan cache.
    """
    if op.mode != "gather":
        raise ValueError("requires a gather-mode operator")
    sharded = [(i, axes[c]) for i, c in enumerate(op.lat_d)
               if axes.get(c) is not None and mesh.shape[axes[c]] > 1]
    if len(sharded) != 1:
        raise ValueError(
            "apply_gather_sharded shards exactly one lattice axis; got "
            f"{len(sharded)}")
    k, nm = sharded[0]
    n = mesh.shape[nm]
    nlat = len(op.dim_d)
    nblk = x.re.ndim - nlat if cplx.is_carray(x) else x.ndim - nlat

    key = (id(op), k, n, mesh, nm, nblk)
    hit = _GATHER_CACHE.get(key) if plan is None else None
    if hit is not None:
        jj_dev, fn = hit
        return fn(op.blocks,
                  op.kron if op.kron is not None else jnp.zeros((0,)),
                  jj_dev, x)

    w, jj_local = plan if plan is not None else \
        make_gather_halo_plan(op, k, n)
    L = op.dim_d[k] // n
    loc_core = op.dim_d[:k] + (L,) + op.dim_d[k + 1:]
    loc_ext = op.dim_d[:k] + (L + 2 * w,) + op.dim_d[k + 1:]

    spec_lat = tuple(nm if i == k else None for i in range(nlat))
    spec_x = PartitionSpec(*spec_lat, *([None] * nblk))
    bnd = (op.blocks.re.ndim if cplx.is_carray(op.blocks)
           else op.blocks.ndim)
    bspec = PartitionSpec(*spec_lat, *([None] * (bnd - nlat)))
    jj_dev = jax.device_put(
        jnp.asarray(jj_local), NamedSharding(mesh, PartitionSpec(nm)))

    # the cached closure must NOT capture `op` (the cache entry would
    # keep it alive and the finalize-based eviction could never fire) —
    # lift the static metadata into locals
    meta = dict(oim=op.oim, odm=op.odm, lat_i=op.lat_i, lat_d=op.lat_d,
                blk_i=op.blk_i, blk_d=op.blk_d, dim_i=loc_core,
                dim_d=loc_ext, bi=op.bi, bd=op.bd, mode="gather",
                offsets=op.offsets, kron_i=op.kron_i, kron_d=op.kron_d,
                ki=op.ki, kd=op.kd)
    has_kron = op.kron is not None

    def body(blocks_l, kron_l, jj_l, x_l):
        x_e = _extend(x_l, {k: nm}, {k: w}, mesh) if w else x_l
        lop = BSROperator(blocks=blocks_l, jj_flat=jj_l[0],
                          kron=kron_l if has_kron else None, **meta)
        fn = _apply_gather_kron if has_kron else _apply_gather
        return fn(lop, x_e)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(bspec, PartitionSpec(), PartitionSpec(nm, None, None),
                  spec_x),
        out_specs=spec_x, check_vma=False,
    )
    if plan is None:
        _GATHER_CACHE[key] = (jj_dev, fn)
        weakref.finalize(op, _GATHER_CACHE.pop, key, None)
    kron_in = op.kron if op.kron is not None else jnp.zeros((0,))
    return fn(op.blocks, kron_in, jj_dev, x)
