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
from .halo import crop_halos as _crop
from .halo import extend_local as _extend

__all__ = ["make_gather_halo_plan", "apply_gather_sharded"]

#: per-operator memo of (plan, device index tensor, shard_mapped callable)
#: keyed on (id(op), lat_axis, nshards, mesh, mesh_axis, nblk) — a Krylov
#: solver calls apply_gather_sharded once per matvec, and rebuilding the
#: O(voli*nnz*nd) host plan + re-uploading jj + re-tracing the shard_map
#: each iteration would dominate the solve.  Entries die with the
#: operator (weakref.finalize), so id() recycling cannot alias.
_GATHER_CACHE: dict = {}


def make_gather_halo_plan(op: BSROperator, lat_axis: int, nshards: int,
                          power: int = 1):
    """Host-side halo plan for one sharded lattice axis.

    Returns ``(w, jj_local)`` where ``w`` is the PER-APPLY halo width
    (max plane distance any neighbor reaches outside its owner's slab)
    and ``jj_local`` is int32 [nshards, rows, nnz]: per-rank neighbor
    indices remapped into the halo-extended local frame (axis extent
    local + 2*w*power, flattened C-order).  The analog of the
    reference's extended-domain index translation (bsr.h:2020-2116).

    ``power=1`` (one apply): rows = the shard's CORE sites only.
    ``power=p>1`` (communication-avoiding powers, the okr-powers analog
    of bsr.h:2109-2247 for irregular operators): rows = EVERY site of
    the w*p-extended frame, so the operator can be applied p times
    shard-locally after ONE widened exchange — outputs in the outer
    ``t*w`` shells after apply t are garbage and progressively
    discarded; neighbors that leave the frame (reachable only from
    garbage rows) are clamped to index 0.
    """
    dim = tuple(op.dim_d)
    if tuple(op.dim_i) != dim:
        raise ValueError("halo-plan gather requires a square operator")
    if power < 1:
        raise ValueError("power must be >= 1")
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
    W = w * power                                   # total halo width
    if W > L:
        raise ValueError(
            f"gather offsets reach {W} planes past the shard (local "
            f"extent {L}, width {w} x power {power}): the one-ppermute "
            "exchange cannot source them — use the replicated path or "
            "a lower power")

    ext = L + 2 * W
    ext_dim = dim[:k] + (ext,) + dim[k + 1:]
    if power == 1:
        # local flat order = global C-order restricted to the slab (the
        # restriction is an order-preserving bijection onto local C-order)
        jj_local = np.empty((nshards, L * voli // D, nnz), dtype=np.int64)
        for r in range(nshards):
            sel = (site_k >= r * L) & (site_k < (r + 1) * L)
            c = coords[sel]                         # [voli_loc, nnz, nd]
            lpos = (c[..., k] - (r * L - W)) % D
            if (lpos >= ext).any():
                raise ValueError(
                    "neighbor outside the halo frame (plan width "
                    "miscomputed)")   # defensive: w above bounds this
            lc = [c[..., a] for a in range(len(dim))]
            lc[k] = lpos
            jj_local[r] = np.ravel_multi_index(lc, ext_dim)
    else:
        # rows for the FULL extended frame, in frame C-order: take the
        # global per-site rows at the frame's global axis-k coordinates
        coords_g = coords.reshape(dim + (nnz, len(dim)))
        jj_local = np.empty((nshards, ext * voli // D, nnz),
                            dtype=np.int64)
        for r in range(nshards):
            gk = (r * L - W + np.arange(ext)) % D   # frame -> global k
            c = np.take(coords_g, gk, axis=k)       # [.. ext .., nnz, nd]
            c = c.reshape(-1, nnz, len(dim))
            lpos = (c[..., k] - (r * L - W)) % D
            # out-of-frame neighbors are reachable only from garbage
            # shells whose outputs are discarded — clamp, don't raise
            lpos = np.where(lpos >= ext, 0, lpos)
            lc = [c[..., a] for a in range(len(dim))]
            lc[k] = lpos
            jj_local[r] = np.ravel_multi_index(lc, ext_dim)
    if int(jj_local.max(initial=0)) < np.iinfo(np.int32).max:
        jj_local = jj_local.astype(np.int32)
    return w, jj_local


def apply_gather_sharded(op: BSROperator, x, mesh: Mesh,
                         axes: Dict[str, Optional[str]],
                         plan: Optional[Tuple[int, np.ndarray]] = None,
                         power: int = 1, all_powers: bool = False):
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
    for the sharded axis (built with the SAME ``power``).  Without it
    the plan, the device index tensor and the shard_mapped callable are
    all memoized per (operator, mesh, axis, power) — repeated applies
    (a Krylov solve) pay the host-side plan build and upload once, like
    the redistribution plan cache.

    ``power=p`` computes A^p x with ONE widened (w*p) halo exchange —
    the communication-avoiding okr-powers mode of the stencil paths
    (``bsr_krylov_ca``; reference bsr.h:2109-2247) for IRREGULAR
    operators: the operator rows (blocks + indices) of the halo sites
    are exchanged alongside the field, then p shard-local applies run
    on the extended frame, shells invalidating inward by w per apply.
    ``all_powers=True`` returns [A x, ..., A^p x] stacked on a new
    leading axis (the s-step Krylov basis); otherwise just A^p x.
    Each intermediate apply runs over the extended frame (a
    (L+2wp)/L compute overhead vs the minimal trapezoid).
    """
    if power < 1:
        raise ValueError("power must be >= 1")
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

    key = (id(op), k, n, mesh, nm, nblk, power, all_powers)
    hit = _GATHER_CACHE.get(key) if plan is None else None
    if hit is not None:
        jj_dev, fn = hit
        return fn(op.blocks,
                  op.kron if op.kron is not None else jnp.zeros((0,)),
                  jj_dev, x)

    w, jj_local = plan if plan is not None else \
        make_gather_halo_plan(op, k, n, power=power)
    W = w * power
    L = op.dim_d[k] // n
    loc_core = op.dim_d[:k] + (L,) + op.dim_d[k + 1:]
    loc_ext = op.dim_d[:k] + (L + 2 * W,) + op.dim_d[k + 1:]

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
                blk_i=op.blk_i, blk_d=op.blk_d,
                dim_i=(loc_core if power == 1 else loc_ext),
                dim_d=loc_ext, bi=op.bi, bd=op.bd, mode="gather",
                offsets=op.offsets, kron_i=op.kron_i, kron_d=op.kron_d,
                ki=op.ki, kd=op.kd)
    has_kron = op.kron is not None

    def body(blocks_l, kron_l, jj_l, x_l):
        x_e = _extend(x_l, {k: nm}, {k: W}, mesh) if W else x_l
        # powers apply the operator AT halo sites too: their rows
        # (per-site blocks) travel in the same exchange as the field
        b_e = (blocks_l if power == 1 or W == 0
               else _extend(blocks_l, {k: nm}, {k: W}, mesh))
        lop = BSROperator(blocks=b_e, jj_flat=jj_l[0],
                          kron=kron_l if has_kron else None, **meta)
        fn = _apply_gather_kron if has_kron else _apply_gather
        if power == 1:
            y = fn(lop, x_e)
            if not all_powers:
                return y
            return (cplx.CArray(y.re[None], y.im[None])
                    if cplx.is_carray(y) else y[None])
        outs = []
        cur = x_e
        for _ in range(power):
            cur = fn(lop, cur)     # ext -> ext; shells invalidate by w
            outs.append(cur)
        if not all_powers:
            outs = outs[-1:]
        outs = [_crop(o, {k: W}) if W else o for o in outs]
        if not all_powers:
            return outs[0]
        if cplx.is_carray(outs[0]):
            return cplx.CArray(jnp.stack([o.re for o in outs]),
                               jnp.stack([o.im for o in outs]))
        return jnp.stack(outs)

    spec_out = PartitionSpec(None, *spec_x) if all_powers else spec_x
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(bspec, PartitionSpec(), PartitionSpec(nm, None, None),
                  spec_x),
        out_specs=spec_out, check_vma=False,
    )
    if plan is None:
        _GATHER_CACHE[key] = (jj_dev, fn)
        weakref.finalize(op, _GATHER_CACHE.pop, key, None)
    kron_in = op.kron if op.kron is not None else jnp.zeros((0,))
    return fn(op.blocks, kron_in, jj_dev, x)
