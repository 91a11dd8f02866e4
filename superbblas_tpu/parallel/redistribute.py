"""Explicit fragment-plan redistribution: the all_to_all fallback path.

GSPMD reshards anything expressible as a NamedSharding, but the reference
supports *arbitrary* partitions — toroidally wrapped, unevenly split,
overlapping (replicated/halo'd) boxes (dist.h:330-560).  This module is
the TPU-native equivalent of the reference's send/receive machinery
(dist.h:1426-1573): the box-intersection plan is computed host-side
(get_indices_to_send/receive, dist.h:1789-1852), materialized as *static
index tensors* that ride along as sharded data, and executed inside one
shard_map as

    gather(pack) -> lax.all_to_all -> scatter(unpack)

with per-peer fragments padded to the planned maximum — static shapes, as
XLA requires; the plan is cached on the (partitions, shapes) key exactly
like the reference's LRU plan cache (dist.h:2303-2349).

Data container: irregular partitions cannot be jax global arrays, so the
distributed tensor is a **stacked-padded local form** ``[nprocs,
*max_local_shape]`` sharded over a 1-D mesh axis (the analog of the
reference's per-rank raw pointers).  ``pack_global``/``unpack_global``
convert between host numpy global arrays and this form for testing and
I/O.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .. import cplx
from ..labels import intersect_box, volume
from .partition import Partition, box_minus

__all__ = ["RedistributionPlan", "make_plan", "redistribute_explicit",
           "pack_global", "unpack_global", "may_need_communications"]


def may_need_communications(src: "Partition", dst: "Partition") -> bool:
    """Fast check whether moving data between the partitions requires any
    cross-process traffic (reference ``may_need_communications``,
    dist.h:2159): False when every destination box is fully contained in
    the same rank's source box."""
    from ..labels import intersect_box

    if len(src.boxes) != len(dst.boxes):
        return True
    for (sf, ss), (df, ds) in zip(src.boxes, dst.boxes):
        need = volume(ds)
        if need == 0:
            continue
        got = sum(volume(isz) for _, isz in
                  intersect_box(df, ds, sf, ss, src.dim))
        if got < need:
            return True
    return False


def _box_flat_indices(frm, size, box_from, box_shape, lat_dim) -> np.ndarray:
    """Flat indices (row-major in a padded local block of shape
    ``box_shape`` whose origin is ``box_from``) of the absolute toroidal
    box (frm, size), scanned in row-major absolute order.  Both the
    fragment and the owning box may wrap around the lattice."""
    nd = len(box_shape)
    axes = []
    for f, s, bf, D in zip(frm, size, box_from, lat_dim):
        axes.append(((np.arange(f, f + s) % D) - bf) % D)
    grid = np.meshgrid(*axes, indexing="ij")
    strides = np.ones(nd, dtype=np.int64)
    for i in range(nd - 2, -1, -1):
        strides[i] = strides[i + 1] * box_shape[i + 1]
    flat = np.zeros(tuple(s for s in size), dtype=np.int64)
    for g, st in zip(grid, strides):
        flat += g.astype(np.int64) * st
    return flat.reshape(-1)


class RedistributionPlan:
    """Static pack/unpack index tensors for one (src, dst) partition pair."""

    def __init__(self, src: Partition, dst: Partition, copy_add: str = "copy"):
        if len(src.boxes) != len(dst.boxes):
            raise ValueError("partitions must have the same number of procs")
        n = len(src.boxes)
        dim = src.dim
        self.n = n
        self.src_shape = tuple(
            max((b[1][i] for b in src.boxes), default=0)
            for i in range(len(dim)))
        self.dst_shape = tuple(
            max((b[1][i] for b in dst.boxes), default=0)
            for i in range(len(dim)))
        src_vol = volume(self.src_shape)
        dst_vol = volume(self.dst_shape)

        # fragments[i][j]: list of (box, src_idx, dst_idx)
        pair_src = [[[] for _ in range(n)] for _ in range(n)]
        pair_dst = [[[] for _ in range(n)] for _ in range(n)]

        def add_fragment(i, j, ff, fs):
            if volume(fs) == 0:
                return
            sfrm = src.boxes[i][0]
            dfrm = dst.boxes[j][0]
            pair_src[i][j].append(
                _box_flat_indices(ff, fs, sfrm, self.src_shape, dim))
            pair_dst[i][j].append(
                _box_flat_indices(ff, fs, dfrm, self.dst_shape, dim))

        # Prefer the native C++ plan engine (all-pairs fragment sweep);
        # fall back to the Python box algebra.
        from .. import native

        rows = native.fragment_plan(
            np.asarray([[b[0], b[1]] for b in src.boxes]),
            np.asarray([[b[0], b[1]] for b in dst.boxes]),
            dim, copy_add,
        )
        if rows is not None:
            nd = len(dim)
            for row in rows:
                i, j = int(row[0]), int(row[1])
                add_fragment(i, j, tuple(row[2:2 + nd]),
                             tuple(row[2 + nd:2 + 2 * nd]))
        else:
            for j in range(n):
                dfrm, dsize = dst.boxes[j]
                if volume(dsize) == 0:
                    continue
                remaining = [(dfrm, dsize)]
                for i in range(n):
                    sfrm, ssize = src.boxes[i]
                    if volume(ssize) == 0:
                        continue
                    if copy_add == "copy":
                        new_remaining = []
                        frags = []
                        for rf, rs in remaining:
                            frags.extend(
                                intersect_box(rf, rs, sfrm, ssize, dim))
                            new_remaining.extend(
                                box_minus(rf, rs, sfrm, ssize, dim))
                        remaining = new_remaining
                    else:
                        frags = list(
                            intersect_box(dfrm, dsize, sfrm, ssize, dim))
                    for ff, fs in frags:
                        add_fragment(i, j, ff, fs)

        self.max_elems = max(
            (sum(len(a) for a in pair_src[i][j])
             for i in range(n) for j in range(n)), default=0)
        m = max(self.max_elems, 1)
        # pack_idx[i, j, k]: element k of the buffer rank i sends to rank j,
        # as a flat index into rank i's padded src block; src_vol = padding.
        pack = np.full((n, n, m), src_vol, dtype=np.int32)
        unpack = np.full((n, n, m), dst_vol, dtype=np.int32)
        for i in range(n):
            for j in range(n):
                if pair_src[i][j]:
                    s = np.concatenate(pair_src[i][j])
                    d = np.concatenate(pair_dst[i][j])
                    pack[i, j, :len(s)] = s
                    unpack[i, j, :len(d)] = d
        self.pack_idx = pack      # [n, n, m]
        self.unpack_idx = unpack  # indexed [src_rank, dst_rank, k]
        self.copy_add = copy_add
        self.src_vol = src_vol
        self.dst_vol = dst_vol


@functools.lru_cache(maxsize=256)
def make_plan(src: Partition, dst: Partition, copy_add: str = "copy"):
    """Plan cache (the reference caches plans in its LRU keyed by the
    partition pair, dist.h:2303-2349)."""
    return RedistributionPlan(src, dst, copy_add)


def redistribute_explicit(
    local_stack,
    src: Partition,
    dst: Partition,
    mesh: Mesh,
    axis: str = "p",
    copy_add: str = "copy",
):
    """Move data between arbitrary partitions with explicit collectives.

    ``local_stack``: [nprocs, *src_max_shape] array (or CArray) sharded
    over ``mesh`` axis ``axis``.  Returns [nprocs, *dst_max_shape] with
    the same sharding.
    """
    plan = make_plan(src, dst, copy_add)
    n = plan.n
    pack_idx = jnp.asarray(plan.pack_idx)      # [n, n, m]
    unpack_idx = jnp.asarray(plan.unpack_idx)

    spec_data = PartitionSpec(axis, *([None] * len(plan.src_shape)))
    spec_out = PartitionSpec(axis, *([None] * len(plan.dst_shape)))
    spec_idx = PartitionSpec(axis, None, None)
    # unpack indices must arrive at the *destination* rank: row j needs
    # unpack[:, j, :]; shard over the dst axis instead.
    spec_idx_dst = PartitionSpec(None, axis, None)

    def body(local, pidx, uidx):
        # local [1, *src_shape]; pidx [1, n, m]; uidx [n, 1, m]
        def run(loc):
            flat = jnp.concatenate(
                [loc.reshape(-1), jnp.zeros((1,), loc.dtype)])
            send = flat[pidx[0]]                          # [n, m]
            recv = jax.lax.all_to_all(send, axis, 0, 0, tiled=True)
            out = jnp.zeros((plan.dst_vol,), loc.dtype)
            ui = uidx[:, 0, :].reshape(-1)
            vals = recv.reshape(-1)
            if copy_add == "copy":
                out = out.at[ui].set(vals, mode="drop")
            else:
                out = out.at[ui].add(vals, mode="drop")
            return out.reshape((1,) + plan.dst_shape)
        if cplx.is_carray(local):
            return cplx.cmap(lambda a: run(a[0]), local)
        return run(local[0])

    return shard_map(
        body, mesh=mesh,
        in_specs=(spec_data, spec_idx, spec_idx_dst),
        out_specs=spec_out,
        check_vma=False,
    )(local_stack, pack_idx, unpack_idx)


def pack_global(x: np.ndarray, part: Partition) -> np.ndarray:
    """Host: global array -> stacked-padded local blocks [n, *max_shape]."""
    n = len(part.boxes)
    shape = tuple(max((b[1][i] for b in part.boxes), default=0)
                  for i in range(len(part.dim)))
    out = np.zeros((n,) + shape, dtype=x.dtype)
    for r, (frm, size) in enumerate(part.boxes):
        if volume(size) == 0:
            continue
        src = x
        for ax, (f, s) in enumerate(zip(frm, size)):
            src = np.take(src, (np.arange(f, f + s)) % part.dim[ax], axis=ax)
        out[(r,) + tuple(slice(0, s) for s in size)] = src
    return out


def unpack_global(stack: np.ndarray, part: Partition) -> np.ndarray:
    """Host: stacked local blocks -> global array (later ranks win on
    overlap)."""
    out = np.zeros(part.dim, dtype=stack.dtype)
    for r, (frm, size) in enumerate(part.boxes):
        if volume(size) == 0:
            continue
        block = stack[(r,) + tuple(slice(0, s) for s in size)]
        idx = np.ix_(*[np.arange(f, f + s) % d
                       for f, s, d in zip(frm, size, part.dim)])
        out[idx] = block
    return out
