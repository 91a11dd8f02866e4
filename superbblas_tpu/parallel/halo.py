"""Explicit halo exchange over mesh axes (shard_map + ppermute).

The reference implements halos as partition extension (``ext_power``,
dist.h:3477-3509) plus a general redistribution copy (bsr.h:2189-2192).
Under GSPMD the stencil rolls already compile to collective permutes, but
the explicit form is needed for (a) comm/compute overlap schemes (the
reference's core/halo split, tests/bsr.cpp:402-530) and (b) kernels that
consume a locally-extended block (halo-carrying arrays).

``exchange_halos`` returns, per shard, the local block extended by
``width`` sites on each side of every sharded lattice axis — neighbor
slabs moved with ``lax.ppermute`` over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .. import cplx

__all__ = ["exchange_halos", "crop_halos", "extend_local"]


def _exchange_axis(local, axis: int, name: str, width: int, mesh: Mesh):
    """Extend ``local`` along ``axis`` by width from both mesh neighbors."""
    n = mesh.shape[name]
    idx = [slice(None)] * local.ndim

    idx[axis] = slice(0, width)
    low_edge = local[tuple(idx)]
    idx[axis] = slice(local.shape[axis] - width, local.shape[axis])
    high_edge = local[tuple(idx)]

    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    # neighbor's high edge arrives as our new low halo
    low_halo = jax.lax.ppermute(high_edge, name, fwd)
    high_halo = jax.lax.ppermute(low_edge, name, bwd)
    return jnp.concatenate([low_halo, local, high_halo], axis=axis)


def exchange_halos(
    x,
    mesh: Mesh,
    spec: PartitionSpec,
    widths: Dict[int, int],
):
    """Per-shard halo extension.

    ``x``: global array (or CArray) sharded as ``spec`` over ``mesh``;
    ``widths``: {array axis -> halo width} for sharded axes.  Returns the
    shard_map'd local-extended array stacked back as a global array whose
    sharded axes grew by 2*width*n_shards (each shard holds core+halo) —
    callers normally consume it inside their own shard_map; this wrapper
    exists mostly for testing and for halo-carrying array construction.
    """
    names = list(spec)

    def body(local):
        def ext(a):
            for ax, w in widths.items():
                nm = names[ax] if ax < len(names) else None
                if nm is None:
                    continue
                a = _exchange_axis(a, ax, nm, w, mesh)
            return a
        if cplx.is_carray(local):
            return cplx.cmap(ext, local)
        return ext(local)

    out_spec = spec
    return shard_map(
        body, mesh=mesh, in_specs=(spec,), out_specs=out_spec,
        check_vma=False,
    )(x)


def extend_local(a, ax_names: Dict[int, str], widths: Dict[int, int],
                 mesh: Mesh):
    """Halo-extend a shard-local (possibly split-complex) block along the
    given array axes via neighbor ppermutes (shared by the CA-powers and
    sharded-SoA paths)."""
    from .. import cplx as _cplx

    def ext(v):
        for ax, nm in ax_names.items():
            v = _exchange_axis(v, ax, nm, widths[ax], mesh)
        return v

    return _cplx.cmap(ext, a) if _cplx.is_carray(a) else ext(a)


def crop_halos(x, widths: Dict[int, int]):
    """Drop the halo shells added by a local extension."""
    def crop(a):
        idx = [slice(None)] * a.ndim
        for ax, w in widths.items():
            idx[ax] = slice(w, a.shape[ax] - w)
        return a[tuple(idx)]
    if cplx.is_carray(x):
        return cplx.cmap(crop, x)
    return crop(x)
