"""Sharded execution of the SoA/Pallas stencil kernel.

Under plain GSPMD the hot SoA kernel cannot run on sharded operands
(pallas_call does not partition itself), so the multi-chip production
path is explicit: one ``shard_map`` that

  1. ppermutes a halo shell of width = stencil radius along each sharded
     lattice axis (blocks and x),
  2. runs the Pallas kernel on the locally-extended block — its internal
     toroidal wraps are wrong only in the outermost shell, which is
     exactly the halo (the shell-contamination argument of
     parallel/powers.py),
  3. crops the exact core.

This composes with operator powers: pass ``power=p`` to exchange a
p-shell halo ONCE and apply the kernel p times locally (the
communication-avoiding okr scheme on the hot path).

Constraints: the kernel's lattice-shape rules apply to the *extended
local* block (4D lattice, T % 128 == 0 and Z % 8 == 0 and unsharded on
those axes — shard X and/or Y).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec

from .. import cplx
from ..bsr import BSROperator
from ..labels import volume
from .halo import crop_halos, extend_local as _extend

__all__ = ["apply_stencil_soa_sharded"]


def apply_stencil_soa_sharded(
    op: BSROperator,
    x: cplx.CArray,
    mesh: Mesh,
    axes: Dict[str, Optional[str]],
    power: int = 1,
    interpret: Optional[bool] = None,
):
    """y = A^power x on a lattice-sharded SoA operand through the Pallas
    kernel (one halo exchange total).

    ``x``: CArray [n, KD*BD, X, Y, Z, T] sharded on lattice axes per
    ``axes`` (lattice label -> mesh axis; only the first two lattice
    axes may be sharded).  ``op`` must be an SoA-layout operator with the
    same sharding on its blocks.  Returns [n, KI*BI, X, Y, Z, T] with the
    input sharding.  ``interpret=True`` forces the Pallas kernel in
    interpreter mode (the virtual-mesh validation path — the driver's
    multi-chip dry run exercises the REAL kernel this way).
    """
    if op.mode != "stencil_soa":
        raise ValueError("requires an SoA-layout stencil operator")
    nlat = len(op.dim_d)
    radius = [max((abs(o[ax]) for o in op.offsets), default=0)
              for ax in range(nlat)]
    # SoA layout: lattice axes are the trailing nlat axes; array axis of
    # lattice axis k is (array.ndim - nlat + k)
    ax_names: Dict[int, int] = {}
    widths: Dict[int, int] = {}
    for k, c in enumerate(op.lat_d):
        nm = axes.get(c)
        if nm is None or mesh.shape[nm] == 1 or radius[k] == 0:
            continue
        if k >= 2:
            raise ValueError(
                "only the first two lattice axes (X, Y) may be sharded: "
                "Z/T ride the kernel's register tiles")
        if op.dim_d[k] % mesh.shape[nm]:
            raise ValueError(f"lattice axis {c!r} must divide evenly")
        w = power * radius[k]
        if w > op.dim_d[k] // mesh.shape[nm]:
            raise ValueError("halo width exceeds the local shard extent")
        ax_names[k] = nm
        widths[k] = w

    spec_lat = tuple(axes.get(c) for c in op.lat_d)
    spec_x = PartitionSpec(None, None, *spec_lat)
    spec_b = PartitionSpec(None, None, *spec_lat)

    nx_lead = 2  # [n|ndir, features] lead both operands

    def body(blocks_l, kron_l, x_l):
        ax_arr_b = {nx_lead + k: nm for k, nm in ax_names.items()}
        w_arr = {nx_lead + k: widths[k] for k in widths}
        blocks_e = _extend(blocks_l, ax_arr_b, w_arr, mesh)
        x_e = _extend(x_l, ax_arr_b, w_arr, mesh)
        loc_dim = tuple(x_e.shape[2:])
        lop = BSROperator(
            oim=op.oim, odm=op.odm, lat_i=op.lat_i, lat_d=op.lat_d,
            blk_i=op.blk_i, blk_d=op.blk_d, dim_i=loc_dim, dim_d=loc_dim,
            bi=op.bi, bd=op.bd, mode="stencil_soa", blocks=blocks_e,
            offsets=op.offsets,
            kron=kron_l if op.kron is not None else None,
            kron_i=op.kron_i, kron_d=op.kron_d, ki=op.ki, kd=op.kd,
        )
        from ..bsr import apply_stencil_soa

        cur = x_e
        for _ in range(power):
            cur = apply_stencil_soa(lop, cur, interpret=interpret)

        return crop_halos(cur, w_arr)

    kron_in = op.kron if op.kron is not None else jnp.zeros((0,))
    return shard_map(
        body, mesh=mesh,
        in_specs=(spec_b, PartitionSpec(), spec_x),
        out_specs=spec_x,
        check_vma=False,
    )(op.blocks, kron_in, x)
