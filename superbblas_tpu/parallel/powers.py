"""Communication-avoiding operator powers: ONE widened halo exchange
serving p stencil applications.

The reference implements this with the ``okr`` power label: the domain
partition is pre-extended by ``power`` neighbor shells (``ext_power``,
dist.h:3477-3509) so a single x-gather feeds all p local matvecs
(bsr.h:2140-2247).  The plain ``bsr_krylov(okr=...)`` path here unrolls p
applications of the GSPMD stencil, which costs p rounds of neighbor
collective-permutes; this module is the true communication-avoiding
variant:

  1. ``ppermute`` a halo of width p * max|offset| per sharded lattice
     axis — one exchange round, wider slabs;
  2. apply the stencil p times on the locally-extended block with plain
     local rolls.  A local roll is wrong only inside the outermost
     neighbor shell, and the contamination creeps inward one shell per
     application, so after k steps every site at distance >= k shells
     from the block edge is exact — the core is exact for all p outputs;
  3. crop each output to the core and restack the global array.

Trade-off (same as the reference's): (p-1) extra shells of redundant
compute + p-times-wider messages, against p-1 saved latency-bound
exchange rounds — a win when the per-shard surface/volume ratio is small
and ICI latency dominates, exactly the regime of strong-scaled lattice
stencils.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec

from .. import cplx
from ..bsr import BSROperator, _apply_stencil, _reshape, _stack
from ..labels import check_order, volume
from ..ops.copy import _is_static, local_permute
from .halo import crop_halos as _crop, extend_local as _extend

__all__ = ["bsr_krylov_ca"]


def bsr_krylov_ca(
    alpha,
    op: BSROperator,
    x,
    ox: str,
    mesh: Mesh,
    axes: Dict[str, Optional[str]],
    power: int,
    okr: str = "p",
    oy: Optional[str] = None,
):
    """y_k = alpha * A^{k+1} x for k in [0, power) with ONE halo exchange.

    ``axes`` maps lattice labels to mesh axis names (None/absent =
    unsharded).  ``x`` is a global array (or CArray) sharded accordingly;
    the result carries the power label ``okr`` (like ``bsr_krylov`` with
    ``okr=``, bsr.h:2353) and the same lattice sharding.

    Requires a square stencil operator and per-axis halo width
    ``power * max|offset|`` no larger than the local shard extent (the
    reference has the same constraint: the ext_power support may not wrap
    past the neighbor, dist.h:3477-3509).
    """
    if op.mode not in ("stencil", "gather"):
        raise ValueError(
            "communication-avoiding powers run on stencil or gather "
            "operators; SoA operators have apply_stencil_soa_sharded")
    if op.dim_i != op.dim_d or volume(op.bi) != volume(op.bd) or (
            op.kron is not None and volume(op.ki) != volume(op.kd)):
        raise ValueError("operator powers require a square operator")
    check_order(ox)
    user_complex = (not cplx.is_carray(x)) and jnp.iscomplexobj(x)
    if user_complex:
        x = cplx.from_complex(x)

    cols = "".join(c for c in ox if c not in op.lat_d + op.kron_d + op.blk_d)
    if oy is None:
        oy = op.lat_i + op.kron_i + op.blk_i + cols + okr
    check_order(oy)
    if okr not in oy:
        raise ValueError(f"power label {okr!r} not in oy={oy!r}")

    # canonical x: [*lat_d, KD?, BD, N]
    canon_x = op.lat_d + op.kron_d + op.blk_d + cols
    xc = local_permute(x, ox, canon_x)
    nlat = len(op.dim_d)
    lat_shape = xc.shape[:nlat]
    KD = volume(op.kd) if op.kron is not None else 1
    BD = volume(op.bd)
    N = volume(xc.shape[nlat + len(op.kron_d) + len(op.blk_d):])
    xc = _reshape(xc, lat_shape + ((KD, BD, N) if op.kron is not None
                                   else (BD, N)))
    x_trail = (xc.re.ndim if cplx.is_carray(xc) else xc.ndim) - nlat

    if op.mode == "gather":
        # IRREGULAR operators: the halo-plan executor's CA mode (the
        # per-site rows travel with the field; gather_sharded.py)
        if any(axes.get(c) is not None and mesh.shape[axes[c]] > 1
               for c in op.lat_d):
            from .gather_sharded import apply_gather_sharded

            stacked = apply_gather_sharded(op, xc, mesh, axes,
                                           power=power, all_powers=True)
        else:
            from ..bsr import _apply_gather, _apply_gather_kron

            fn = _apply_gather_kron if op.kron is not None else _apply_gather
            outs, cur = [], xc
            for _ in range(power):
                cur = fn(op, cur)
                outs.append(cur)
            stacked = _stack(outs, axis=0)
        return _finish_powers(op, x, ox, oy, okr, cols, alpha, power,
                              stacked, user_complex)

    # per-axis halo widths (power shells of the stencil radius)
    radius = [max((abs(o[ax]) for o in op.offsets), default=0)
              for ax in range(nlat)]
    ax_names: Dict[int, str] = {}
    widths: Dict[int, int] = {}
    for ax, c in enumerate(op.lat_d):
        nm = axes.get(c)
        if nm is None or mesh.shape[nm] == 1 or radius[ax] == 0:
            continue
        if op.dim_d[ax] % mesh.shape[nm]:
            raise ValueError(
                f"lattice axis {c!r} ({op.dim_d[ax]}) must divide evenly "
                f"over mesh axis {nm!r} ({mesh.shape[nm]})")
        local = op.dim_d[ax] // mesh.shape[nm]
        w = power * radius[ax]
        if w > local:
            raise ValueError(
                f"halo width {w} exceeds local extent {local} on axis "
                f"{c!r}; lower power or shard fewer axes")
        ax_names[ax] = nm
        widths[ax] = w

    spec_lat = tuple(axes.get(c) for c in op.lat_d)
    spec_x = PartitionSpec(*spec_lat, *([None] * x_trail))
    spec_b = PartitionSpec(*spec_lat, None, None, None)
    spec_out = PartitionSpec(None, *spec_lat, *([None] * x_trail))
    used = sorted({nm for nm in spec_lat if nm is not None})

    def body(blocks_l, kron_l, xc_l):
        blocks_e = _extend(blocks_l, ax_names, widths, mesh)
        x_e = _extend(xc_l, ax_names, widths, mesh)
        loc_dim = tuple(x_e.shape[:nlat])
        lop = BSROperator(
            oim=op.oim, odm=op.odm, lat_i=op.lat_i, lat_d=op.lat_d,
            blk_i=op.blk_i, blk_d=op.blk_d, dim_i=loc_dim, dim_d=loc_dim,
            bi=op.bi, bd=op.bd, mode="stencil", blocks=blocks_e,
            offsets=op.offsets,
            kron=kron_l if op.kron is not None else None,
            kron_i=op.kron_i,
            kron_d=op.kron_d, ki=op.ki, kd=op.kd,
        )
        outs = []
        cur = x_e
        for _ in range(power):
            cur = _apply_stencil(lop, cur)  # exact at distance >= k shells
            outs.append(_crop(cur, widths))
        return _stack(outs, axis=0)

    kron_in = op.kron if op.kron is not None else jnp.zeros((0,))
    stacked = shard_map(
        body, mesh=mesh,
        in_specs=(spec_b, PartitionSpec(), spec_x),
        out_specs=spec_out,
        check_vma=False,
    )(op.blocks, kron_in, xc)
    # stacked: [power, *lat_i, KI?, BI, N]
    return _finish_powers(op, x, ox, oy, okr, cols, alpha, power,
                          stacked, user_complex)


def _finish_powers(op, x, ox, oy, okr, cols, alpha, power, stacked,
                   user_complex):
    """Shared tail: reshape the canonical [power, *lat_i, KI?, BI, N]
    stack to the user's oy labels, scale, restore complex."""
    ki_shape = tuple(op.ki) if op.kron is not None else ()
    shape = (power,) + tuple(op.dim_i) + ki_shape + tuple(op.bi) + tuple(
        x.shape[ox.index(c)] for c in cols)
    canon_y = okr + op.lat_i + op.kron_i + op.blk_i + cols
    out = local_permute(_reshape(stacked, shape), canon_y, oy)
    if not (_is_static(alpha) and alpha == 1):
        out = cplx.scale(alpha, out)
    return cplx.to_complex(out) if user_complex else out
