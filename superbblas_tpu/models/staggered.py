"""Staggered (Kogut-Susskind) fermion operator.

The second canonical lattice-QCD operator family the reference library
serves (its BSR engine is operator-agnostic: tests/bsr.cpp parametrizes
block sizes; staggered is the 1-spin, color-only case).  Structure:

    D x(s) = m x(s)
             + 1/2 sum_mu eta_mu(s) [ U_mu(s) x(s+mu)
                                      - U_mu(s-mu)^H x(s-mu) ]

with the site-dependent Kawamoto-Smit phases
eta_mu(s) = (-1)^(s_0 + ... + s_{mu-1}).  Unlike Wilson there is no spin
structure at all: blocks are plain 3x3 color matrices, so the operator is
a *non-Kronecker* BSR stencil — it exercises the plain-blocks hot path
(and the SoA/Pallas kernel with KI=KD=1).

The hopping part is anti-Hermitian (the mass term shifts all eigenvalues
onto m + i*lambda), so CG runs on D^H D as for Wilson.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx
from ..bsr import BSROperator, bsr_from_stencil, bsr_krylov
from .wilson import random_su3_links

NC = 3

__all__ = ["staggered_operator", "apply_staggered", "eta_phases"]


def eta_phases(lat_dims: Tuple[int, ...]) -> np.ndarray:
    """eta[mu, *lat] = (-1)^(s_0 + ... + s_{mu-1})."""
    nd = len(lat_dims)
    coords = np.meshgrid(*[np.arange(d) for d in lat_dims], indexing="ij")
    eta = np.ones((nd,) + tuple(lat_dims))
    acc = np.zeros(tuple(lat_dims), dtype=np.int64)
    for mu in range(nd):
        eta[mu] = (-1.0) ** (acc % 2)
        acc = acc + coords[mu]
    return eta


def staggered_operator(
    lat_dims: Tuple[int, ...],
    mass: float = 0.1,
    key=None,
    dtype=jnp.complex64,
    links: Optional[np.ndarray] = None,
    layout: str = "aos",
) -> BSROperator:
    """Build the staggered operator as a plain (non-kron) BSR stencil.

    Labels: lattice "xyzt"[:nd], color "c" (image) / "C" (domain).
    ``layout="soa"`` selects the Pallas hot path (same lattice-shape
    constraints as the Wilson SoA layout).
    """
    nd = len(lat_dims)
    from .wilson import _seed_from_key

    rng = np.random.default_rng(_seed_from_key(key))
    if links is None:
        links = random_su3_links(rng, lat_dims)   # [mu, *lat, 3, 3]
    eta = eta_phases(lat_dims)
    eye_c = np.broadcast_to(np.eye(NC, dtype=np.complex128),
                            tuple(lat_dims) + (NC, NC))

    offsets = [(0,) * nd]
    blocks = [mass * eye_c]
    for mu in range(nd):
        fwd = [0] * nd
        fwd[mu] = 1
        offsets.append(tuple(fwd))
        blocks.append(0.5 * eta[mu][..., None, None] * links[mu])
        bwd = [0] * nd
        bwd[mu] = -1
        offsets.append(tuple(bwd))
        shifted = np.roll(links[mu], 1, axis=mu)
        blocks.append(-0.5 * eta[mu][..., None, None]
                      * np.swapaxes(shifted, -1, -2).conj())

    part_dt = np.float32 if dtype == jnp.complex64 else np.float64
    vals = np.stack(blocks, axis=nd).astype(np.complex128)
    lat_labels = "xyzt"[:nd]
    return bsr_from_stencil(
        lat_labels + "c", lat_labels + "C",
        lat_dims, {"c": NC}, {"C": NC},
        offsets,
        cplx.CArray(vals.real.astype(part_dt),
                    vals.imag.astype(part_dt)),
        layout=layout,
    )


def apply_staggered(op: BSROperator, x):
    """y = D x.  AoS operands: [*lat, NC, ncols]; SoA: [ncols, NC, *lat]
    CArrays."""
    if op.mode == "stencil_soa":
        from ..bsr import apply_stencil_soa

        return apply_stencil_soa(op, x)
    nd = len(op.dim_d)
    return bsr_krylov(1.0, op, x, "xyzt"[:nd] + "Cn")
