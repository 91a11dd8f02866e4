"""Wilson-clover operator: hopping Kron-BSR + site-local dense blocks.

The clover improvement adds a site-local term that mixes spin and color,

    D_cl = D_wilson - (c_sw / 2) sum_{mu<nu} sigma_{mu nu} (x) F~_{mu nu}(s)

with sigma_{mu nu} = (i/2)[gamma_mu, gamma_nu] and F~ the Hermitian
clover-leaf field strength F~ = (Q - Q^H) / (8 i), Q the sum of the four
plaquette leaves around the site.

Structurally this is the case the reference's plain (non-Kronecker) BSR
exists for: the clover block is a full 12x12 spin(x)color matrix per site
(not a Kronecker product), while the hopping term stays Kronecker-
factored.  Here the operator is the sum of two BSROperators — the Wilson
Kron-BSR stencil and a single-direction (offset 0) dense-block BSR —
applied back to back (reference analog: one kron create_kron_bsr plus
one create_bsr handle over the same partitions).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx
from ..bsr import BSROperator, bsr_from_stencil, bsr_krylov
from .wilson import NS, NC, gamma_matrices, random_su3_links, wilson_operator

__all__ = ["CloverOperator", "wilson_clover_operator", "apply_clover",
           "clover_field_strength"]


def _roll(a: np.ndarray, mu: int, k: int) -> np.ndarray:
    """a(s) -> a(s + k*mu) (value at the shifted site), lattice axes lead."""
    return np.roll(a, -k, axis=mu)


def _dag(u: np.ndarray) -> np.ndarray:
    return np.swapaxes(u, -1, -2).conj()


def clover_field_strength(links: np.ndarray, mu: int, nu: int) -> np.ndarray:
    """Hermitian clover-leaf F~_{mu nu}(s) = (Q - Q^H) / (8 i), [*lat, 3, 3]."""
    U = links

    def mm(*ms):
        out = ms[0]
        for m in ms[1:]:
            out = np.einsum("...ij,...jk->...ik", out, m)
        return out

    # four leaves around the site (standard clover sum)
    q1 = mm(U[mu], _roll(U[nu], mu, 1), _dag(_roll(U[mu], nu, 1)), _dag(U[nu]))
    q2 = mm(U[nu], _dag(_roll(_roll(U[mu], mu, -1), nu, 1)),
            _dag(_roll(U[nu], mu, -1)), _roll(U[mu], mu, -1))
    q3 = mm(_dag(_roll(U[mu], mu, -1)),
            _dag(_roll(_roll(U[nu], mu, -1), nu, -1)),
            _roll(_roll(U[mu], mu, -1), nu, -1), _roll(U[nu], nu, -1))
    q4 = mm(_dag(_roll(U[nu], nu, -1)), _roll(U[mu], nu, -1),
            _roll(_roll(U[nu], mu, 1), nu, -1), _dag(U[mu]))
    q = q1 + q2 + q3 + q4
    return (q - _dag(q)) / 8j


@dataclass(frozen=True)
class CloverOperator:
    """hop (Wilson Kron-BSR) + clover (site-local 12x12 dense BSR)."""

    hop: BSROperator
    clover: BSROperator
    c_sw: float

    @property
    def dim_i(self):
        return self.hop.dim_i

    def flops_per_matvec(self, ncols: int, complex_dtype: bool = True) -> int:
        return (self.hop.flops_per_matvec(ncols, complex_dtype)
                + self.clover.flops_per_matvec(ncols, complex_dtype))


def wilson_clover_operator(
    lat_dims: Tuple[int, ...],
    mass: float = 0.1,
    c_sw: float = 1.0,
    r: float = 1.0,
    key=None,
    dtype=jnp.complex64,
    links: Optional[np.ndarray] = None,
    layout: str = "aos",
) -> CloverOperator:
    """Build D_clover over random (or given) gauge links.

    The clover blocks are full spin(x)color 12x12 matrices; labels follow
    the Wilson convention — image "xyzt"+"Sc", domain "xyzt"+"SC", with
    the clover BSR treating (S, c) as one flattened dense block.

    ``layout="soa"`` builds BOTH terms in the SoA hot layout: the hopping
    runs the Pallas Wilson kernel and the clover term runs the same
    kernel as a center-only 12x12 stencil (144 full-tile VPU FMAs per
    site) on the SAME [n, 12, *lat] operand — apply_clover then takes
    SoA operands.
    """
    nd = len(lat_dims)
    if nd != 4:
        raise ValueError("the clover term is defined on a 4D lattice")
    from .wilson import _seed_from_key

    rng = np.random.default_rng(_seed_from_key(key))
    if links is None:
        links = random_su3_links(rng, lat_dims)

    hop = wilson_operator(lat_dims, mass=mass, r=r, dtype=dtype,
                          links=links, layout=layout)

    g = gamma_matrices()
    sigma = {}
    for mu in range(4):
        for nu in range(mu + 1, 4):
            sigma[(mu, nu)] = 0.5j * (g[mu] @ g[nu] - g[nu] @ g[mu])

    cblk = np.zeros(tuple(lat_dims) + (NS, NC, NS, NC), dtype=np.complex128)
    for (mu, nu), s_mn in sigma.items():
        f_mn = clover_field_strength(links, mu, nu)   # [*lat, 3, 3]
        cblk += -(c_sw / 2.0) * s_mn[:, None, :, None] * f_mn[..., None, :, None, :]
    cblk = cblk.reshape(tuple(lat_dims) + (1, NS * NC, NS * NC))

    part_dt = np.float32 if dtype == jnp.complex64 else np.float64
    lat_labels = "xyzt"
    clover = bsr_from_stencil(
        lat_labels + "Sc", lat_labels + "SC",
        lat_dims, {"S": NS, "c": NC}, {"S": NS, "C": NC},
        [(0, 0, 0, 0)],
        cplx.CArray(cblk.real.astype(part_dt),
                    cblk.imag.astype(part_dt)),
        layout=layout,
    )
    return CloverOperator(hop=hop, clover=clover, c_sw=c_sw)


def apply_clover(op: CloverOperator, x):
    """y = D_clover x.

    AoS operators take x [*lat, NS, NC, ncols] (CArray or complex); SoA
    operators (layout='soa') take [ncols, 12, *lat] CArrays — both terms
    then run in the Pallas stencil kernel on the same operand."""
    from .wilson import apply_wilson

    y_hop = apply_wilson(op.hop, x)
    if op.hop.mode == "stencil_soa":
        from ..bsr import apply_stencil_soa

        y_cl = apply_stencil_soa(op.clover, x)
        return cplx.add(y_hop, y_cl)

    # default oy = canonical image order "xyztScn" — same axes/extents as
    # the Wilson output ([*lat, NS, NC, n]), so the two add directly
    y_cl = bsr_krylov(1.0, op.clover, x, "xyztSCn")
    return cplx.add(y_hop, y_cl) if cplx.is_carray(y_hop) else y_hop + y_cl
