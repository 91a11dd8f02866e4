"""Even-odd (red-black) preconditioned Wilson solves.

The production trick for nearest-neighbor lattice operators: with sites
checkerboarded into even/odd, the Wilson matrix is

    D = [[ a I   , D_eo ],        a = m + 4 r   (site-diagonal part)
         [ D_oe  , a I  ]]

and solving D psi = b reduces to the half-size Schur system

    Dhat psi_e = b_e - (1/a) D_eo b_o,   Dhat = a - (1/a) D_eo D_oe,

with psi_o = (b_o - D_oe psi_e) / a reconstructed site-locally.  Dhat has
half the dimension and a squared-improved condition number — fewer CG
iterations per solve.

Here the checkerboard is a site mask over the global (possibly sharded)
lattice array: the hopping operator maps even-supported fields to
odd-supported ones exactly, so D_eo z = P_e H z with H = D - a I applied
through the ordinary stencil matvec (halo collectives ride the sharding
as usual).  A packed-checkerboard layout (2x less compute per half-step)
is a later optimization; masking keeps every existing kernel unchanged.

Reference analog: superbblas itself carries no solver, but its consumers
(Chroma) drive exactly this scheme through bsr_krylov on half-lattice
partitions; `make_hole` partitions (dist.h:3745) serve the same
site-subset role there.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import cplx
from ..bsr import BSROperator
from .wilson import (
    adjoint_operator,
    apply_wilson,
    apply_wilson_dagger,
    _axpy,
    _inner,
    _zeros_like,
)

__all__ = ["checkerboard_masks", "eo_solve", "schur_matvec",
           "schur_cg"]


def schur_cg(Dhat, Dhat_h, rhs, n_iters: int):
    """CG on the normal equations Dhat^H Dhat x = Dhat^H rhs — the shared
    Schur-complement iteration behind eo_solve and the packed variants.
    Returns (x, |r|^2)."""
    x = _zeros_like(rhs)
    r = Dhat_h(rhs)
    p = r
    rs = _inner(r, r)

    def body(_, state):
        x, r, p, rs = state
        ap = Dhat_h(Dhat(p))
        alpha = rs / jnp.maximum(_inner(p, ap), 1e-30)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, ap, r)
        rs_new = _inner(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-30)
        if cplx.is_carray(r):
            p = cplx.add(r, cplx.CArray(beta * p.re, beta * p.im))
        else:
            p = r + beta.astype(r.dtype) * p
        return (x, r, p, rs_new)

    x, r, p, rs = jax.lax.fori_loop(0, n_iters, body, (x, r, p, rs))
    return x, rs


def checkerboard_masks(lat_dims: Tuple[int, ...], trailing: int):
    """(even, odd) 0/1 masks shaped [*lat] + [1]*trailing."""
    coords = np.meshgrid(*[np.arange(d) for d in lat_dims], indexing="ij")
    par = sum(coords) % 2
    even = (par == 0).astype(np.float32)
    shape = tuple(lat_dims) + (1,) * trailing
    even = jnp.asarray(even.reshape(shape))
    return even, 1.0 - even


def _mask(m, x):
    if cplx.is_carray(x):
        return cplx.CArray(m * x.re, m * x.im)
    return m * x


def _scale(a, x):
    return cplx.scale(a, x)


def schur_matvec(op: BSROperator, a: float, even, odd, v):
    """Dhat v = a v - (1/a) P_e H (H v) for even-supported v (H = D - aI
    maps parities, so the inner product is odd-supported automatically)."""
    hv = _mask(odd, cplx.add(apply_wilson(op, v), _scale(-a, v)))
    hhv = _mask(even, cplx.add(apply_wilson(op, hv), _scale(-a, hv)))
    return cplx.add(_scale(a, v), _scale(-1.0 / a, hhv))


def _schur_matvec_dagger(op_h: BSROperator, a: float, even, odd, v):
    def hdag(x):
        return cplx.add(apply_wilson(op_h, x), _scale(-a, x))
    hv = _mask(odd, hdag(v))
    hhv = _mask(even, hdag(hv))
    return cplx.add(_scale(a, v), _scale(-1.0 / a, hhv))


def eo_solve(op: BSROperator, b, a: float, n_iters: int = 50):
    """Solve D psi = b by CG on the normal equations of the even-odd Schur
    complement; returns (psi, |r_e|^2 of the Schur CG).

    ``op`` is the (AoS) Wilson operator, ``a`` its site-diagonal scalar
    (mass + 4r), ``b`` shaped [*lat, NS, NC, ncols].
    """
    nlat = len(op.dim_d)
    even, odd = checkerboard_masks(op.dim_i, b.ndim - nlat)
    op_h = adjoint_operator(op)

    b_e = _mask(even, b)
    b_o = _mask(odd, b)
    # rhs_e = b_e - (1/a) D_eo b_o
    h_bo = _mask(even, cplx.add(apply_wilson(op, b_o), _scale(-a, b_o)))
    rhs = cplx.add(b_e, _scale(-1.0 / a, h_bo))

    A = lambda v: schur_matvec(op, a, even, odd, v)
    Ah = lambda v: _schur_matvec_dagger(op_h, a, even, odd, v)

    x, rs = schur_cg(A, Ah, rhs, n_iters)
    psi_e = _mask(even, x)
    # psi_o = (b_o - D_oe psi_e) / a
    h_pe = _mask(odd, cplx.add(apply_wilson(op, psi_e), _scale(-a, psi_e)))
    psi_o = _scale(1.0 / a, cplx.add(b_o, _scale(-1.0, h_pe)))
    return cplx.add(psi_e, psi_o), rs
