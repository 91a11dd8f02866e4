"""Distributed batched dense linear algebra: cholesky / trsm / gesm / inversion.

Re-design of the reference's dense layer (``include/superbblas/dense.h``
in eromero-vlc/superbblas): label-driven batched factorizations where
``orows``/``ocols`` name the matrix axes and every other label is batch
(dense.h:1008-1160 public API; e.g. cholesky on "xyztscSC" with rows "sc"
and cols "SC" factorizes a 12x12 matrix per lattice site).  The reference
reorders data so each matrix is rank-local and calls LAPACK/cusolver
batched kernels (dense.h:504-569); here the op runs on global arrays —
sharded batch axes stay sharded and XLA keeps each matrix local.

Split-complex support: the interleaved real embedding

    phi(a + ib) = [[a, -b], [b, a]]   (per element, 2x2 blocks)

is a *-homomorphism with phi(A^H) = phi(A)^T, and the complex Cholesky
factor's diagonal is real, so phi(L) is genuinely lower-triangular: by
uniqueness, chol(phi(A)) = phi(chol(A)), and the same argument covers
triangular and general solves.  Complex factorizations therefore run as
real ones at 2x the dimension — no complex datapath needed.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from . import cplx
from .labels import check_order, volume
from .ops.copy import _is_static, local_permute

__all__ = ["cholesky", "trsm", "gesm", "inversion"]


# ---------------------------------------------------------------------------
# interleaved real embedding
# ---------------------------------------------------------------------------


def embed_real(c: cplx.CArray) -> jax.Array:
    """[..., n, m] split-complex -> [..., 2n, 2m] interleaved real."""
    re, im = c.re, c.im
    *batch, n, m = re.shape
    # block[..., i, p, j, q] = re*I2[p,q] + im*J[p,q],  J = [[0,-1],[1,0]]
    eye2 = jnp.asarray([[1.0, 0.0], [0.0, 1.0]], dtype=re.dtype)
    jmat = jnp.asarray([[0.0, -1.0], [1.0, 0.0]], dtype=re.dtype)
    blocks = re[..., :, None, :, None] * eye2[:, None, :] \
        + im[..., :, None, :, None] * jmat[:, None, :]
    return blocks.reshape(*batch, 2 * n, 2 * m)


def extract_embedded(m2: jax.Array) -> cplx.CArray:
    """Inverse of embed_real."""
    return cplx.CArray(m2[..., ::2, ::2], m2[..., 1::2, ::2])


# ---------------------------------------------------------------------------
# label plumbing
# ---------------------------------------------------------------------------


def _matrix_view(v, o: str, orows: str, ocols: str):
    """Permute/flatten to [batch..., R, C]; return (mat, restore_fn)."""
    check_order(o)
    for c in orows + ocols:
        if c not in o:
            raise ValueError(f"matrix label {c!r} not in order {o!r}")
    batch = "".join(c for c in o if c not in orows and c not in ocols)
    canon = batch + orows + ocols
    vm = local_permute(v, o, canon)
    shape = vm.shape
    nb = len(batch)
    bshape = shape[:nb]
    rshape = shape[nb:nb + len(orows)]
    cshape = shape[nb + len(orows):]
    R, C = volume(rshape), volume(cshape)
    if cplx.is_carray(vm):
        vm = cplx.cmap(lambda a: a.reshape(bshape + (R, C)), vm)
    else:
        vm = vm.reshape(bshape + (R, C))

    def restore(mat):
        if cplx.is_carray(mat):
            out = cplx.cmap(lambda a: a.reshape(bshape + rshape + cshape), mat)
        else:
            out = mat.reshape(bshape + rshape + cshape)
        return local_permute(out, canon, o)

    return vm, restore


def _hermitian_transpose(mat):
    if cplx.is_carray(mat):
        return cplx.conj(cplx.cmap(lambda a: jnp.swapaxes(a, -1, -2), mat))
    return jnp.swapaxes(mat, -1, -2).conj()


# ---------------------------------------------------------------------------
# public ops
# ---------------------------------------------------------------------------


from .utils.tracker import tracked as _tracked


@_tracked("cholesky")
def cholesky(v, o: str, orows: str, ocols: str):
    """Batched Cholesky factorization (public cholesky, dense.h:1020/1161).

    Factorizes the Hermitian positive-definite matrix formed by
    (orows x ocols) per batch point and returns the *upper* triangular
    factor U with A = U^H U (the reference documents returning the upper
    triangular matrix).
    """
    mat, restore = _matrix_view(v, o, orows, ocols)
    if cplx.is_carray(mat):
        l2 = jnp.linalg.cholesky(embed_real(mat))
        low = extract_embedded(l2)
    else:
        low = jnp.linalg.cholesky(mat)
    return restore(_hermitian_transpose(low))


@_tracked("trsm")
def trsm(alpha, c, oc: str, orows: str, ocols: str, x, ox: str, oy: str):
    """Batched triangular solve (public trsm, dense.h:1055).

    ``c`` is an upper-triangular factor (as returned by :func:`cholesky`)
    with matrix labels (orows x ocols).  ``x`` shares the row labels; the
    result carries the column labels instead:

        sum_cols C[rows, cols] y[cols, ...] = alpha x[rows, ...]

    i.e. y = alpha * C^{-1} x contracted by label.
    """
    cm, _ = _matrix_view(c, oc, orows, ocols)
    # x: batch labels of c that appear in ox stay batch; the row labels are
    # contracted; remaining x labels are the rhs columns.
    batch = "".join(ch for ch in oc if ch not in orows and ch not in ocols)
    xcols = "".join(ch for ch in ox if ch not in orows and ch not in batch)
    canon_x = "".join(ch for ch in batch if ch in ox) + orows + xcols
    xm = local_permute(x, ox, canon_x)
    nb = len([ch for ch in batch if ch in ox])
    bshape = xm.shape[:nb]
    rshape = xm.shape[nb:nb + len(orows)]
    nshape = xm.shape[nb + len(orows):]
    R, N = volume(rshape), volume(nshape)
    xm = (cplx.cmap(lambda a: a.reshape(bshape + (R, N)), xm)
          if cplx.is_carray(xm) else xm.reshape(bshape + (R, N)))

    if cplx.is_carray(cm) or cplx.is_carray(xm):
        cm = cm if cplx.is_carray(cm) else cplx.CArray(cm, jnp.zeros_like(cm))
        xm = xm if cplx.is_carray(xm) else cplx.CArray(xm, jnp.zeros_like(xm))
        c2 = embed_real(cm)                      # scalar-upper-triangular
        # embed the rhs by interleaving its rows: x2[2r] = re, x2[2r+1] = im
        x2 = jnp.stack([xm.re, xm.im], axis=-2).reshape(
            *xm.re.shape[:-2], 2 * R, N)
        y2 = jax.scipy.linalg.solve_triangular(c2, x2, lower=False)
        ym = cplx.CArray(
            y2.reshape(*xm.re.shape[:-2], R, 2, N)[..., 0, :],
            y2.reshape(*xm.re.shape[:-2], R, 2, N)[..., 1, :],
        )
    else:
        ym = jax.scipy.linalg.solve_triangular(cm, xm, lower=False)
    if not (_is_static(alpha) and alpha == 1):
        ym = cplx.scale(alpha, ym)

    # rebuild with cols labels in place of rows labels
    canon_y = "".join(ch for ch in batch if ch in ox) + ocols + xcols
    cshape = tuple(c.shape[oc.index(ch)] for ch in ocols)
    out = (cplx.cmap(lambda a: a.reshape(bshape + cshape + nshape), ym)
           if cplx.is_carray(ym) else ym.reshape(bshape + cshape + nshape))
    return local_permute(out, canon_y, oy)


@_tracked("gesm")
def gesm(alpha, a, oa: str, orows: str, ocols: str, x, ox: str, oy: str):
    """Batched general solve (public gesm, dense.h:1099): y with
    A[rows, cols] y[cols, ...] = alpha x[rows, ...] via LU."""
    am, _ = _matrix_view(a, oa, orows, ocols)
    batch = "".join(ch for ch in oa if ch not in orows and ch not in ocols)
    xcols = "".join(ch for ch in ox if ch not in orows and ch not in batch)
    canon_x = "".join(ch for ch in batch if ch in ox) + orows + xcols
    xm = local_permute(x, ox, canon_x)
    nb = len([ch for ch in batch if ch in ox])
    bshape = xm.shape[:nb]
    rshape = xm.shape[nb:nb + len(orows)]
    nshape = xm.shape[nb + len(orows):]
    R, N = volume(rshape), volume(nshape)
    xm = (cplx.cmap(lambda v: v.reshape(bshape + (R, N)), xm)
          if cplx.is_carray(xm) else xm.reshape(bshape + (R, N)))

    if cplx.is_carray(am) or cplx.is_carray(xm):
        am = am if cplx.is_carray(am) else cplx.CArray(am, jnp.zeros_like(am))
        xm = xm if cplx.is_carray(xm) else cplx.CArray(xm, jnp.zeros_like(xm))
        a2 = embed_real(am)
        x2 = jnp.stack([xm.re, xm.im], axis=-2).reshape(
            *xm.re.shape[:-2], 2 * R, N)
        y2 = jnp.linalg.solve(a2, x2)
        ym = cplx.CArray(
            y2.reshape(*xm.re.shape[:-2], R, 2, N)[..., 0, :],
            y2.reshape(*xm.re.shape[:-2], R, 2, N)[..., 1, :],
        )
    else:
        ym = jnp.linalg.solve(am, xm)
    if not (_is_static(alpha) and alpha == 1):
        ym = cplx.scale(alpha, ym)

    canon_y = "".join(ch for ch in batch if ch in ox) + ocols + xcols
    cshape = tuple(a.shape[oa.index(ch)] for ch in ocols)
    out = (cplx.cmap(lambda v: v.reshape(bshape + cshape + nshape), ym)
           if cplx.is_carray(ym) else ym.reshape(bshape + cshape + nshape))
    return local_permute(out, canon_y, oy)


@_tracked("inversion")
def inversion(v, o: str, orows: str, ocols: str):
    """Batched matrix inversion (public inversion, dense.h:1134)."""
    mat, restore = _matrix_view(v, o, orows, ocols)
    if cplx.is_carray(mat):
        inv2 = jnp.linalg.inv(embed_real(mat))
        return restore(extract_embedded(inv2))
    return restore(jnp.linalg.inv(mat))
