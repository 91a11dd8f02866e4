"""Generic Krylov solvers over arbitrary operator applies.

The reference library is driven by Krylov-method consumers
(Chroma solvers, PRIMME eigensolvers — the ``bsr_krylov`` name says it);
this module provides the standard iterations as jit-compiled
``lax.while_loop``s over ANY apply function ``A(x)`` on arrays or
split-complex ``CArray`` pytrees — sharded operands inherit their
collectives from the apply, inner products psum-reduce automatically.

All solvers are matrix-free and allocation-free inside the loop.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from . import cplx

__all__ = ["cg", "cgne", "bicgstab", "pcg", "power_iteration", "lanczos",
           "ritz_extremes", "refined_solve"]


def _inner_c(a, b):
    """<a, b> (complex) as a (re, im) pair; psum-reduced when sharded."""
    if cplx.is_carray(a):
        re = jnp.sum(a.re * b.re + a.im * b.im)
        im = jnp.sum(a.re * b.im - a.im * b.re)
        return re, im
    return jnp.sum(a * b), jnp.zeros(())


def _inner_r(a, b):
    if cplx.is_carray(a):
        return jnp.sum(a.re * b.re + a.im * b.im)
    return jnp.sum(a * b)


def _axpy_c(alpha: Tuple, x, y):
    """y + alpha x for a (re, im) scalar pair."""
    ar, ai = alpha
    if cplx.is_carray(x):
        return cplx.CArray(y.re + ar * x.re - ai * x.im,
                           y.im + ar * x.im + ai * x.re)
    return y + ar * x


def _scale_c(alpha: Tuple, x):
    ar, ai = alpha
    if cplx.is_carray(x):
        return cplx.CArray(ar * x.re - ai * x.im, ar * x.im + ai * x.re)
    return ar * x


def _cdiv(n: Tuple, d: Tuple):
    nr, ni = n
    dr, di = d
    den = jnp.maximum(dr * dr + di * di, 1e-30)
    return ((nr * dr + ni * di) / den, (ni * dr - nr * di) / den)


def _zeros(x):
    return cplx.cmap(jnp.zeros_like, x) if cplx.is_carray(x) else jnp.zeros_like(x)


def cg(A: Callable, b, x0=None, tol: float = 1e-8, maxiter: int = 100):
    """Conjugate gradients for Hermitian positive-definite ``A``.

    Returns (x, |r|^2, iterations).  Reference analog: the solver loop
    superbblas consumers build over bsr_krylov (bsr.h:2353) — e.g. the
    matvec-per-iteration workload of tests/bsr_hist.cpp:17-38."""
    x = _zeros(b) if x0 is None else x0
    r = _axpy_c((-1.0, 0.0), A(x), b) if x0 is not None else b
    p = r
    rs = _inner_r(r, r)
    bs = jnp.maximum(_inner_r(b, b), 1e-30)

    def cond(st):
        _, _, _, rs, k = st
        return jnp.logical_and(k < maxiter, rs / bs > tol * tol)

    def body(st):
        x, r, p, rs, k = st
        ap = A(p)
        alpha = rs / jnp.maximum(_inner_r(p, ap), 1e-30)
        x = _axpy_c((alpha, 0.0 * alpha), p, x)
        r = _axpy_c((-alpha, 0.0 * alpha), ap, r)
        rs_new = _inner_r(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = _axpy_c((beta, 0.0 * beta), p, r)
        return (x, r, p, rs_new, k + 1)

    x, r, p, rs, k = jax.lax.while_loop(cond, body, (x, r, p, rs,
                                                     jnp.zeros((), jnp.int32)))
    return x, rs, k


def cgne(A: Callable, Ah: Callable, b, **kw):
    """CG on the normal equations A^H A x = A^H b for general ``A`` with
    adjoint ``Ah`` (the iteration the Wilson solves use; reference
    consumers drive it through two bsr_krylov handles, bsr.h:2353)."""
    return cg(lambda v: Ah(A(v)), Ah(b), **kw)


def bicgstab(A: Callable, b, x0=None, tol: float = 1e-8, maxiter: int = 100):
    """BiCGStab for general (non-Hermitian) ``A`` — the standard
    lattice-QCD solver for the unsquared Wilson operator (one
    bsr_krylov-class apply per half-step in reference terms, bsr.h:2353).

    Returns (x, |r|^2, iterations)."""
    x = _zeros(b) if x0 is None else x0
    r = _axpy_c((-1.0, 0.0), A(x), b) if x0 is not None else b
    rhat = r
    p = r
    rho = _inner_c(rhat, r)
    bs = jnp.maximum(_inner_r(b, b), 1e-30)

    def cond(st):
        x, r, p, rhat, rho, k = st
        return jnp.logical_and(k < maxiter,
                               _inner_r(r, r) / bs > tol * tol)

    def body(st):
        x, r, p, rhat, rho, k = st
        v = A(p)
        alpha = _cdiv(rho, _inner_c(rhat, v))
        s = _axpy_c((-alpha[0], -alpha[1]), v, r)
        t = A(s)
        ts = _inner_c(t, s)
        tt = jnp.maximum(_inner_r(t, t), 1e-30)
        omega = (ts[0] / tt, ts[1] / tt)
        x = _axpy_c(alpha, p, _axpy_c(omega, s, x))
        r = _axpy_c((-omega[0], -omega[1]), t, s)
        rho_new = _inner_c(rhat, r)
        beta = _cdiv(rho_new, rho)
        beta = _cdiv(beta, _cdiv(omega, alpha))   # (rho'/rho)(alpha/omega)
        pm = _axpy_c((-omega[0], -omega[1]), v, p)
        p = _axpy_c(beta, pm, r)
        return (x, r, p, rhat, rho_new, k + 1)

    st = (x, r, p, rhat, rho, jnp.zeros((), jnp.int32))
    x, r, p, rhat, rho, k = jax.lax.while_loop(cond, body, st)
    return x, _inner_r(r, r), k


def power_iteration(A: Callable, x0, iters: int = 50):
    """Dominant eigenvalue estimate of Hermitian ``A`` by normalized power
    iteration; returns (lambda_max, x).  One operator apply per
    iteration: the Rayleigh quotient <x, Ax> is computed from the same
    apply that advances the iterate."""
    def body(_, st):
        x, _ = st
        xn = jnp.sqrt(jnp.maximum(_inner_r(x, x), 1e-30))
        x = _scale_c((1.0 / xn, 0.0 * xn), x)
        y = A(x)
        lam = _inner_r(x, y)          # <x, Ax> with |x| = 1
        return (y, lam)

    y, lam = jax.lax.fori_loop(0, iters, body, (x0, jnp.zeros(())))
    xn = jnp.sqrt(jnp.maximum(_inner_r(y, y), 1e-30))
    return lam, _scale_c((1.0 / xn, 0.0 * xn), y)


def lanczos(A: Callable, x0, m: int = 30):
    """m-step Lanczos tridiagonalization of Hermitian ``A`` from ``x0``.

    Returns (alphas[m], betas[m-1]) — the tridiagonal coefficients whose
    eigenvalues are the Ritz values (extreme-eigenvalue estimates the
    reference's companion eigensolver PRIMME drives through bsr_krylov
    applies, bsr.h:2353).  Fixed-iteration jit-compiled loop with full
    state in the carry; no reorthogonalization (fine for extreme-pair
    estimates at small m).
    """
    nrm0 = jnp.sqrt(jnp.maximum(_inner_r(x0, x0), 1e-30))
    q = _scale_c((1.0 / nrm0, 0.0 * nrm0), x0)
    q_prev = _zeros(x0)

    def body(_, st):
        q_prev, q, alphas, betas, k, done = st
        w = A(q)
        alpha = _inner_r(q, w)
        w = _axpy_c((-alpha, 0.0 * alpha), q, w)
        kb = jnp.maximum(k - 1, 0)
        beta_prev = jnp.where(k > 0, betas[kb], 0.0)
        w = _axpy_c((-beta_prev, 0.0 * beta_prev), q_prev, w)
        bsq = _inner_r(w, w)
        beta = jnp.sqrt(jnp.maximum(bsq, 1e-30))
        # breakdown (Krylov space exhausted): freeze the recurrence so
        # trailing alphas/betas stay zero and ritz_extremes can trim
        alphas = jnp.where(done, alphas, alphas.at[k].set(alpha))
        betas = jnp.where(done, betas, betas.at[k].set(beta))
        done = jnp.logical_or(done, bsq < 1e-24)
        q_next = _scale_c((1.0 / beta, 0.0 * beta), w)
        q_next = jax.tree.map(
            lambda a, b: jnp.where(done, a, b), q, q_next)
        return (q, q_next, alphas, betas, k + 1, done)

    st = (q_prev, q, jnp.zeros((m,)), jnp.zeros((m,)),
          jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    _, _, alphas, betas, _, done = jax.lax.fori_loop(0, m, body, st)
    betas = jnp.where(done, betas, betas)   # value already frozen
    return alphas, betas[:m - 1]


def ritz_extremes(alphas, betas):
    """(lambda_min, lambda_max) estimates from Lanczos coefficients,
    trimmed at the first breakdown (zero beta row) so exhausted Krylov
    spaces do not inject spurious zero eigenvalues.  Pairs with
    :func:`lanczos` (the PRIMME-companion estimate over bsr_krylov
    applies, bsr.h:2353)."""
    import numpy as np

    a = np.asarray(alphas)
    b = np.asarray(betas)
    nz = np.nonzero(np.abs(b) < 1e-12)[0]
    m = (int(nz[0]) + 1) if nz.size else a.shape[0]
    a, b = a[:m], b[:max(m - 1, 0)]
    T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
    w = np.linalg.eigvalsh(T)
    return float(w[0]), float(w[-1])


def refined_solve(A: Callable, inner_solve: Callable, b, cycles: int = 3):
    """Mixed-precision iterative refinement (driven over bsr_krylov-class
    applies in reference terms, bsr.h:2353): repeat
    ``x += inner_solve(r); r = b - A x`` with the residual update in the
    operand precision — the standard lattice-QCD production scheme
    (outer f64/f32 accuracy from an inner bf16/f32 solver; pairs with
    the kernel's bf16 storage path).  Returns (x, |r|^2)."""
    x = _zeros(b)
    r = b

    def body(_, st):
        x, r = st
        dx = inner_solve(r)
        x = _axpy_c((1.0, 0.0), dx, x)
        r = _axpy_c((-1.0, 0.0), A(x), b)
        return (x, r)

    x, r = jax.lax.fori_loop(0, cycles, body, (x, r))
    return x, _inner_r(r, r)


def pcg(A: Callable, M: Callable, b, x0=None, tol: float = 1e-8,
        maxiter: int = 100):
    """Preconditioned CG for Hermitian PD ``A`` with SPD preconditioner
    ``M`` (e.g. the two-grid cycle of models/multigrid.py).  Returns
    (x, |r|^2, iterations).  Reference analog: the preconditioned solver
    loops Chroma's multigrid stacks drive over bsr_krylov handles
    (bsr.h:2353)."""
    x = _zeros(b) if x0 is None else x0
    r = _axpy_c((-1.0, 0.0), A(x), b) if x0 is not None else b
    z = M(r)
    p = z
    rz = _inner_r(r, z)
    rn = _inner_r(r, r)
    bs = jnp.maximum(_inner_r(b, b), 1e-30)

    def cond(st):
        x, r, z, p, rz, rn, k = st
        return jnp.logical_and(k < maxiter, rn / bs > tol * tol)

    def body(st):
        x, r, z, p, rz, rn, k = st
        ap = A(p)
        alpha = rz / jnp.maximum(_inner_r(p, ap), 1e-30)
        x = _axpy_c((alpha, 0.0 * alpha), p, x)
        r = _axpy_c((-alpha, 0.0 * alpha), ap, r)
        z = M(r)
        rz_new = _inner_r(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = _axpy_c((beta, 0.0 * beta), p, z)
        return (x, r, z, p, rz_new, _inner_r(r, r), k + 1)

    st = (x, r, z, p, rz, rn, jnp.zeros((), jnp.int32))
    x, r, z, p, rz, rn, k = jax.lax.while_loop(cond, body, st)
    return x, rn, k
