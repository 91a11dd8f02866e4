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

__all__ = ["cg", "cgne", "bicgstab", "pcg", "fgcr", "power_iteration",
           "lanczos", "ritz_extremes", "refined_solve"]


def _inner_c(a, b, cols: bool = False):
    """<a, b> (complex) as a (re, im) pair; psum-reduced when sharded.
    With ``cols`` the reduction keeps the LAST axis (per-column scalars
    for multi-RHS solves)."""
    if cplx.is_carray(a):
        re = a.re * b.re + a.im * b.im
        im = a.re * b.im - a.im * b.re
    else:
        re, im = a * b, jnp.zeros_like(a)
    ax = tuple(range(re.ndim - 1)) if cols else None
    return jnp.sum(re, axis=ax), jnp.sum(im, axis=ax)


def _inner_r(a, b, cols: bool = False):
    """Real part of <a, b>; with ``cols`` the reduction keeps the LAST
    axis (independent per-column inner products for multi-RHS solves —
    the scalars become (N,) vectors that broadcast against the trailing
    column axis of the fields)."""
    if cplx.is_carray(a):
        v = a.re * b.re + a.im * b.im
    else:
        v = a * b
    return jnp.sum(v, axis=tuple(range(v.ndim - 1))) if cols else jnp.sum(v)


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


def cg(A: Callable, b, x0=None, tol: float = 1e-8, maxiter: int = 100,
       cols: bool = False):
    """Conjugate gradients for Hermitian positive-definite ``A``.

    Returns (x, |r|^2, iterations).  With ``cols=True`` the trailing axis
    of ``b`` holds independent right-hand sides solved SIMULTANEOUSLY
    with per-column step sizes (multi-RHS: one batched operator apply
    serves N solves, raising the matvec arithmetic intensity — the
    production deployment mode of lattice solvers); |r|^2 is then (N,)
    and the loop runs until every column converges.  Reference analog:
    the solver loop superbblas consumers build over bsr_krylov
    (bsr.h:2353) — e.g. the matvec-per-iteration workload of
    tests/bsr_hist.cpp:17-38."""
    x = _zeros(b) if x0 is None else x0
    r = _axpy_c((-1.0, 0.0), A(x), b) if x0 is not None else b
    p = r
    rs = _inner_r(r, r, cols)
    bs = jnp.maximum(_inner_r(b, b, cols), 1e-30)

    def cond(st):
        _, _, _, rs, k = st
        return jnp.logical_and(k < maxiter, jnp.max(rs / bs) > tol * tol)

    def body(st):
        x, r, p, rs, k = st
        ap = A(p)
        alpha = rs / jnp.maximum(_inner_r(p, ap, cols), 1e-30)
        x = _axpy_c((alpha, 0.0 * alpha), p, x)
        r = _axpy_c((-alpha, 0.0 * alpha), ap, r)
        rs_new = _inner_r(r, r, cols)
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


def fgcr(A: Callable, b, M: Optional[Callable] = None, x0=None,
         tol: float = 1e-8, maxiter: int = 100, restart: int = 8,
         cols: bool = False):
    """Flexible restarted GCR(``restart``) for GENERAL (non-Hermitian)
    ``A`` with an arbitrary — possibly nonlinear/varying — right
    preconditioner ``M`` (e.g. a multigrid V-cycle on the unsquared
    operator).  Minimizes ||b - A x|| over the preconditioned Krylov
    space each cycle, like flexible GMRES but with the simple
    residual-projection recurrence (the solver QCD multigrid stacks wrap
    around their V-cycles; driven over bsr_krylov-class applies in
    reference terms, bsr.h:2353).

    Returns (x, |r|^2, iterations); ``cols=True`` solves independent
    right-hand sides in the trailing axis simultaneously with per-column
    projection coefficients.  One A-apply and one M-apply per iteration;
    each restart cycle stores ``restart`` direction pairs (z_k, A z_k).
    """
    if M is None:
        M = lambda r: r
    x = _zeros(b) if x0 is None else x0
    r = _axpy_c((-1.0, 0.0), A(x), b) if x0 is not None else b
    rs = _inner_r(r, r, cols)
    bs = jnp.maximum(_inner_r(b, b, cols), 1e-30)

    def cond(st):
        _, _, rs, k = st
        return jnp.logical_and(k < maxiter, jnp.max(rs / bs) > tol * tol)

    def body(st):
        x, r, rs, k = st
        zs, ws = [], []
        for _ in range(restart):
            z = M(r)
            w = A(z)
            for zi, wi in zip(zs, ws):
                beta = _inner_c(wi, w, cols)
                w = _axpy_c((-beta[0], -beta[1]), wi, w)
                z = _axpy_c((-beta[0], -beta[1]), zi, z)
            nrm = jnp.sqrt(jnp.maximum(_inner_r(w, w, cols), 1e-60))
            w = _scale_c((1.0 / nrm, 0.0 * nrm), w)
            z = _scale_c((1.0 / nrm, 0.0 * nrm), z)
            zs.append(z)
            ws.append(w)
            alpha = _inner_c(w, r, cols)
            x = _axpy_c(alpha, z, x)
            r = _axpy_c((-alpha[0], -alpha[1]), w, r)
        return (x, r, _inner_r(r, r, cols), k + restart)

    st = (x, r, rs, jnp.zeros((), jnp.int32))
    x, r, rs, k = jax.lax.while_loop(cond, body, st)
    return x, rs, k


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
        maxiter: int = 100, cols: bool = False):
    """Preconditioned CG for Hermitian PD ``A`` with SPD preconditioner
    ``M`` (e.g. the two-grid cycle of models/multigrid.py).  Returns
    (x, |r|^2, iterations).  With ``cols=True`` the trailing axis holds
    independent right-hand sides with per-column step sizes (see
    :func:`cg`); every V-cycle then smooths and coarse-solves N columns
    in one batched apply — the multi-RHS mode that raises the coarse
    GEMM arithmetic intensity.  Reference analog: the preconditioned
    solver loops Chroma's multigrid stacks drive over bsr_krylov handles
    (bsr.h:2353)."""
    x = _zeros(b) if x0 is None else x0
    r = _axpy_c((-1.0, 0.0), A(x), b) if x0 is not None else b
    z = M(r)
    p = z
    rz = _inner_r(r, z, cols)
    rn = _inner_r(r, r, cols)
    bs = jnp.maximum(_inner_r(b, b, cols), 1e-30)

    def cond(st):
        x, r, z, p, rz, rn, k = st
        return jnp.logical_and(k < maxiter, jnp.max(rn / bs) > tol * tol)

    def body(st):
        x, r, z, p, rz, rn, k = st
        ap = A(p)
        alpha = rz / jnp.maximum(_inner_r(p, ap, cols), 1e-30)
        x = _axpy_c((alpha, 0.0 * alpha), p, x)
        r = _axpy_c((-alpha, 0.0 * alpha), ap, r)
        z = M(r)
        rz_new = _inner_r(r, z, cols)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = _axpy_c((beta, 0.0 * beta), p, z)
        return (x, r, z, p, rz_new, _inner_r(r, r, cols), k + 1)

    st = (x, r, z, p, rz, rn, jnp.zeros((), jnp.int32))
    x, r, z, p, rz, rn, k = jax.lax.while_loop(cond, body, st)
    return x, rn, k
