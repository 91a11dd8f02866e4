"""Chebyshev-smoothed symmetric two-grid cycle (VERDICT #7, attempt 2).

mg_setup_refine.py showed the coarse BASIS is not the bottleneck at 4^4
near-criticality (adaptive alpha-SA refinement left pcg at ~1.4x over
plain CG).  The single-omega Richardson pre/post smooth is: it damps only
the very top of the spectrum.  A degree-d Chebyshev smoother p(A)r
(minimax on [lambda_max/theta, lambda_max]) is still a polynomial in A,
so the V(1,1)-style cycle stays SPD for pcg, and each smoothing
application kills the whole upper band.
"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
import time

from superbblas_tpu import cplx
from superbblas_tpu.models import wilson_operator
from superbblas_tpu.models.multigrid import (
    _A_normal, build_prolongator, coarse_matrix, two_grid_preconditioner)
from superbblas_tpu.solvers import cg, pcg, power_iteration

lat = (4, 4, 4, 4)
op = wilson_operator(lat, mass=-1.8, key=3, dtype=jnp.complex128)
A = lambda u: _A_normal(op, u)
rng = np.random.default_rng(11)
b = cplx.CArray(jnp.asarray(rng.standard_normal(lat + (4, 3))),
                jnp.asarray(rng.standard_normal(lat + (4, 3))))

x_ref, _, it0 = cg(A, b, tol=1e-7, maxiter=6000)
print(f"plain CG: {int(it0)} iters", flush=True)

probe = cplx.CArray(jnp.asarray(rng.standard_normal(lat + (4, 3))),
                    jnp.asarray(rng.standard_normal(lat + (4, 3))))
lam_max, _ = power_iteration(A, probe, iters=40)
lam_max = float(lam_max) * 1.05
print("lambda_max ~", lam_max, flush=True)


def axpy(a, x, y):
    return cplx.CArray(a * x.re + y.re, a * x.im + y.im)


def cheby(Afn, r, lo, hi, degree):
    """x ~ A^{-1} r by Chebyshev iteration on [lo, hi] (standard
    d-term recurrence; x = p_d(A) r with p_d > 0 on [lo, hi])."""
    theta = 0.5 * (hi + lo)
    delta = 0.5 * (hi - lo)
    sigma = theta / delta
    rho = 1.0 / sigma
    x = cplx.CArray(r.re / theta, r.im / theta)
    if degree == 1:
        return x
    res = cplx.CArray(r.re - Afn(x).re, r.im - Afn(x).im)
    d = cplx.CArray(res.re * (2.0 * rho / delta) / 2.0,
                    res.im * (2.0 * rho / delta) / 2.0)
    # iterate
    for _ in range(degree - 1):
        x = cplx.CArray(x.re + d.re, x.im + d.im)
        res = cplx.CArray(res.re - Afn(d).re, res.im - Afn(d).im)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = cplx.CArray((rho * rho_new) * d.re + (2.0 * rho_new / delta) * res.re,
                        (rho * rho_new) * d.im + (2.0 * rho_new / delta) * res.im)
        rho = rho_new
    return x


def sym_cycle(P, A_c, block, degree, theta_div):
    lo, hi = lam_max / theta_div, lam_max
    coarse = two_grid_preconditioner(op, P, A_c, block, omega=0.0)

    def prec(r):
        x1 = cheby(A, r, lo, hi, degree)
        r1 = cplx.CArray(r.re - A(x1).re, r.im - A(x1).im)
        c = coarse(r1)
        x2 = cplx.CArray(x1.re + c.re, x1.im + c.im)
        r2 = cplx.CArray(r.re - A(x2).re, r.im - A(x2).im)
        s = cheby(A, r2, lo, hi, degree)
        return cplx.CArray(x2.re + s.re, x2.im + s.im)
    return prec


for K in (8, 12):
    P = build_prolongator(op, K=K, setup_iters=30)
    A_c = coarse_matrix(op, P)
    for degree, theta in ((2, 10.0), (4, 10.0), (4, 30.0), (6, 30.0)):
        M = sym_cycle(P, A_c, (2, 2, 2, 2), degree, theta)
        t0 = time.time()
        xp, _, itp = pcg(A, M, b, tol=1e-7, maxiter=6000)
        err = float(jnp.sum((xp.re - x_ref.re) ** 2 + (xp.im - x_ref.im) ** 2)
                    / jnp.sum(x_ref.re ** 2 + x_ref.im ** 2))
        # matvec-count comparison: each pcg iter costs 1 (cg matvec) +
        # 2*degree + 2 (cycle) applications of A
        mv = int(itp) * (2 * degree + 3)
        print(f"K={K} cheby(d={degree}, theta={theta}): {int(itp)} iters "
              f"(~{mv} matvecs vs {int(it0)} plain), it-speedup "
              f"{int(it0)/int(itp):.2f}x, err {err:.1e} "
              f"({time.time()-t0:.1f}s)", flush=True)
