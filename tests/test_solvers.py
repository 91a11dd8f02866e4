"""Generic Krylov solvers (solvers.py) against dense oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superbblas_tpu import cplx, solvers
from superbblas_tpu.models import (
    apply_coarse,
    apply_wilson,
    apply_wilson_dagger,
    coarse_operator,
    wilson_operator,
)


def test_cg_hermitian_pd():
    """Coarse operator + shift is Hermitian PD; CG must hit the tol."""
    lat, nc = (4, 4), 6
    op = coarse_operator(lat, block_size=nc, mass=8.0, key=2,
                         dtype=jnp.complex128)
    rng = np.random.default_rng(0)
    b = cplx.CArray(jnp.asarray(rng.standard_normal(lat + (nc, 1))),
                    jnp.asarray(rng.standard_normal(lat + (nc, 1))))
    A = lambda v: apply_coarse(op, v)
    x, rs, k = solvers.cg(A, b, tol=1e-10, maxiter=500)
    res = A(x)
    rel = np.sqrt(((np.asarray(res.re) - np.asarray(b.re)) ** 2
                   + (np.asarray(res.im) - np.asarray(b.im)) ** 2).sum()
                  / (np.asarray(b.re) ** 2 + np.asarray(b.im) ** 2).sum())
    assert rel < 1e-8, (rel, int(k))


def test_cgne_and_bicgstab_wilson():
    lat, m = (4, 4, 2, 2), 0.5
    op = wilson_operator(lat, mass=m, key=3, dtype=jnp.complex128)
    rng = np.random.default_rng(1)
    shape = lat + (4, 3, 1)
    b = cplx.CArray(jnp.asarray(rng.standard_normal(shape)),
                    jnp.asarray(rng.standard_normal(shape)))
    A = lambda v: apply_wilson(op, v)
    Ah = lambda v: apply_wilson_dagger(op, v)

    for name, (x, rs, k) in (
        ("cgne", solvers.cgne(A, Ah, b, tol=1e-10, maxiter=800)),
        ("bicgstab", solvers.bicgstab(A, b, tol=1e-10, maxiter=800)),
    ):
        res = A(x)
        rel = np.sqrt(((np.asarray(res.re) - np.asarray(b.re)) ** 2
                       + (np.asarray(res.im) - np.asarray(b.im)) ** 2).sum()
                      / (np.asarray(b.re) ** 2
                         + np.asarray(b.im) ** 2).sum())
        assert rel < 1e-7, (name, rel, int(k))


def test_bicgstab_converges_faster_than_cgne():
    """On the unsquared Wilson operator BiCGStab needs fewer applies than
    CG on the normal equations (each cgne iter costs 2 applies)."""
    lat, m = (4, 4, 2, 2), 0.5
    op = wilson_operator(lat, mass=m, key=4, dtype=jnp.complex128)
    rng = np.random.default_rng(2)
    shape = lat + (4, 3, 1)
    b = cplx.CArray(jnp.asarray(rng.standard_normal(shape)),
                    jnp.asarray(rng.standard_normal(shape)))
    A = lambda v: apply_wilson(op, v)
    Ah = lambda v: apply_wilson_dagger(op, v)
    _, _, k1 = solvers.cgne(A, Ah, b, tol=1e-8, maxiter=800)
    _, _, k2 = solvers.bicgstab(A, b, tol=1e-8, maxiter=800)
    assert 2 * int(k2) < 4 * int(k1)   # loose sanity on apply counts


def test_power_iteration():
    lat, nc = (4, 4), 4
    op = coarse_operator(lat, block_size=nc, mass=1.0, key=5,
                         dtype=jnp.complex128)
    rng = np.random.default_rng(3)
    x0 = cplx.CArray(jnp.asarray(rng.standard_normal(lat + (nc, 1))),
                     jnp.asarray(rng.standard_normal(lat + (nc, 1))))
    lam, v = solvers.power_iteration(lambda u: apply_coarse(op, u), x0,
                                     iters=200)
    # oracle: dense eigenvalues
    from test_models import materialize

    D = materialize(lambda u: apply_coarse(op, u), lat, (nc,))
    w = np.linalg.eigvalsh(D)
    assert abs(float(lam) - w[-1]) / abs(w[-1]) < 1e-3


def test_lanczos_extreme_ritz_values():
    from superbblas_tpu.models.coarse import coarse_operator

    lat, nc = (4, 4), 4
    op = coarse_operator(lat, block_size=nc, mass=6.0, key=5,
                         dtype=jnp.complex128)
    rng = np.random.default_rng(4)
    x0 = cplx.CArray(jnp.asarray(rng.standard_normal(lat + (nc, 1))),
                     jnp.asarray(rng.standard_normal(lat + (nc, 1))))
    al, be = solvers.lanczos(lambda u: apply_coarse(op, u), x0, m=40)
    lmin, lmax = solvers.ritz_extremes(al, be)

    from test_models import materialize

    D = materialize(lambda u: apply_coarse(op, u), lat, (nc,))
    w = np.linalg.eigvalsh(D)
    assert abs(lmax - w[-1]) / abs(w[-1]) < 1e-6
    assert abs(lmin - w[0]) / abs(w[-1]) < 1e-3


def test_refined_solve_recovers_f64_accuracy():
    """Outer f64 refinement over an inner f32 CG reaches ~f64 residual."""
    from superbblas_tpu.models.coarse import coarse_operator

    lat, nc = (4, 4), 4
    op64 = coarse_operator(lat, block_size=nc, mass=8.0, key=2,
                           dtype=jnp.complex128)
    rng = np.random.default_rng(5)
    b = cplx.CArray(jnp.asarray(rng.standard_normal(lat + (nc, 1))),
                    jnp.asarray(rng.standard_normal(lat + (nc, 1))))
    A64 = lambda v: apply_coarse(op64, v)

    to32 = lambda v: cplx.cmap(lambda a: a.astype(jnp.float32), v)
    to64 = lambda v: cplx.cmap(lambda a: a.astype(jnp.float64), v)

    def inner(r):
        x32, _, _ = solvers.cg(lambda v: to32(A64(to64(v))), to32(r),
                               tol=1e-4, maxiter=100)
        return to64(x32)

    x, rs = solvers.refined_solve(A64, inner, b, cycles=4)
    rel = float(jnp.sqrt(rs / solvers._inner_r(b, b)))
    assert rel < 1e-10, rel


def test_lanczos_breakdown_no_spurious_zero():
    """Krylov exhaustion (A = 2I: one-step breakdown) must not inject a
    spurious zero eigenvalue."""
    x0 = cplx.CArray(jnp.ones((4, 4, 3, 1)), jnp.zeros((4, 4, 3, 1)))
    al, be = solvers.lanczos(lambda v: cplx.scale(2.0, v), x0, m=10)
    lmin, lmax = solvers.ritz_extremes(al, be)
    assert abs(lmin - 2.0) < 1e-10 and abs(lmax - 2.0) < 1e-10


def test_refined_solve_bf16_inner_reaches_f32_accuracy():
    """The complete bf16 speed-mode story: an INNER CG running entirely
    on the bf16-stored operator (the 1.4-1.5x kernels), wrapped in f32
    iterative refinement, reaches the accuracy of a plain f32 solve —
    the standard lattice-QCD production scheme (refined_solve docstring;
    bsr.h:2353-class consumers)."""
    import jax.numpy as jnp

    from superbblas_tpu import cplx
    from superbblas_tpu.bsr import bsr_cast_storage
    from superbblas_tpu.models import wilson_operator
    from superbblas_tpu.models.wilson import (adjoint_operator,
                                              apply_wilson)
    from superbblas_tpu.solvers import cg, refined_solve

    lat = (4, 4, 8, 128)
    op = wilson_operator(lat, mass=0.3, key=0, dtype=jnp.complex64,
                         layout="soa")
    op16 = bsr_cast_storage(op, jnp.bfloat16)
    oph = adjoint_operator(op)
    oph16 = bsr_cast_storage(oph, jnp.bfloat16)

    def A32(v):
        return apply_wilson(oph, apply_wilson(op, v))

    def A16(v):
        v16 = cplx.CArray(v.re.astype(jnp.bfloat16),
                          v.im.astype(jnp.bfloat16))
        y = apply_wilson(oph16, apply_wilson(op16, v16))
        return cplx.CArray(y.re.astype(jnp.float32),
                           y.im.astype(jnp.float32))

    rng = np.random.default_rng(3)
    shape = (1, 12) + lat
    b = cplx.CArray(jnp.asarray(rng.standard_normal(shape), jnp.float32),
                    jnp.asarray(rng.standard_normal(shape), jnp.float32))

    def inner(r):
        x, _, _ = cg(A16, r, tol=1e-2, maxiter=40)
        return x

    x_ref, rs_ref, _ = cg(A32, b, tol=1e-5, maxiter=200)
    x_mix, rs_mix = refined_solve(A32, inner, b, cycles=4)
    bnorm = float(jnp.sum(b.re ** 2 + b.im ** 2))
    rel_mix = float(rs_mix) / bnorm
    rel_ref = float(rs_ref) / bnorm
    # the bf16-inner refined solve must land in the same residual decade
    assert rel_mix < max(rel_ref * 10, 1e-8), (rel_mix, rel_ref)


def test_cg_multi_rhs_matches_per_column():
    """cols=True solves independent right-hand sides simultaneously with
    per-column step sizes: each column must match its own single-RHS
    solve (the multi-RHS batched deployment mode of lattice solvers; one
    batched apply serves N solves — the xgemm_batch_strided regime the
    reference's consumers drive, blas.h:662-812)."""
    lat, nc, N = (4, 4), 6, 3
    op = coarse_operator(lat, block_size=nc, mass=8.0, key=2,
                         dtype=jnp.complex128)
    rng = np.random.default_rng(7)
    b = cplx.CArray(jnp.asarray(rng.standard_normal(lat + (nc, N))),
                    jnp.asarray(rng.standard_normal(lat + (nc, N))))
    A = lambda v: apply_coarse(op, v)
    xm, rs, k = solvers.cg(A, b, tol=1e-10, maxiter=500, cols=True)
    assert np.asarray(rs).shape == (N,)
    for j in range(N):
        bj = cplx.cmap(lambda a: a[..., j:j + 1], b)
        xj, _, _ = solvers.cg(A, bj, tol=1e-10, maxiter=500)
        d = float(jnp.max(jnp.abs(xm.re[..., j] - xj.re[..., 0]))
                  + jnp.max(jnp.abs(xm.im[..., j] - xj.im[..., 0])))
        assert d < 1e-7, (j, d)


def test_pcg_multi_rhs_vcycle():
    """Multi-RHS pcg through the (column-batched) two-grid cycle: all
    columns converge in essentially the single-RHS iteration count, and
    the answers match plain CG (the multi-RHS multigrid mode — every
    V-cycle smooths and coarse-solves N columns in one batched apply)."""
    from superbblas_tpu.models.multigrid import (
        _A_normal, build_prolongator, coarse_matrix,
        symmetric_two_grid_preconditioner)

    lat, N = (4, 4, 4, 4), 3
    op = wilson_operator(lat, mass=-1.8, key=3, dtype=jnp.complex128)
    A = lambda u: _A_normal(op, u)
    rng = np.random.default_rng(11)
    b = cplx.CArray(jnp.asarray(rng.standard_normal(lat + (4, 3, N))),
                    jnp.asarray(rng.standard_normal(lat + (4, 3, N))))
    P = build_prolongator(op, K=4, setup_iters=8)
    Ac = coarse_matrix(op, P)
    M = symmetric_two_grid_preconditioner(op, P, Ac, cheby_degree=4)
    xp, rsp, itp = solvers.pcg(A, M, b, tol=1e-8, maxiter=600, cols=True)
    xc, _, itc = solvers.cg(A, b, tol=1e-8, maxiter=6000, cols=True)
    err = float(jnp.max(jnp.abs(xp.re - xc.re))
                + jnp.max(jnp.abs(xp.im - xc.im)))
    assert err < 1e-4, err
    assert int(itp) * 4 < int(itc), (int(itp), int(itc))
