"""Adaptive multigrid setup refinement experiment (round-2, VERDICT #7).

Goal: >=3x iteration reduction vs plain CG on the 4^4 near-critical demo
(mass=-1.8, fully random links) with the symmetric V(1,1) pcg.

Tried here: alpha-SA-style adaptive refinement — evolve the near-null
candidates through the CURRENT cycle's error propagator (I - M A)^nu;
what survives is exactly the subspace the method misses; rebuild P from
it.  Compared against the plain Richardson setup at equal K.
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
    _A_normal, _aggregate, _blk_shape, build_prolongator, coarse_matrix,
    symmetric_two_grid_preconditioner)
from superbblas_tpu.solvers import cg, pcg, power_iteration

lat = (4, 4, 4, 4)
mass = -1.8
op = wilson_operator(lat, mass=mass, key=3, dtype=jnp.complex128)
A = lambda u: _A_normal(op, u)
rng = np.random.default_rng(11)
b = cplx.CArray(jnp.asarray(rng.standard_normal(lat + (4, 3))),
                jnp.asarray(rng.standard_normal(lat + (4, 3))))

t0 = time.time()
x_ref, _, it0 = cg(A, b, tol=1e-7, maxiter=6000)
print(f"plain CG: {int(it0)} iters ({time.time()-t0:.1f}s)", flush=True)


def qr_basis(v, block=(2, 2, 2, 2)):
    agg = _aggregate(v, block, n_blk=2)
    a_np = np.asarray(agg.re) + 1j * np.asarray(agg.im)
    q, _ = np.linalg.qr(a_np.reshape(-1, a_np.shape[-2], a_np.shape[-1]))
    q = q.reshape(a_np.shape[:4] + q.shape[-2:])
    return cplx.CArray(jnp.asarray(q.real), jnp.asarray(q.imag))


def try_pcg(P, label):
    A_c = coarse_matrix(op, P)
    M = symmetric_two_grid_preconditioner(op, P, A_c)
    t0 = time.time()
    xp, _, itp = pcg(A, M, b, tol=1e-7, maxiter=6000)
    err = float(jnp.sum((xp.re - x_ref.re) ** 2 + (xp.im - x_ref.im) ** 2)
                / jnp.sum(x_ref.re ** 2 + x_ref.im ** 2))
    print(f"{label}: {int(itp)} iters, rel err {err:.2e}, "
          f"speedup {int(it0)/int(itp):.2f}x ({time.time()-t0:.1f}s)",
          flush=True)
    return itp, M


for K, si in ((8, 30), (12, 30)):
    P = build_prolongator(op, K=K, setup_iters=si)
    try_pcg(P, f"plain setup K={K} si={si}")

# adaptive refinement
for K in (8, 12):
    P = build_prolongator(op, K=K, setup_iters=30)
    itp, M = try_pcg(P, f"refine round 0 K={K}")
    for rnd in (1, 2):
        # evolve candidates through the error propagator of the CURRENT
        # method: v <- (I - M A)^nu v from fresh random starts (the
        # preconditioner handles one field at a time)
        r2 = np.random.default_rng(100 + rnd)
        cols = []
        for k in range(K):
            shape = lat + (4, 3)
            v = cplx.CArray(jnp.asarray(r2.standard_normal(shape)),
                            jnp.asarray(r2.standard_normal(shape)))
            for _ in range(4):
                mv = M(A(v))
                v = cplx.CArray(v.re - mv.re, v.im - mv.im)
            nrm = float(jnp.sqrt(jnp.sum(v.re ** 2 + v.im ** 2)))
            cols.append(cplx.CArray(v.re / nrm, v.im / nrm))
        v = cplx.CArray(jnp.stack([c.re for c in cols], axis=-1),
                        jnp.stack([c.im for c in cols], axis=-1))
        P = qr_basis(v)
        itp, M = try_pcg(P, f"refine round {rnd} K={K}")
