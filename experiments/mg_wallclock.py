"""Multigrid WALL-CLOCK benchmark (round-3 VERDICT item 3).

Round 2 proved the Chebyshev-smoothed two-grid cycle cuts pcg
ITERATIONS 6-8x on near-critical operators but recorded no end-to-end
seconds.  This experiment times the full solve on real hardware:

    plain CG        on A = D^H D      (the baseline every QCD stack runs)
    V(1,1)-pcg      symmetric two-grid, Chebyshev(d) smoother

both as ONE jitted lax.while_loop (no per-iteration dispatch), multi-RHS
(``cols=True``: N right-hand sides per solve — the production deployment
mode; the coarse cho_solve and every smoother apply batch over columns,
the xgemm_batch_strided regime of blas.h:662-812).

Setup (prolongator + Galerkin + Cholesky) is timed separately: it is
amortized over the many solves of an HMC trajectory / analysis campaign.

Usage:  python experiments/mg_wallclock.py [--cpu] [--lat 8 8 8 8]
            [--mass -0.58] [--ncols 8] [--tol 1e-5] [--cheby 4]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--lat", type=int, nargs=4, default=[8, 8, 8, 8])
p.add_argument("--mass", type=float, default=-0.58)
p.add_argument("--ncols", type=int, default=8)
p.add_argument("--tol", type=float, default=1e-5)
p.add_argument("--cheby", type=int, default=4)
p.add_argument("--theta", type=float, default=30.0)
p.add_argument("--K", type=int, default=8)
p.add_argument("--maxiter", type=int, default=20000)
p.add_argument("--layout", default="aos", choices=["aos", "soa"])
args = p.parse_args()

if args.cpu:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/sbt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from superbblas_tpu import cplx
from superbblas_tpu.models import wilson_operator
from superbblas_tpu.models.multigrid import (
    _A_normal, build_prolongator, coarse_matrix,
    symmetric_two_grid_preconditioner)
from superbblas_tpu.solvers import cg, pcg

lat = tuple(args.lat)
dt = jnp.complex64 if not args.cpu else jnp.complex128
op = wilson_operator(lat, mass=args.mass, key=3, dtype=dt,
                     layout=args.layout)
A = lambda u: _A_normal(op, u)
rng = np.random.default_rng(11)
shape = lat + (4, 3, args.ncols)
fdt = jnp.float32 if not args.cpu else jnp.float64
b = cplx.CArray(jnp.asarray(rng.standard_normal(shape), fdt),
                jnp.asarray(rng.standard_normal(shape), fdt))

print(f"lat={lat} mass={args.mass} ncols={args.ncols} tol={args.tol} "
      f"cheby_d={args.cheby} K={args.K} layout={args.layout} "
      f"platform={jax.devices()[0].platform}", flush=True)

# ---- setup (amortized) ----
t0 = time.perf_counter()
P = build_prolongator(op, K=args.K, setup_iters=8)
Ac = coarse_matrix(op, P)
M = symmetric_two_grid_preconditioner(op, P, Ac, cheby_degree=args.cheby,
                                      cheby_theta=args.theta)
jax.block_until_ready(Ac.re)
t_setup = time.perf_counter() - t0
print(f"setup: {t_setup:.1f}s (prolongator K={args.K} + Galerkin "
      f"M={Ac.shape[0]} + Cholesky)", flush=True)


def timed(fn, *a, **kw):
    jitted = jax.jit(lambda bb: fn(*a, bb, **kw))
    r = jitted(b)                      # compile + first run
    jax.block_until_ready(r[0].re)
    t0 = time.perf_counter()
    r = jitted(b)
    jax.block_until_ready(r[0].re)
    return r, time.perf_counter() - t0


(xc, rsc, itc), t_cg = timed(lambda bb: cg(A, bb, tol=args.tol,
                                           maxiter=args.maxiter, cols=True))
rel_c = float(jnp.max(jnp.sqrt(np.asarray(rsc)))
              / jnp.sqrt(jnp.sum(b.re**2 + b.im**2) / args.ncols))
print(f"plain CG : {int(itc):5d} iters  {t_cg:8.2f}s   "
      f"max|r| ratio {rel_c:.2e}", flush=True)

(xp, rsp, itp), t_mg = timed(lambda bb: pcg(A, M, bb, tol=args.tol,
                                            maxiter=args.maxiter, cols=True))
err = float(jnp.max(jnp.abs(xp.re - xc.re)) + jnp.max(jnp.abs(xp.im - xc.im)))
print(f"MG  pcg  : {int(itp):5d} iters  {t_mg:8.2f}s   "
      f"vs CG err {err:.2e}", flush=True)

print(json.dumps({
    "lat": lat, "mass": args.mass, "ncols": args.ncols,
    "cheby": args.cheby, "K": args.K, "tol": args.tol,
    "cg_iters": int(itc), "cg_s": round(t_cg, 3),
    "mg_iters": int(itp), "mg_s": round(t_mg, 3),
    "setup_s": round(t_setup, 2),
    "iter_cut": round(int(itc) / max(int(itp), 1), 2),
    "wallclock_speedup": round(t_cg / t_mg, 3)}), flush=True)
