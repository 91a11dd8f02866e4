"""Experiment: SoA (structure-of-arrays) Wilson matvec — lattice minor.

Layout: x [S, C, n, X, Y, Z, T], blocks [dir, i, j, X, Y, Z, T] with
(Z, T) = (16, 128): f32 tiles (8, 128) are fully utilized and all the
per-site small contractions become broadcast-multiply-add over the
lattice lanes (pure VPU, zero padding).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from superbblas_tpu import cplx

LAT = (8, 8, 16, 128)
NCOLS = 8
NS, NC = 4, 3
NDIR = 9

VOL = int(np.prod(LAT))


def offsets4():
    offs = [(0, 0, 0, 0)]
    for ax in range(4):
        for sgn in (1, -1):
            o = [0, 0, 0, 0]
            o[ax] = sgn
            offs.append(tuple(o))
    return offs


OFFS = offsets4()

k = jax.random.PRNGKey(0)


def crand(shape, kk):
    return cplx.CArray(
        jax.random.normal(kk, shape, jnp.float32),
        jax.random.normal(jax.random.fold_in(kk, 99), shape, jnp.float32),
    )


x = crand((NS, NC, NCOLS) + LAT, k)
blocks = crand((NDIR, NC, NC) + LAT, jax.random.fold_in(k, 1))
kron_np = (np.random.default_rng(0).standard_normal((NDIR, NS, NS)) +
           1j * np.random.default_rng(1).standard_normal((NDIR, NS, NS)))

flops = 8 * VOL * NDIR * NCOLS * (NC * NC * NS + NS * NS * NC)
memops = (blocks.re.size + x.re.size * 2) * 2 * 4
print(f"flops = {flops/1e9:.2f} GF  bytes = {memops/1e6:.0f} MB  "
      f"AI = {flops/memops:.1f}")


def roll_lat(v, off):
    def r(a):
        for ax, o in enumerate(off):
            if o:
                a = jnp.roll(a, -o, axis=ax - 4)
        return a
    return cplx.cmap(r, v)


def cmul_acc(acc, a, b):
    """acc += a * b elementwise, complex split, 4-mult."""
    re = a.re * b.re - a.im * b.im
    im = a.re * b.im + a.im * b.re
    if acc is None:
        return cplx.CArray(re, im)
    return cplx.CArray(acc.re + re, acc.im + im)


def wilson_soa(xv):
    y = None
    for d, off in enumerate(OFFS):
        xs = roll_lat(xv, off)   # [S, C, n, *lat]
        # color: t[i, s, n, L] = sum_j A_d[i, j, L] xs[s, j, n, L]
        t = None
        for i in range(NC):
            pass
        # vectorized: A [1, i, j, 1, L...] * xs[s, 1, j, n, L...]? do
        # explicit loops over the tiny dims (unrolled python) to keep
        # every op a full-tile elementwise FMA
        trows = []
        for i in range(NC):
            acc = None
            for j in range(NC):
                a_ij = cplx.CArray(blocks.re[d, i, j], blocks.im[d, i, j])
                xs_j = cplx.CArray(xs.re[:, j], xs.im[:, j])  # [S, n, L]
                acc = cmul_acc(acc, a_ij, xs_j)
            trows.append(acc)       # [S, n, *lat]
        # spin: y[s', i, n, L] += sum_s kron[d, s', s] t_i[s, n, L]
        for i in range(NC):
            t_i = trows[i]
            for sp in range(NS):
                acc = None
                for s in range(NS):
                    kv = kron_np[d, sp, s]
                    term = cplx.CArray(
                        kv.real * t_i.re[s] - kv.imag * t_i.im[s],
                        kv.real * t_i.im[s] + kv.imag * t_i.re[s],
                    )
                    acc = term if acc is None else cplx.CArray(
                        acc.re + term.re, acc.im + term.im)
                if y is None:
                    y = [[None] * NC for _ in range(NS)]
                cur = y[sp][i]
                y[sp][i] = acc if cur is None else cplx.CArray(
                    cur.re + acc.re, cur.im + acc.im)
    out_re = jnp.stack([jnp.stack([y[s][i].re for i in range(NC)])
                        for s in range(NS)])
    out_im = jnp.stack([jnp.stack([y[s][i].im for i in range(NC)])
                        for s in range(NS)])
    return cplx.CArray(out_re, out_im)


def time_fn(fn, xv, n1=3, n2=12):
    res = {}
    for n in (n1, n2):
        def chained(v, n=n):
            def body(c, _):
                return fn(c), ()
            c, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.sum(jnp.abs(c.re))
        j = jax.jit(chained)
        float(j(xv))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(j(xv))
            best = min(best, time.perf_counter() - t0)
        res[n] = best
    return (res[n2] - res[n1]) / (n2 - n1)


dt = time_fn(wilson_soa, x)
print(f"SoA unrolled: {dt*1e3:.2f} ms -> {flops/dt/1e12:.2f} TF/s, "
      f"{memops/dt/1e9:.0f} GB/s")


def wilson_soa_einsum(xv):
    """same layout, but let XLA handle the tiny contractions via einsum"""
    y = None
    for d, off in enumerate(OFFS):
        xs = roll_lat(xv, off)
        blk = cplx.CArray(blocks.re[d], blocks.im[d])   # [i, j, L]
        t = cplx.cbilinear(
            lambda A, X: jnp.einsum("ij...,sjn...->sin...", A, X), blk, xs)
        kr = cplx.from_complex(kron_np[d])
        yk = cplx.cbilinear(
            lambda K, T: jnp.einsum("ab,bin...->ain...", K, T), kr, t)
        y = yk if y is None else cplx.add(y, yk)
    return y


dt = time_fn(wilson_soa_einsum, x)
print(f"SoA einsum: {dt*1e3:.2f} ms -> {flops/dt/1e12:.2f} TF/s, "
      f"{memops/dt/1e9:.0f} GB/s")
