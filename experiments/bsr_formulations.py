"""Experiment: Wilson/BSR matvec formulations on the real TPU chip.

Variants:
  A. current: per-direction dot_general (color) + einsum (spin)
  B. VPU broadcast-multiply-reduce for the color contraction
  C. direction-concatenated single dot_general (K = ndir*3)
  D. spin-first: apply kron factors to x per direction, then one
     direction-concatenated color GEMM
  E. fully materialized 12x12 blocks, one dot_general (non-kron path)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from superbblas_tpu import cplx
from superbblas_tpu.models import wilson_operator

LAT = (8, 8, 8, 16)
NCOLS = 16
NS, NC = 4, 3


def time_fn(fn, x, n1=5, n2=20):
    res = {}
    for n in (n1, n2):
        def chained(xv, n=n):
            def body(c, _):
                return fn(c), ()
            c, _ = jax.lax.scan(body, xv, None, length=n)
            return jnp.sum(jnp.abs(c.re)) + jnp.sum(jnp.abs(c.im))
        j = jax.jit(chained)
        float(j(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(j(x))
            best = min(best, time.perf_counter() - t0)
        res[n] = best
    return (res[n2] - res[n1]) / (n2 - n1)


op = wilson_operator(LAT, mass=0.1, key=0, dtype=jnp.complex64)
flops = op.flops_per_matvec(NCOLS, complex_dtype=True)
memops = op.memops_per_matvec(NCOLS, itemsize=8)
print(f"flops/matvec = {flops/1e9:.2f} GF, bytes = {memops/1e6:.1f} MB, "
      f"AI = {flops/memops:.1f}")

k = jax.random.PRNGKey(1)
shape = LAT + (NS, NC, NCOLS)
x = cplx.CArray(
    jax.random.normal(k, shape, jnp.float32),
    jax.random.normal(jax.random.fold_in(k, 1), shape, jnp.float32),
)

nlat = 4
# canonical x: [*lat, KD=4, BD=3, N=16]
xc = x  # already [*lat, S, C, n]

blocks = op.blocks   # CArray [*lat, 9, 3, 3]
kron = op.kron       # CArray [9, 4, 4]
offsets = op.offsets


def roll(v, off):
    return cplx.cmap(
        lambda a: a if all(o % s == 0 for o, s in zip(off, a.shape[:4]))
        else jnp.roll(a, [-o for o in off], axis=(0, 1, 2, 3)), v)


def variant_A(xv):
    """current kron path"""
    ys = None
    for kd, off in enumerate(offsets):
        xs = roll(xv, off)
        blk = cplx.cmap(lambda a: a[:, :, :, :, kd], blocks)
        t = cplx.cdot_general(
            blk, xs,
            dimension_numbers=(((5,), (5,)), ((0, 1, 2, 3), (0, 1, 2, 3))),
            preferred_element_type=jnp.float32,
        )  # [*lat, CI, KD, N]
        yk = cplx.cbilinear(
            lambda kk, tt: jnp.einsum("ab,...ibn->...ian", kk, tt),
            cplx.cmap(lambda a: a[kd], kron), t)
        ys = yk if ys is None else cplx.add(ys, yk)
    return cplx.cmap(lambda a: jnp.swapaxes(a, 4, 5), ys)


def variant_B(xv):
    """VPU: broadcast-mul-sum for color, einsum spin"""
    ys = None
    for kd, off in enumerate(offsets):
        xs = roll(xv, off)              # [*lat, S, C, n]
        blk = cplx.cmap(lambda a: a[:, :, :, :, kd], blocks)  # [*lat, 3, 3]

        def colmul(b, xx):
            # y[..., i, s, n] = sum_j b[..., i, j] x[..., s, j, n]
            return (b[..., :, None, :, None] *
                    xx[..., None, :, :, :]).sum(-2)
        t = cplx.cbilinear(colmul, blk, xs)   # [*lat, CI, S, N] hmm
        yk = cplx.cbilinear(
            lambda kk, tt: jnp.einsum("ab,...ibn->...ian", kk,
                                      jnp.swapaxes(tt, 4, 5)),
            cplx.cmap(lambda a: a[kd], kron),
            cplx.cmap(lambda a: jnp.swapaxes(a, 4, 5), t))
        ys = yk if ys is None else cplx.add(ys, yk)
    return ys


def variant_D(xv):
    """spin-first + direction-concat color GEMM"""
    # xs_d = kron_d @ x (spin), shifted
    xs_list = []
    for kd, off in enumerate(offsets):
        xk = cplx.cbilinear(
            lambda kk, xx: jnp.einsum("ab,...bcn->...acn", kk, xx),
            cplx.cmap(lambda a: a[kd], kron), xv)      # [*lat, S, C, n]
        xs_list.append(roll(xk, off))
    # X_cat [*lat, (d C)=27, S*n]
    xcat = cplx.CArray(
        jnp.stack([v.re for v in xs_list], 4),
        jnp.stack([v.im for v in xs_list], 4),
    )  # [*lat, 9, S, C, n]
    xcat = cplx.cmap(
        lambda a: jnp.transpose(a, (0, 1, 2, 3, 4, 6, 5, 7)).reshape(
            LAT + (9 * NC, NS * NCOLS)), xcat)
    acat = cplx.cmap(
        lambda a: jnp.transpose(a, (0, 1, 2, 3, 5, 4, 6)).reshape(
            LAT + (NC, 9 * NC)), blocks)
    y = cplx.cdot_general(
        acat, xcat,
        dimension_numbers=(((5,), (4,)), ((0, 1, 2, 3), (0, 1, 2, 3))),
        preferred_element_type=jnp.float32,
    )  # [*lat, CI, S*n]
    return cplx.cmap(
        lambda a: jnp.swapaxes(a.reshape(LAT + (NC, NS, NCOLS)), 4, 5), y)


def variant_E_make():
    """materialized 12x12 blocks"""
    mats = cplx.cbilinear(
        lambda kk, cc: jnp.einsum("kab,...kcd->...kacbd", kk, cc),
        kron, blocks)
    mats = cplx.cmap(lambda a: a.reshape(LAT + (9, 12, 12)), mats)

    def f(xv):
        xf = cplx.cmap(lambda a: a.reshape(LAT + (12, NCOLS)), xv)
        xs = cplx.CArray(
            jnp.stack([roll(xf, off).re for off in offsets], 4),
            jnp.stack([roll(xf, off).im for off in offsets], 4),
        )  # [*lat, 9, 12, n]
        y = cplx.cdot_general(
            mats, xs,
            dimension_numbers=(((4, 6), (4, 5)), ((0, 1, 2, 3), (0, 1, 2, 3))),
            preferred_element_type=jnp.float32,
        )  # [*lat, 12, n]
        return cplx.cmap(lambda a: a.reshape(LAT + (NS, NC, NCOLS)), y)
    return f


for name, fn in [("A_current", variant_A), ("B_vpu", variant_B),
                 ("D_spinfirst_cat", variant_D),
                 ("E_materialized", variant_E_make())]:
    try:
        dt = time_fn(fn, xc)
        print(f"{name}: {dt*1e3:.2f} ms -> {flops/dt/1e12:.2f} TF/s, "
              f"{memops/dt/1e9:.0f} GB/s-equiv")
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:120]}")
