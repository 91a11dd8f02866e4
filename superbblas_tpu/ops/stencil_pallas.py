"""Pallas TPU kernel for nearest-neighbor block stencils (Wilson-type).

This is the hot kernel of the framework: the BSR lattice-operator matvec
(reference: the SpMM backends of bsr.h:281-1190 and the kron variant
bsr.h:398-451).  The XLA lowering of the per-site small GEMMs (3x3 color
blocks, 4x4 spin factors) pads every operand to MXU tiles and runs ~1000x
below roofline; the TPU-native answer is a **structure-of-arrays layout**:

    x       [n, KD*BD, X, Y, Z, T]      (lattice minor: Z in sublanes,
    blocks  [ndir, BI*BD, X, Y, Z, T]    T in lanes -> zero padding)
    kron    [ndir, KI, KD]               (SMEM scalars)
    y       [n, KI*BI, X, Y, Z, T]

Every per-site contraction then becomes a broadcast multiply-add over
full (Z, T) = (8k, 128) vector tiles — pure VPU work with unit stride.

Kernel structure: grid over (X, Y/Yc, n/nc); each program holds the
center x block plus the x+-1 planes and y+-1 boundary rows (five
BlockSpecs over the same array — the halo exchange of the reference's
ext_power partitions, dist.h:3477-3509, resolved at tile granularity);
Z/T neighbor shifts are in-register lane/sublane rotates since those axes
are kept whole inside the block.  Per direction the kernel applies the
spin (kron) rotation first (ki*kd scalar combinations) and then the color
block multiply — the 3-then-2 contraction order that minimizes VPU work,
mirroring the flop saving of the reference's kron path.

Complex arithmetic is split (re, im) throughout: 4 real multiplies per
complex multiply on the VPU.

Mixed precision: operands may be stored bf16 (HBM capacity: 2x bigger
lattices); loads are converted and all arithmetic accumulates in f32.
Measured on v5e the bf16 path is ~25% SLOWER than f32 (conversion ops
dominate; native bf16 arithmetic is blocked by Mosaic's 32-bit-only
vector rotate), so it is a capacity option, not a speed one, on the
current toolchain.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import cplx
from ..labels import volume

__all__ = ["stencil_matvec_soa", "stencil_matvec_soa_reference",
           "soa_eligible", "aos_to_soa", "soa_to_aos"]


def _axis_of(off) -> Tuple[int, int]:
    """(axis, sign) of a one-hot +-1 offset; (-1, 0) for the center."""
    nz = [(ax, o) for ax, o in enumerate(off) if o != 0]
    if not nz:
        return -1, 0
    if len(nz) != 1 or abs(nz[0][1]) != 1:
        raise ValueError(f"stencil kernel requires one-hot +-1 offsets, got {off}")
    return nz[0]


def soa_eligible(offsets, dim_lat, bi, bd, ki, kd) -> bool:
    """Whether the Pallas SoA kernel supports this stencil."""
    if len(dim_lat) != 4:
        return False
    try:
        for off in offsets:
            _axis_of(off)
    except ValueError:
        return False
    X, Y, Z, T = dim_lat
    if T % 128 != 0 or Z % 8 != 0:
        return False
    if volume((bi, bd, ki, kd)) > 16 * 16:
        return False
    return True


def _kernel(kron_re, kron_im,        # SMEM [ndir, KI, KD]
            b_re, b_im,              # [ndir, BI*BD, 1, Yc, Z, T]
            xc_re, xc_im,            # [nc, F, 1, Yc, Z, T]
            xp_re, xp_im,
            xm_re, xm_im,
            yp_re, yp_im,            # [nc, F, 1, 1, Z, T]
            ym_re, ym_im,
            o_re, o_im,              # out [nc, KO, 1, Yc, Z, T]
            *, offsets, BI, BD, KI, KD, Yc, Z, T, nc):

    def full(ref):
        # loads cast to f32: operands may be stored bf16 (mixed-precision
        # inner solves halve HBM traffic); accumulation is always f32
        return ref[:, :, 0].astype(jnp.float32)   # [nc, F, Yc, Z, T]

    out_dt = o_re.dtype
    xc = (full(xc_re), full(xc_im))

    def shifted(d):
        """The x block shifted for direction d: [nc, F, Yc, Z, T] pair."""
        ax, sgn = _axis_of(offsets[d])
        if ax == -1:
            return xc
        if ax == 0:
            src = (full(xp_re), full(xp_im)) if sgn > 0 else \
                  (full(xm_re), full(xm_im))
            return src
        if ax == 1:
            if Yc == 1:
                src = (yp_re, yp_im) if sgn > 0 else (ym_re, ym_im)
                return (src[0][:, :, 0].astype(jnp.float32),
                        src[1][:, :, 0].astype(jnp.float32))
            if sgn > 0:
                # rows 1..Yc-1 of center + the y+ boundary row
                def cat(c, b):
                    return jnp.concatenate(
                        [c[:, :, 1:], b[:, :, 0].astype(jnp.float32)], axis=2)
                return (cat(xc[0], yp_re), cat(xc[1], yp_im))
            def cat(c, b):
                return jnp.concatenate(
                    [b[:, :, 0].astype(jnp.float32), c[:, :, :Yc - 1]], axis=2)
            return (cat(xc[0], ym_re), cat(xc[1], ym_im))
        if ax == 2:
            sh = (Z - 1) if sgn > 0 else 1
            return (pltpu.roll(xc[0], sh, 3), pltpu.roll(xc[1], sh, 3))
        sh = (T - 1) if sgn > 0 else 1
        return (pltpu.roll(xc[0], sh, 4), pltpu.roll(xc[1], sh, 4))

    ndir = len(offsets)
    acc = [[None] * BI for _ in range(KI)]
    for d in range(ndir):
        xs_re, xs_im = shifted(d)
        # spin rotation first: z[sp, j] = sum_s K[d, sp, s] x[s, j]
        for sp in range(KI):
            zrows = []
            for j in range(BD):
                zre = zim = None
                for s in range(KD):
                    kr = kron_re[d, sp, s]
                    ki_ = kron_im[d, sp, s]
                    f = s * BD + j
                    xr = xs_re[:, f]
                    xi = xs_im[:, f]
                    tre = kr * xr - ki_ * xi
                    tim = kr * xi + ki_ * xr
                    zre = tre if zre is None else zre + tre
                    zim = tim if zim is None else zim + tim
                zrows.append((zre, zim))
            # color multiply: y[sp, i] += sum_j A[d, i, j] z[sp, j]
            for i in range(BI):
                for j in range(BD):
                    br = b_re[d, i * BD + j, 0].astype(jnp.float32)
                    bi_ = b_im[d, i * BD + j, 0].astype(jnp.float32)
                    zre, zim = zrows[j]
                    tre = zre * br - zim * bi_
                    tim = zre * bi_ + zim * br
                    if acc[sp][i] is None:
                        acc[sp][i] = (tre, tim)
                    else:
                        a0, a1 = acc[sp][i]
                        acc[sp][i] = (a0 + tre, a1 + tim)

    for sp in range(KI):
        for i in range(BI):
            o_re[:, sp * BI + i, 0] = acc[sp][i][0].astype(out_dt)
            o_im[:, sp * BI + i, 0] = acc[sp][i][1].astype(out_dt)


def _pick_chunks(n, Y, F, KO, BI, BD, Z, T, ndir, vmem_budget=10 * 2 ** 20,
                 itemsize=4):
    """Choose (nc, Yc) fitting the VMEM budget (with double buffering)."""
    def bytes_for(nc, Yc):
        site = Z * T * itemsize
        x = (3 * Yc + 2) * F * nc * site * 2          # 5 specs, re+im
        blk = ndir * BI * BD * Yc * site * 2
        y = KO * nc * Yc * site * 2
        return (x + blk) * 2 + y * 2                   # double buffering

    for Yc in [y for y in (4, 2, 1) if Y % y == 0]:
        for nc in [c for c in (8, 4, 2, 1) if n % c == 0]:
            if bytes_for(nc, Yc) <= vmem_budget:
                return nc, Yc
    return 1, 1


def stencil_matvec_soa(
    blocks: cplx.CArray,            # [ndir, BI*BD, X, Y, Z, T]
    kron: Optional[cplx.CArray],    # [ndir, KI, KD] or None
    x: cplx.CArray,                 # [n, KD*BD, X, Y, Z, T]
    offsets: Sequence[Tuple[int, ...]],
    bi: int, bd: int,
    interpret: bool = False,
) -> cplx.CArray:
    """y[n, KI*BI, X, Y, Z, T] = stencil matvec in SoA layout."""
    ndir, FB = blocks.shape[0], blocks.shape[1]
    X, Y, Z, T = blocks.shape[2:]
    n = x.shape[0]
    if kron is None:
        kron = cplx.CArray(jnp.ones((ndir, 1, 1), jnp.float32),
                           jnp.zeros((ndir, 1, 1), jnp.float32))
    # kron scalars live in SMEM and multiply f32-converted operands:
    # always f32 regardless of the (possibly bf16) storage dtype
    kron = cplx.cmap(lambda a: a.astype(jnp.float32), kron)
    KI, KD = kron.shape[1], kron.shape[2]
    F = KD * bd
    KO = KI * bi
    assert FB == bi * bd and x.shape[1] == F

    nc, Yc = _pick_chunks(n, Y, F, KO, bi, bd, Z, T, ndir)
    grid = (X, Y // Yc, n // nc)

    xspec = pl.BlockSpec(
        (nc, F, 1, Yc, Z, T),
        lambda ix, iy, inn: (inn, 0, ix, iy, 0, 0),
    )
    xp = pl.BlockSpec(
        (nc, F, 1, Yc, Z, T),
        lambda ix, iy, inn, X=X: (inn, 0, (ix + 1) % X, iy, 0, 0),
    )
    xm = pl.BlockSpec(
        (nc, F, 1, Yc, Z, T),
        lambda ix, iy, inn, X=X: (inn, 0, (ix - 1) % X, iy, 0, 0),
    )
    yp = pl.BlockSpec(
        (nc, F, 1, 1, Z, T),
        lambda ix, iy, inn, Y=Y, Yc=Yc: (inn, 0, ix, (iy * Yc + Yc) % Y, 0, 0),
    )
    ym = pl.BlockSpec(
        (nc, F, 1, 1, Z, T),
        lambda ix, iy, inn, Y=Y, Yc=Yc: (inn, 0, ix, (iy * Yc - 1) % Y, 0, 0),
    )
    bspec = pl.BlockSpec(
        (ndir, FB, 1, Yc, Z, T),
        lambda ix, iy, inn: (0, 0, ix, iy, 0, 0),
    )
    kspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    ospec = pl.BlockSpec(
        (nc, KO, 1, Yc, Z, T),
        lambda ix, iy, inn: (inn, 0, ix, iy, 0, 0),
    )

    kern = functools.partial(
        _kernel, offsets=tuple(tuple(o) for o in offsets),
        BI=bi, BD=bd, KI=KI, KD=KD, Yc=Yc, Z=Z, T=T, nc=nc,
    )
    flops = 4 * 2 * n * X * Y * Z * T * ndir * (KI * KD * bd + bi * bd)
    o_re, o_im = pl.pallas_call(
        kern,
        grid=grid,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20),
        in_specs=[kspec, kspec, bspec, bspec,
                  xspec, xspec, xp, xp, xm, xm, yp, yp, ym, ym],
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((n, KO, X, Y, Z, T), x.dtype),
            jax.ShapeDtypeStruct((n, KO, X, Y, Z, T), x.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(blocks.size + 2 * x.size) * 2 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(kron.re, kron.im, blocks.re, blocks.im,
      x.re, x.im, x.re, x.im, x.re, x.im, x.re, x.im, x.re, x.im)
    return cplx.CArray(o_re, o_im)


def stencil_matvec_soa_reference(blocks, kron, x, offsets, bi, bd):
    """Pure-XLA reference with the same SoA signature (used for tests and
    as the CPU fallback)."""
    ndir = blocks.shape[0]
    if kron is None:
        kron = cplx.CArray(jnp.ones((ndir, 1, 1), blocks.dtype),
                           jnp.zeros((ndir, 1, 1), blocks.dtype))
    KI, KD = kron.shape[1], kron.shape[2]
    n = x.shape[0]
    lat = x.shape[2:]

    def roll(v, off):
        def r(a):
            for ax, o in enumerate(off):
                if o % lat[ax] != 0:
                    a = jnp.roll(a, -o, axis=3 + ax)   # after (n, KD, bd)
            return a
        return cplx.cmap(r, v)

    y = None
    xs4 = cplx.cmap(lambda a: a.reshape((n, KD, bd) + lat), x)
    for d in range(ndir):
        xd = roll(xs4, offsets[d])
        kr = cplx.CArray(kron.re[d], kron.im[d])
        prec = cplx.default_precision()
        z = cplx.cbilinear(
            lambda K, V: jnp.einsum("ab,nbj...->naj...", K, V,
                                    precision=prec), kr, xd)
        blk = cplx.cmap(lambda a: a[d].reshape((bi, bd) + lat), blocks)
        t = cplx.cbilinear(
            lambda B, V: jnp.einsum("ij...,naj...->nai...", B, V,
                                    precision=prec), blk, z)
        y = t if y is None else cplx.add(y, t)
    return cplx.cmap(lambda a: a.reshape((n, KI * bi) + lat), y)


def aos_to_soa(x: cplx.CArray, nlat: int) -> cplx.CArray:
    """[*lat, KD, BD, n] -> [n, KD*BD, *lat]."""
    def t(a):
        nd = a.ndim
        perm = (nd - 1, nd - 3, nd - 2) + tuple(range(nlat))
        a = jnp.transpose(a, perm)
        return a.reshape((a.shape[0], a.shape[1] * a.shape[2]) + a.shape[3:])
    return cplx.cmap(t, x)


def soa_to_aos(y: cplx.CArray, nlat: int, ki: int, bi: int) -> cplx.CArray:
    """[n, KI*BI, *lat] -> [*lat, KI, BI, n]."""
    def t(a):
        a = a.reshape((a.shape[0], ki, bi) + a.shape[2:])
        perm = tuple(range(3, 3 + nlat)) + (1, 2, 0)
        return jnp.transpose(a, perm)
    return cplx.cmap(t, y)


# ---------------------------------------------------------------------------
# v2 kernel: full X inside the block (X shifts are in-VMEM concats)
# ---------------------------------------------------------------------------
#
# The v1 kernel grids over X and fetches the x-1/x/x+1 planes as three
# BlockSpecs, so x is read ~3x from HBM per matvec.  Keeping the whole X
# axis inside the block turns the X neighbor fetch into a VMEM
# concatenation: HBM x-traffic drops to (1 + 2/Yc)x (only the y-boundary
# rows repeat).
#
# MEASURED (v5e, Wilson 8x8x16x128, 8 rhs): v2 peaks at 3.5 TF/s
# (nc=4, Yc=1) vs v1's 4.6 TF/s in the same harness — the theoretical
# 1.4x traffic saving is eaten by worse Mosaic scheduling of the
# full-X blocks (coarser grid -> weaker DMA/compute pipelining; several
# (nc, Yc) points crash the compiler outright).  v1 therefore remains
# the production path unconditionally; this variant is kept as a
# correct, tested alternative for future re-evaluation on newer
# toolchains.


def _kernel_xin(kron_re, kron_im,      # SMEM [ndir, KI, KD]
                b_re, b_im,            # [ndir, BI*BD, X, Yc, Z, T]
                xc_re, xc_im,          # [nc, F, X, Yc, Z, T]
                yp_re, yp_im,          # [nc, F, X, 1, Z, T]
                ym_re, ym_im,
                o_re, o_im,            # out [nc, KO, X, Yc, Z, T]
                *, offsets, BI, BD, KI, KD, X, Yc, Z, T, nc):

    xc = (xc_re[...], xc_im[...])      # [nc, F, X, Yc, Z, T]

    def shifted(d):
        ax, sgn = _axis_of(offsets[d])
        if ax == -1:
            return xc
        if ax == 0:
            # toroidal within the full in-block X axis
            if sgn > 0:
                cat = lambda c: jnp.concatenate([c[:, :, 1:], c[:, :, :1]],
                                                axis=2)
            else:
                cat = lambda c: jnp.concatenate([c[:, :, -1:], c[:, :, :-1]],
                                                axis=2)
            return (cat(xc[0]), cat(xc[1]))
        if ax == 1:
            if Yc == 1:
                src = (yp_re, yp_im) if sgn > 0 else (ym_re, ym_im)
                return (src[0][...], src[1][...])
            if sgn > 0:
                def cat(c, b):
                    return jnp.concatenate([c[:, :, :, 1:], b], axis=3)
                return (cat(xc[0], yp_re[...]), cat(xc[1], yp_im[...]))
            def cat(c, b):
                return jnp.concatenate([b, c[:, :, :, :Yc - 1]], axis=3)
            return (cat(xc[0], ym_re[...]), cat(xc[1], ym_im[...]))
        if ax == 2:
            sh = (Z - 1) if sgn > 0 else 1
            return (pltpu.roll(xc[0], sh, 4), pltpu.roll(xc[1], sh, 4))
        sh = (T - 1) if sgn > 0 else 1
        return (pltpu.roll(xc[0], sh, 5), pltpu.roll(xc[1], sh, 5))

    ndir = len(offsets)
    acc = [[None] * BI for _ in range(KI)]
    for d in range(ndir):
        xs_re, xs_im = shifted(d)
        for sp in range(KI):
            zrows = []
            for j in range(BD):
                zre = zim = None
                for s in range(KD):
                    kr = kron_re[d, sp, s]
                    ki_ = kron_im[d, sp, s]
                    f = s * BD + j
                    xr = xs_re[:, f]
                    xi = xs_im[:, f]
                    tre = kr * xr - ki_ * xi
                    tim = kr * xi + ki_ * xr
                    zre = tre if zre is None else zre + tre
                    zim = tim if zim is None else zim + tim
                zrows.append((zre, zim))
            for i in range(BI):
                for j in range(BD):
                    br = b_re[d, i * BD + j]      # [X, Yc, Z, T]
                    bi_ = b_im[d, i * BD + j]
                    zre, zim = zrows[j]
                    tre = zre * br - zim * bi_
                    tim = zre * bi_ + zim * br
                    if acc[sp][i] is None:
                        acc[sp][i] = (tre, tim)
                    else:
                        a0, a1 = acc[sp][i]
                        acc[sp][i] = (a0 + tre, a1 + tim)

    for sp in range(KI):
        for i in range(BI):
            o_re[:, sp * BI + i] = acc[sp][i][0]
            o_im[:, sp * BI + i] = acc[sp][i][1]


def _pick_chunks_xin(n, X, Y, F, KO, BI, BD, Z, T, ndir,
                     vmem_budget=64 * 2 ** 20):
    """(nc, Yc) for the X-inside kernel, or None if nothing fits."""
    def bytes_for(nc, Yc):
        site = X * Z * T * 4
        x = (Yc + 2) * F * nc * site * 2
        blk = ndir * BI * BD * Yc * site * 2
        y = KO * nc * Yc * site * 2
        return (x + blk) * 2 + y * 2

    best = None
    for Yc in [y for y in (4, 2, 1) if Y % y == 0]:
        for nc in [c for c in (8, 4, 2, 1) if n % c == 0]:
            if bytes_for(nc, Yc) <= vmem_budget:
                # prefer larger Yc (amortizes y-rows), then larger nc
                if best is None or (Yc, nc) > best:
                    best = (Yc, nc)
    return None if best is None else (best[1], best[0])


def stencil_matvec_soa_xin(
    blocks: cplx.CArray,
    kron: Optional[cplx.CArray],
    x: cplx.CArray,
    offsets: Sequence[Tuple[int, ...]],
    bi: int, bd: int,
    interpret: bool = False,
) -> cplx.CArray:
    """X-inside variant of :func:`stencil_matvec_soa` (same contract)."""
    ndir, FB = blocks.shape[0], blocks.shape[1]
    X, Y, Z, T = blocks.shape[2:]
    n = x.shape[0]
    if kron is None:
        kron = cplx.CArray(jnp.ones((ndir, 1, 1), blocks.dtype),
                           jnp.zeros((ndir, 1, 1), blocks.dtype))
    KI, KD = kron.shape[1], kron.shape[2]
    F = KD * bd
    KO = KI * bi
    assert FB == bi * bd and x.shape[1] == F

    picked = _pick_chunks_xin(n, X, Y, F, KO, bi, bd, Z, T, ndir)
    if picked is None:
        raise ValueError("no (nc, Yc) fits VMEM for the X-inside kernel")
    nc, Yc = picked
    grid = (Y // Yc, n // nc)

    xspec = pl.BlockSpec((nc, F, X, Yc, Z, T),
                         lambda iy, inn: (inn, 0, 0, iy, 0, 0))
    yp = pl.BlockSpec((nc, F, X, 1, Z, T),
                      lambda iy, inn, Y=Y, Yc=Yc: (inn, 0, 0,
                                                   (iy * Yc + Yc) % Y, 0, 0))
    ym = pl.BlockSpec((nc, F, X, 1, Z, T),
                      lambda iy, inn, Y=Y, Yc=Yc: (inn, 0, 0,
                                                   (iy * Yc - 1) % Y, 0, 0))
    bspec = pl.BlockSpec((ndir, FB, X, Yc, Z, T),
                         lambda iy, inn: (0, 0, 0, iy, 0, 0))
    kspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    ospec = pl.BlockSpec((nc, KO, X, Yc, Z, T),
                         lambda iy, inn: (inn, 0, 0, iy, 0, 0))

    kern = functools.partial(
        _kernel_xin, offsets=tuple(tuple(o) for o in offsets),
        BI=bi, BD=bd, KI=KI, KD=KD, X=X, Yc=Yc, Z=Z, T=T, nc=nc,
    )
    flops = 4 * 2 * n * X * Y * Z * T * ndir * (KI * KD * bd + bi * bd)
    o_re, o_im = pl.pallas_call(
        kern,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        in_specs=[kspec, kspec, bspec, bspec,
                  xspec, xspec, yp, yp, ym, ym],
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((n, KO, X, Y, Z, T), x.dtype),
            jax.ShapeDtypeStruct((n, KO, X, Y, Z, T), x.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(blocks.size + 2 * x.size) * 2 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(kron.re, kron.im, blocks.re, blocks.im,
      x.re, x.im, x.re, x.im, x.re, x.im)
    return cplx.CArray(o_re, o_im)
