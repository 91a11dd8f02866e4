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

Mixed precision: operands may be stored bf16 (2x bigger lattices in
HBM); loads are converted and all arithmetic accumulates in f32.
Round-1 toolchains made the bf16 path ~25% SLOWER (conversion ops
dominated); RE-MEASURED round 2 the conversions got cheap and the
halved traffic wins: 10.4 TF/s bf16 vs 7.1 f32 (Wilson 8x8x16x128 x 8
rhs on v5e) — bf16 storage is now the SPEED mode too.  Native bf16
arithmetic remains blocked by Mosaic's 32-bit-only vector rotate.
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


def _factor_kron(kre, kim):
    """Per-direction compile-time spin-factor plan, or None for tracers.

    For a CONCRETE kron factor the scalar entries become Python constants
    folded into the kernel (zeros vanish, +-1/+-i become adds), and rank-
    deficient factors are split K_d = R_d P_d so the color multiply runs
    on rank(K_d) spin slots — the half-spinor projection trick (Wilson
    hopping factors r +- gamma_mu have rank 2 at r = 1, halving the color
    FLOPs).  Reference analog: the CSR classification of kron blocks,
    bsr.h:106-247."""
    if isinstance(kre, jax.core.Tracer) or isinstance(kim, jax.core.Tracer):
        return None
    K = np.asarray(kre).astype(np.float64) + 1j * np.asarray(kim)
    ndir, KI, KD = K.shape

    def rows_of(M, tol=1e-12):
        return tuple(
            tuple((s, float(M[r, s].real), float(M[r, s].imag))
                  for s in range(M.shape[1]) if abs(M[r, s]) > tol)
            for r in range(M.shape[0]))

    specs = []
    for d in range(ndir):
        Kd = K[d]
        idx = []
        for r in range(KI):
            cand = Kd[idx + [r]]
            if np.linalg.matrix_rank(cand, tol=1e-9) > len(idx):
                idx.append(r)
        rank = len(idx)
        if 0 < rank < KI:
            P = Kd[idx]
            R = Kd @ np.linalg.pinv(P)
            R[np.abs(R) < 1e-10] = 0.0
            # snap near-integers (gamma algebra produces exact +-1/+-i)
            R = np.where(np.abs(R - np.round(R.real) - 1j * np.round(R.imag))
                         < 1e-9, np.round(R.real) + 1j * np.round(R.imag), R)
            if np.allclose(R @ P, Kd, atol=1e-10):
                specs.append(("factored", rows_of(P), rows_of(R)))
                continue
        specs.append(("direct", rows_of(Kd)))
    return tuple(specs)


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


def _smul(c, v):
    if c == 1.0:
        return v
    if c == -1.0:
        return -v
    return c * v


def _cacc(acc, cre, cim, xr, xi):
    """acc += (cre + i cim) * (xr + i xi) with the scalar constants folded
    at kernel-build time: zeros vanish, +-1 become adds/negations (the
    gamma-matrix entries are all 0, +-1, +-i)."""
    if cre == 0.0 and cim == 0.0:
        return acc
    if cim == 0.0:
        tre, tim = _smul(cre, xr), _smul(cre, xi)
    elif cre == 0.0:
        tre, tim = _smul(-cim, xi), _smul(cim, xr)
    else:
        tre = _smul(cre, xr) - _smul(cim, xi)
        tim = _smul(cre, xi) + _smul(cim, xr)
    if acc is None:
        return (tre, tim)
    return (acc[0] + tre, acc[1] + tim)


def _matvec_body(shifted, bload, store, zero_like, kron_re, kron_im,
                 *, ndir, BI, BD, KI, KD, kfact):
    """Shared per-direction stencil math for all kernel variants.

    ``shifted(d)`` -> (xs_re, xs_im) feature-indexed [:, f] operands;
    ``bload(d, i, j)`` -> (br, bi) color-block planes; ``store(sp, i,
    (re, im))`` writes an output row; ``zero_like()`` supplies a zero
    plane for structurally-empty rows."""

    acc = [[None] * BI for _ in range(KI)]

    def color_rows(d, zrows):
        t = [None] * BI
        for i in range(BI):
            for j in range(BD):
                if zrows[j] is None:
                    continue
                br, bi_ = bload(d, i, j)
                zre, zim = zrows[j]
                tre = zre * br - zim * bi_
                tim = zre * bi_ + zim * br
                t[i] = (tre, tim) if t[i] is None else (t[i][0] + tre,
                                                        t[i][1] + tim)
        return t

    for d in range(ndir):
        xs_re, xs_im = shifted(d)

        def spin_row(entries, j):
            z = None
            for (sidx, cre, cim) in entries:
                f = sidx * BD + j
                z = _cacc(z, cre, cim, xs_re[:, f], xs_im[:, f])
            return z

        spec = None if kfact is None else kfact[d]
        if spec is None:
            for sp in range(KI):
                zrows = []
                for j in range(BD):
                    z = None
                    for sidx in range(KD):
                        kr = kron_re[d, sp, sidx]
                        ki_ = kron_im[d, sp, sidx]
                        f = sidx * BD + j
                        xr = xs_re[:, f]
                        xi = xs_im[:, f]
                        tre = kr * xr - ki_ * xi
                        tim = kr * xi + ki_ * xr
                        z = (tre, tim) if z is None else (z[0] + tre,
                                                          z[1] + tim)
                    zrows.append(z)
                for i, t in enumerate(color_rows(d, zrows)):
                    if t is not None:
                        acc[sp][i] = t if acc[sp][i] is None else (
                            acc[sp][i][0] + t[0], acc[sp][i][1] + t[1])
        elif spec[0] == "direct":
            rows = spec[1]
            for sp in range(KI):
                zrows = [spin_row(rows[sp], j) for j in range(BD)]
                for i, t in enumerate(color_rows(d, zrows)):
                    if t is not None:
                        acc[sp][i] = t if acc[sp][i] is None else (
                            acc[sp][i][0] + t[0], acc[sp][i][1] + t[1])
        else:
            prows, rrows = spec[1], spec[2]
            tslots = []
            for c in range(len(prows)):
                zrows = [spin_row(prows[c], j) for j in range(BD)]
                tslots.append(color_rows(d, zrows))
            for sp in range(KI):
                for (c, cre, cim) in rrows[sp]:
                    for i in range(BI):
                        t = tslots[c][i]
                        if t is not None:
                            acc[sp][i] = _cacc(acc[sp][i], cre, cim,
                                               t[0], t[1])

    zero = None
    for sp in range(KI):
        for i in range(BI):
            if acc[sp][i] is None:
                if zero is None:
                    zero = zero_like()
                acc[sp][i] = (zero, zero)
            store(sp, i, acc[sp][i])


def _kernel(kron_re, kron_im,        # SMEM [ndir, KI, KD] (tracer path)
            b_re, b_im,              # [ndir, BI*BD, 1, Yc, Z, T]
            xc_re, xc_im,            # [nc, F, 1, Yc, Z, T]
            xp_re, xp_im,
            xm_re, xm_im,
            yp_re, yp_im,            # [nc, F, 1, 1, Z, T]
            ym_re, ym_im,
            o_re, o_im,              # out [nc, KO, 1, Yc, Z, T]
            *, offsets, BI, BD, KI, KD, Yc, Z, T, nc, kfact=None,
            packed_parity=None):

    def full(ref):
        # loads cast to f32: operands may be stored bf16 (mixed-precision
        # inner solves halve HBM traffic); accumulation is always f32
        return ref[:, :, 0].astype(jnp.float32)   # [nc, F, Yc, Z, T]

    out_dt = o_re.dtype
    xc = (full(xc_re), full(xc_im))

    def _img_x_odd():
        """Parity of the image site's x coordinate, per (row, z, t) —
        for packed-checkerboard operands the X-neighbor is either the
        same packed slot or the adjacent one depending on it."""
        y0 = pl.program_id(1) * Yc
        ys = y0 + jax.lax.broadcasted_iota(jnp.int32, (Yc, Z, T), 0)
        zs = jax.lax.broadcasted_iota(jnp.int32, (Yc, Z, T), 1)
        ts = jax.lax.broadcasted_iota(jnp.int32, (Yc, Z, T), 2)
        return ((packed_parity + ys + zs + ts) % 2) == 1

    def shifted(d):
        """The x block shifted for direction d: [nc, F, Yc, Z, T] pair."""
        ax, sgn = _axis_of(offsets[d])
        if ax == -1:
            return xc
        if ax == 0:
            src = (full(xp_re), full(xp_im)) if sgn > 0 else \
                  (full(xm_re), full(xm_im))
            if packed_parity is None:
                return src
            m = _img_x_odd()
            if sgn > 0:   # xh' = xh + [image x odd]
                return (jnp.where(m, src[0], xc[0]),
                        jnp.where(m, src[1], xc[1]))
            # xh' = xh - [image x even]
            return (jnp.where(m, xc[0], src[0]),
                    jnp.where(m, xc[1], src[1]))
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
    _matvec_body(
        shifted,
        lambda d, i, j: (b_re[d, i * BD + j, 0].astype(jnp.float32),
                         b_im[d, i * BD + j, 0].astype(jnp.float32)),
        lambda sp, i, v: (o_re.__setitem__((slice(None), sp * BI + i, 0),
                                           v[0].astype(out_dt)),
                          o_im.__setitem__((slice(None), sp * BI + i, 0),
                                           v[1].astype(out_dt))),
        lambda: jnp.zeros_like(xc[0][:, 0]),
        kron_re, kron_im,
        ndir=ndir, BI=BI, BD=BD, KI=KI, KD=KD, kfact=kfact,
    )


#: measured chunk preference, best first (round-4 confirm sweep on v5e,
#: experiments/stencil_retune.py + stencil_confirm_r4.py, Wilson
#: 8x8x16x128 x 8 rhs, long-chain two-point timing x2 reps):
#:   f32 : (8,2) 7.46-7.85 TF/s > (4,4) 7.42-7.54 > (8,1) 7.32
#:         > (1,8) 7.16-7.23 (the old Yc-max pick) > (4,1) 6.45-6.68
#:   bf16: (8,2) 11.30-11.54 > (4,4) 10.92-11.42 > (2,8) 10.71-10.83
#:         > old auto 10.36-10.53
#: (the round-2 toolchain preferred Yc-max — Mosaic scheduling moved;
#: keep re-measuring per round.)
_PREF_CHUNKS = ((8, 2), (4, 4), (2, 8), (8, 1))


def _pick_chunks(n, Y, F, KO, BI, BD, Z, T, ndir, vmem_budget=39 * 2 ** 20,
                 itemsize=4):
    """Choose (nc, Yc) fitting the VMEM budget (with double buffering).

    Tries the measured preference table (_PREF_CHUNKS) first, then falls
    back to maximizing Yc then nc.  The 39 MiB budget is the largest
    worksize the Mosaic toolchain compiled reliably (48+ MiB configs
    crash the compiler); the pallas_call sets vmem_limit_bytes=64 MiB
    to accommodate it."""
    def bytes_for(nc, Yc):
        site = Z * T * itemsize
        x = (3 * Yc + 2) * F * nc * site * 2          # 5 specs, re+im
        blk = ndir * BI * BD * Yc * site * 2
        y = KO * nc * Yc * site * 2
        return (x + blk) * 2 + y * 2                   # double buffering

    # preference rows get a higher cap: the bf16 (8,2) bench config
    # models at ~55 MiB and compiled+ran on the round-4 toolchain (the
    # 39 MiB ceiling predates it); the generic fallback stays
    # conservative for unmeasured shapes
    pref_budget = max(vmem_budget, 56 * 2 ** 20)
    for nc, Yc in _PREF_CHUNKS:
        if n % nc == 0 and Y % Yc == 0 and bytes_for(nc, Yc) <= pref_budget:
            return nc, Yc
    for Yc in [y for y in range(Y, 0, -1) if Y % y == 0]:
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
    packed_parity: Optional[int] = None,
    chunks: Optional[Tuple[int, int]] = None,
) -> cplx.CArray:
    """y[n, KI*BI, X, Y, Z, T] = stencil matvec in SoA layout.

    ``chunks=(nc, Yc)`` overrides the VMEM-budget auto-pick (used by the
    per-toolchain retune sweep, experiments/stencil_retune.py — Mosaic
    scheduling shifts between releases, so the best config is re-measured
    each round per VERDICT r2 item 10)."""
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

    # bf16 operands are converted to f32 in VMEM: budget raw + converted
    if chunks is not None:
        nc, Yc = chunks
        if n % nc or Y % Yc:
            raise ValueError(f"chunks {chunks} must divide (n={n}, Y={Y})")
    else:
        nc, Yc = _pick_chunks(n, Y, F, KO, bi, bd, Z, T, ndir,
                              itemsize=(6 if x.dtype.itemsize == 2 else 4))
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
        kfact=_factor_kron(kron.re, kron.im),
        packed_parity=packed_parity,
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


def stencil_matvec_soa_reference(blocks, kron, x, offsets, bi, bd,
                                 packed_parity=None):
    """Pure-XLA reference with the same SoA signature (used for tests and
    as the CPU fallback).  ``packed_parity`` selects the checkerboard-
    packed X-shift semantics (see models/eo_packed.py)."""
    ndir = blocks.shape[0]
    if kron is None:
        kron = cplx.CArray(jnp.ones((ndir, 1, 1), blocks.dtype),
                           jnp.zeros((ndir, 1, 1), blocks.dtype))
    KI, KD = kron.shape[1], kron.shape[2]
    n = x.shape[0]
    lat = x.shape[2:]
    if packed_parity is not None:
        import numpy as _np

        rest = lat[1:]
        coords = _np.meshgrid(*[_np.arange(d) for d in rest], indexing="ij")
        m = ((packed_parity + sum(coords)) % 2 == 1)
        img_x_odd = jnp.asarray(m.reshape((1, 1, 1) + tuple(rest)))

    def roll(v, off):
        def r(a):
            for ax, o in enumerate(off):
                if o % (lat[ax] if packed_parity is None or ax != 0
                        else 10 ** 9) != 0:
                    if packed_parity is not None and ax == 0:
                        sh = jnp.roll(a, -o, axis=3)
                        if o > 0:
                            a = jnp.where(img_x_odd, sh, a)
                        else:
                            a = jnp.where(img_x_odd, a, sh)
                    else:
                        a = jnp.roll(a, -o, axis=3 + ax)
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
    # honor the kernel's output contract (out dtype = field dtype): the
    # f32 kron factor otherwise promotes a bf16 field to f32 here but
    # not on the Pallas path — scan carries (bench chains) would differ
    out_dt = x.re.dtype
    return cplx.cmap(
        lambda a: a.reshape((n, KI * bi) + lat).astype(out_dt), y)


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
#
# RE-TESTED round 2 (newer toolchain, same harness): v1 7.33, v2 6.35,
# v3 4.86 TF/s — v2 nearly doubled (Mosaic scheduling improved) but v1
# still wins; keep re-testing per toolchain update.  A forced (nc, Yc)
# sweep found only nc=2/Yc=1 compiling (5.97 TF/s; every other point
# remote_compile HTTP 500) — the auto-pick remains the only viable
# config.


def _kernel_xin(kron_re, kron_im,      # SMEM [ndir, KI, KD]
                b_re, b_im,            # [ndir, BI*BD, X, Yc, Z, T]
                xc_re, xc_im,          # [nc, F, X, Yc, Z, T]
                yp_re, yp_im,          # [nc, F, X, 1, Z, T]
                ym_re, ym_im,
                o_re, o_im,            # out [nc, KO, X, Yc, Z, T]
                *, offsets, BI, BD, KI, KD, X, Yc, Z, T, nc, kfact=None):

    out_dt = o_re.dtype
    xc = (xc_re[...].astype(jnp.float32), xc_im[...].astype(jnp.float32))

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
                return (src[0][...].astype(jnp.float32),
                        src[1][...].astype(jnp.float32))
            if sgn > 0:
                def cat(c, b):
                    return jnp.concatenate(
                        [c[:, :, :, 1:], b[...].astype(jnp.float32)], axis=3)
                return (cat(xc[0], yp_re), cat(xc[1], yp_im))
            def cat(c, b):
                return jnp.concatenate(
                    [b[...].astype(jnp.float32), c[:, :, :, :Yc - 1]], axis=3)
            return (cat(xc[0], ym_re), cat(xc[1], ym_im))
        if ax == 2:
            sh = (Z - 1) if sgn > 0 else 1
            return (pltpu.roll(xc[0], sh, 4), pltpu.roll(xc[1], sh, 4))
        sh = (T - 1) if sgn > 0 else 1
        return (pltpu.roll(xc[0], sh, 5), pltpu.roll(xc[1], sh, 5))

    _matvec_body(
        shifted,
        lambda d, i, j: (b_re[d, i * BD + j].astype(jnp.float32),
                         b_im[d, i * BD + j].astype(jnp.float32)),
        lambda sp, i, v: (o_re.__setitem__((slice(None), sp * BI + i),
                                           v[0].astype(out_dt)),
                          o_im.__setitem__((slice(None), sp * BI + i),
                                           v[1].astype(out_dt))),
        lambda: jnp.zeros_like(xc[0][:, 0]),
        kron_re, kron_im,
        ndir=len(offsets), BI=BI, BD=BD, KI=KI, KD=KD, kfact=kfact,
    )


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
        kfact=_factor_kron(kron.re, kron.im),
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


# ---------------------------------------------------------------------------
# v3 kernel: software-pipelined X streaming (scratch plane rotation)
# ---------------------------------------------------------------------------
#
# The plane-DMA v1 kernel fetches the x-1/x/x+1 planes as three
# BlockSpecs, so x is read ~3x from HBM.  Here the grid walks X
# sequentially and keeps the previous two planes in persistent VMEM
# scratch: step s receives plane s%X, computes the output for image
# plane (s-1)%X from (scratch0=s-2, scratch1=s-1, delivered=s), then
# rotates the scratch.  The grid runs X+2 steps per n-chunk: steps 0 and
# 1 write garbage to output planes X-1 and 0, which steps X and X+1
# overwrite with the correct (wrapped) values — fully static, no
# conditionals.  Y stays whole in the block (toroidal in-VMEM concat);
# Z/T are in-register rolls.  HBM x-traffic: (X+2)/X ~ 1x.
#
# MEASURED (v5e, Wilson 8x8x16x128 x 8 rhs): 5.0 TF/s vs v1's 7.6 in the
# same harness — like the X-inside v2, the theoretical traffic saving is
# eaten by serialized scheduling (the sequential X walk plus scratch
# rotation copies defeat Mosaic's DMA/compute pipelining, which on this
# toolchain is worth more than the saved HBM reads).  Bit-identical to
# v1; kept for re-evaluation, NOT dispatched by default.


def _kernel_stream(kron_re, kron_im,    # SMEM
                   b_re, b_im,          # [ndir, BI*BD, 1, Y, Z, T] @ (s-1)%X
                   xc_re, xc_im,        # [nc, F, 1, Y, Z, T] @ s%X
                   o_re, o_im,          # out [nc, KO, 1, Y, Z, T] @ (s-1)%X
                   s0_re, s0_im,        # scratch: plane s-2
                   s1_re, s1_im,        # scratch: plane s-1
                   *, offsets, BI, BD, KI, KD, Y, Z, T, nc, kfact=None):

    out_dt = o_re.dtype
    xin = (xc_re[:, :, 0].astype(jnp.float32),
           xc_im[:, :, 0].astype(jnp.float32))     # plane s
    xc = (s1_re[...], s1_im[...])                  # plane s-1 (image)
    xm = (s0_re[...], s0_im[...])                  # plane s-2

    def shifted(d):
        ax, sgn = _axis_of(offsets[d])
        if ax == -1:
            return xc
        if ax == 0:
            return xin if sgn > 0 else xm
        if ax == 1:
            if sgn > 0:
                cat = lambda c: jnp.concatenate([c[:, :, 1:], c[:, :, :1]],
                                                axis=2)
            else:
                cat = lambda c: jnp.concatenate([c[:, :, -1:], c[:, :, :-1]],
                                                axis=2)
            return (cat(xc[0]), cat(xc[1]))
        if ax == 2:
            sh = (Z - 1) if sgn > 0 else 1
            return (pltpu.roll(xc[0], sh, 3), pltpu.roll(xc[1], sh, 3))
        sh = (T - 1) if sgn > 0 else 1
        return (pltpu.roll(xc[0], sh, 4), pltpu.roll(xc[1], sh, 4))

    _matvec_body(
        shifted,
        lambda d, i, j: (b_re[d, i * BD + j, 0].astype(jnp.float32),
                         b_im[d, i * BD + j, 0].astype(jnp.float32)),
        lambda sp, i, v: (o_re.__setitem__((slice(None), sp * BI + i, 0),
                                           v[0].astype(out_dt)),
                          o_im.__setitem__((slice(None), sp * BI + i, 0),
                                           v[1].astype(out_dt))),
        lambda: jnp.zeros_like(xc[0][:, 0]),
        kron_re, kron_im,
        ndir=len(offsets), BI=BI, BD=BD, KI=KI, KD=KD, kfact=kfact,
    )
    # rotate the pipeline: (s-2) <- (s-1), (s-1) <- s
    s0_re[...] = s1_re[...]
    s0_im[...] = s1_im[...]
    s1_re[...] = xin[0]
    s1_im[...] = xin[1]


def stencil_matvec_soa_stream(
    blocks: cplx.CArray,
    kron: Optional[cplx.CArray],
    x: cplx.CArray,
    offsets: Sequence[Tuple[int, ...]],
    bi: int, bd: int,
    interpret: bool = False,
    nc: Optional[int] = None,
) -> cplx.CArray:
    """X-streaming variant of :func:`stencil_matvec_soa` (same contract)."""
    ndir, FB = blocks.shape[0], blocks.shape[1]
    X, Y, Z, T = blocks.shape[2:]
    n = x.shape[0]
    if kron is None:
        kron = cplx.CArray(jnp.ones((ndir, 1, 1), jnp.float32),
                           jnp.zeros((ndir, 1, 1), jnp.float32))
    kron = cplx.cmap(lambda a: a.astype(jnp.float32), kron)
    KI, KD = kron.shape[1], kron.shape[2]
    F = KD * bd
    KO = KI * bi
    assert FB == bi * bd and x.shape[1] == F
    if nc is not None and n % nc:
        raise ValueError(f"nc={nc} must divide the column count n={n}")
    if nc is None:
        site = Z * T * 4 * 2
        for c in (8, 4, 2, 1):
            if n % c:
                continue
            tot = (c * F * Y * site * 2 * 2          # xc db + 2 scratch
                   + ndir * FB * Y * site * 2        # blocks db
                   + c * KO * Y * site * 2)          # out db
            if tot <= 40 * 2 ** 20:
                nc = c
                break
        else:
            nc = 1

    grid = (n // nc, X + 2)

    xspec = pl.BlockSpec((nc, F, 1, Y, Z, T),
                         lambda inn, s, X=X: (inn, 0, s % X, 0, 0, 0))
    bspec = pl.BlockSpec((ndir, FB, 1, Y, Z, T),
                         lambda inn, s, X=X: (0, 0, (s + X - 1) % X, 0, 0, 0))
    ospec = pl.BlockSpec((nc, KO, 1, Y, Z, T),
                         lambda inn, s, X=X: (inn, 0, (s + X - 1) % X,
                                              0, 0, 0))
    kspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scratch = pltpu.VMEM((nc, F, Y, Z, T), jnp.float32)

    kern = functools.partial(
        _kernel_stream, offsets=tuple(tuple(o) for o in offsets),
        BI=bi, BD=bd, KI=KI, KD=KD, Y=Y, Z=Z, T=T, nc=nc,
        kfact=_factor_kron(kron.re, kron.im),
    )
    o_re, o_im = pl.pallas_call(
        kern,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        in_specs=[kspec, kspec, bspec, bspec, xspec, xspec],
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((n, KO, X, Y, Z, T), x.dtype),
            jax.ShapeDtypeStruct((n, KO, X, Y, Z, T), x.dtype),
        ),
        scratch_shapes=[scratch, scratch, scratch, scratch],
        interpret=interpret,
    )(kron.re, kron.im, blocks.re, blocks.im, x.re, x.im)
    return cplx.CArray(o_re, o_im)
