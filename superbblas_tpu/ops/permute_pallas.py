"""Pallas tiled transpose: the label-permute fast path on TPU.

XLA's one-pass transpose of a 4D array whose minor axis changes runs at
~250 GB/s on v5e (vs ~710 GB/s streaming); this tiled kernel reaches
~320-340 GB/s (1.25x) by moving (X, 8, 8, T) blocks through VMEM and
doing the minor-axis rotation as 64 full-width 2D register transposes
per block.  Reference analog: the permutation kernels of copy_n.h (the
reference's dist.cpp benchmark reports copy/permute overhead vs memcpy;
this is the same metric on TPU).

Supported: 4D permutations that move the minor axis to the front and
the leading axis to the minor position, i.e. (3, 1, 2, 0) and
(3, 2, 1, 0) — the canonical "xyzt -> tzyx" full reversal of the
benchmarks and any single-label relabeling of it.  Larger middle tiles
currently crash the Mosaic compiler; 8 is both legal (sublane quantum)
and fastest of the working set.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["pallas_permute", "permute_eligible"]

_SUPPORTED = {(3, 1, 2, 0): False, (3, 2, 1, 0): True}  # perm -> mid_swap
_VMEM_BLOCK_BUDGET = 8 * 2 ** 20


def _pick_block(dim: int) -> Optional[int]:
    if dim % 8 == 0:
        return 8
    if dim < 8:
        return dim          # full axis is always legal
    return None


def permute_eligible(shape: Tuple[int, ...], perm: Tuple[int, ...],
                     dtype) -> bool:
    if len(shape) != 4 or tuple(perm) not in _SUPPORTED:
        return False
    if jnp.dtype(dtype).itemsize != 4:
        return False
    X, Y, Z, T = shape
    yb, zb = _pick_block(Y), _pick_block(Z)
    if yb is None or zb is None:
        return False
    if X * yb * zb * T * 4 > _VMEM_BLOCK_BUDGET:
        return False
    return min(shape) >= 1 and X > 1 and T > 1


def _kern(xr, yr, *, YB, ZB, mid_swap):
    for j in range(YB):
        for k in range(ZB):
            if mid_swap:
                yr[:, k, j, :] = xr[:, j, k, :].T
            else:
                yr[:, j, k, :] = xr[:, j, k, :].T


def pallas_permute(x: jax.Array, perm: Tuple[int, ...],
                   interpret: bool = False,
                   blocks: Optional[Tuple[int, int]] = None) -> jax.Array:
    """jnp.transpose(x, perm) through the tiled Pallas kernel.

    Caller must have checked :func:`permute_eligible`.  Only valid for
    single-device (or fully-replicated) operands — pallas_call does not
    partition itself over GSPMD-sharded inputs.  ``blocks=(YB, ZB)``
    overrides the tile pick (per-toolchain retune sweeps,
    experiments/permute_retune.py).
    """
    perm = tuple(perm)
    mid_swap = _SUPPORTED[perm]
    X, Y, Z, T = x.shape
    if blocks is not None:
        YB, ZB = blocks
        if Y % YB or Z % ZB:
            raise ValueError(f"blocks {blocks} must divide (Y={Y}, Z={Z})")
    else:
        YB, ZB = _pick_block(Y), _pick_block(Z)
    out_shape = tuple(x.shape[p] for p in perm)

    if mid_swap:
        out_spec = pl.BlockSpec((T, ZB, YB, X), lambda y, z: (0, z, y, 0))
    else:
        out_spec = pl.BlockSpec((T, YB, ZB, X), lambda y, z: (0, y, z, 0))
    return pl.pallas_call(
        functools.partial(_kern, YB=YB, ZB=ZB, mid_swap=mid_swap),
        grid=(Y // YB, Z // ZB),
        in_specs=[pl.BlockSpec((X, YB, ZB, T), lambda y, z: (0, y, z, 0))],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        interpret=interpret,
    )(x)


def maybe_pallas_permute(x, perm) -> Optional[jax.Array]:
    """Eager-mode dispatch guard: concrete single-device TPU array with an
    eligible permutation, and the Pallas paths enabled."""
    from .. import flags

    if isinstance(x, jax.core.Tracer) or not isinstance(x, jax.Array):
        return None
    if not flags.get_use_pallas():
        return None
    if not permute_eligible(x.shape, tuple(perm), x.dtype):
        return None
    try:
        devs = x.sharding.device_set
    except Exception:
        return None
    if len(devs) != 1 or next(iter(devs)).platform not in ("tpu", "axon"):
        return None
    return pallas_permute(x, tuple(perm))
