"""MXU-fill batched small GEMM: many independent [I, J] x [J, N] products.

The TPU answer to the reference's ``xgemm_batch_strided`` (blas.h:662-812).
XLA lowers a batched ``dot_general`` over small matrices to one MXU pass
PER BATCH ELEMENT: a 12x12 operand occupies a 128x128 systolic tile at
<1% fill, which is why multigrid coarse levels measured ~1.3 TF/s on v5e
(experiments/coarse_batched_gemm.py).

This kernel packs ``S`` per-site blocks into ONE block-diagonal 128x128
tile in VMEM (sites padded to a sublane-aligned ``IP x JP``), so a tile's
matmul carries S sites of work instead of one:

    D = blockdiag(B[g*S], ..., B[g*S+S-1])     # [128, 128], built in VMEM
    Y[g*S : (g+1)*S] = D @ X[g*S : (g+1)*S]    # [128, N] one MXU pass

The diagonal writes are aligned (IP, JP multiples of the 8-sublane tile)
and overlap with the previous step's matmul through Mosaic's pipeline.

MEASURED OUTCOME (v5e, round 2 — full numbers and two checked-in probe
kernels in experiments/coarse_batched_gemm.py): the current XLA
toolchain's batched dot_general beats every packing variant (e.g. 2.78
vs 0.74 TF/s at the K=288 coarse shape; 1.01 vs 0.30 at 12x12/N=128) —
the per-step grid overhead and the VPU diagonal-block stores, which
serialize with the matmul consuming them, outweigh the fill win, and
arithmetic-intensity ceilings cap the small shapes at 2-4.4 TF/s
regardless.  ``batched_small_gemm`` therefore routes to XLA on TPU by
default; the kernel stays behind ``force_pallas=True`` for
re-evaluation on future toolchains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["batched_small_gemm", "batched_gemm_eligible"]


def _pad_to(v: int, m: int) -> int:
    return -(-v // m) * m


def batched_gemm_eligible(I: int, J: int, dtype) -> bool:
    """Whether the block-diag Pallas kernel supports this block shape:
    small blocks (several fit a 128-tile) with bounded aligned padding.
    Reference analog: the per-backend dispatch guards of
    xgemm_batch_strided (blas.h:662-680)."""
    if dtype not in (jnp.float32, np.float32, jnp.dtype("float32")):
        return False
    return _pad_to(I, 8) <= 64 and _pad_to(J, 8) <= 64


def _kernel(b_ref, x_ref, o_ref, d_ref, *, S, IP, JP, N):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        d_ref[:] = jnp.zeros_like(d_ref)

    # place the S diagonal blocks (aligned [IP, JP] writes; off-diagonal
    # stays zero from the one-time init — diagonal slots are fully
    # overwritten every step)
    for s in range(S):
        d_ref[s * IP:(s + 1) * IP, s * JP:(s + 1) * JP] = b_ref[s]

    x = x_ref[:].reshape(S * JP, N)
    y = jnp.dot(d_ref[:], x, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    o_ref[:] = y.reshape(S, IP, N)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _batched_small_gemm_padded(b, x, interpret=False):
    """b [V, IP, JP], x [V, JP, N] with IP, JP 8-aligned and
    V * IP, V * JP >= 128-divisible groupings handled by the caller."""
    V, IP, JP = b.shape
    N = x.shape[-1]
    S = 128 // max(IP, JP)
    grid = V // S
    return pl.pallas_call(
        functools.partial(_kernel, S=S, IP=IP, JP=JP, N=N),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((S, IP, JP), lambda g: (g, 0, 0)),
            pl.BlockSpec((S, JP, N), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((S, IP, N), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((V, IP, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S * IP, S * JP), jnp.float32)],
        interpret=interpret,
    )(b, x)


def batched_small_gemm(b: jax.Array, x: jax.Array,
                       interpret: bool = False,
                       force_pallas: bool = False) -> jax.Array:
    """y[v] = b[v] @ x[v] for a batch of small matrices (f32) — the
    xgemm_batch_strided analog (blas.h:662-812).

    ``b``: [V, I, J]; ``x``: [V, J, N]; returns [V, I, N].  Routes to
    XLA's batched dot_general (the measured-fastest backend on current
    TPU toolchains — see the module docstring); ``force_pallas=True`` /
    ``interpret=True`` select the block-diagonal-packed Pallas kernel.
    """
    V, I, J = b.shape
    N = x.shape[-1]
    use_pallas = interpret or (
        force_pallas
        and jax.devices()[0].platform not in ("cpu",)
        and batched_gemm_eligible(I, J, b.dtype))
    if force_pallas and not use_pallas:
        # a future-toolchain re-evaluation must not silently measure the
        # XLA path while believing it measured the Pallas kernel
        import warnings

        reason = ("platform is CPU"
                  if jax.devices()[0].platform == "cpu"
                  else f"block shape ({I}, {J}, {b.dtype}) not eligible")
        warnings.warn(
            f"batched_small_gemm: force_pallas=True but falling back to "
            f"XLA dot_general ({reason})", RuntimeWarning)
    if not use_pallas:
        return jax.lax.dot_general(
            b, x, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    IP, JP = _pad_to(I, 8), _pad_to(J, 8)
    # N on the lane axis: pad to 128 lanes
    NP = _pad_to(N, 128)
    S = 128 // max(IP, JP)
    VP = _pad_to(V, S)
    bp = jnp.zeros((VP, IP, JP), jnp.float32).at[:V, :I, :J].set(b)
    xp = jnp.zeros((VP, JP, NP), jnp.float32).at[:V, :J, :N].set(x)
    y = _batched_small_gemm_padded(bp, xp, interpret=interpret)
    return y[:V, :I, :N]
