"""Block-diagonal-packed batched small GEMM (ops/batched_gemm_pallas.py).

Oracle: XLA batched dot_general.  The kernel is exercised in interpreter
mode on CPU (the real-TPU numbers live in
experiments/coarse_batched_gemm.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superbblas_tpu.ops.batched_gemm_pallas import (
    batched_gemm_eligible,
    batched_small_gemm,
)


@pytest.mark.parametrize("V,I,J,N", [
    (40, 12, 12, 32),     # multigrid coarse block (K=12 near-null basis)
    (7, 24, 24, 16),      # 24x24, ragged batch
    (16, 12, 8, 5),       # rectangular, ragged N
    (8, 32, 32, 128),     # nc=32 coarse regime
])
def test_matches_dot_general(V, I, J, N):
    rng = np.random.default_rng(V + I + N)
    b = jnp.asarray(rng.standard_normal((V, I, J)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((V, J, N)), jnp.float32)
    got = batched_small_gemm(b, x, interpret=True)
    want = np.einsum("vij,vjn->vin", np.asarray(b, np.float64),
                     np.asarray(x, np.float64))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_eligibility():
    assert batched_gemm_eligible(12, 12, jnp.float32)
    assert batched_gemm_eligible(32, 32, jnp.float32)
    assert not batched_gemm_eligible(96, 96, jnp.float32)   # > 64 padded
    assert not batched_gemm_eligible(12, 12, jnp.bfloat16)


def test_cpu_fallback_is_xla():
    """Off-TPU (and without interpret) the wrapper must route to XLA."""
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((5, 12, 12)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((5, 12, 7)), jnp.float32)
    got = batched_small_gemm(b, x)          # cpu -> dot_general
    want = np.einsum("vij,vjn->vin", np.asarray(b), np.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_complex_via_cbilinear():
    """The split-complex composition the coarse matvec uses."""
    from superbblas_tpu import cplx

    rng = np.random.default_rng(1)
    b = rng.standard_normal((6, 12, 12)) + 1j * rng.standard_normal((6, 12, 12))
    x = rng.standard_normal((6, 12, 9)) + 1j * rng.standard_normal((6, 12, 9))
    bC = cplx.from_complex(b.astype(np.complex64))
    xC = cplx.from_complex(x.astype(np.complex64))
    got = cplx.cbilinear(
        lambda bb, xx: batched_small_gemm(bb, xx, interpret=True), bC, xC)
    want = np.einsum("vij,vjn->vin", b, x)
    np.testing.assert_allclose(np.asarray(got.re) + 1j * np.asarray(got.im),
                               want, atol=1e-3)
