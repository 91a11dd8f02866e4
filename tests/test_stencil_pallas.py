"""Pallas SoA stencil kernel vs the XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from superbblas_tpu import cplx
from superbblas_tpu.ops import stencil_pallas as SP

LAT = (2, 4, 8, 128)


def offsets4():
    offs = [(0, 0, 0, 0)]
    for ax in range(4):
        for sgn in (1, -1):
            o = [0, 0, 0, 0]
            o[ax] = sgn
            offs.append(tuple(o))
    return offs


def crand(shape, seed):
    rng = np.random.default_rng(seed)
    return cplx.CArray(
        jnp.asarray(rng.standard_normal(shape), jnp.float32),
        jnp.asarray(rng.standard_normal(shape), jnp.float32),
    )


@pytest.mark.parametrize("with_kron", [True, False])
def test_kernel_matches_reference(with_kron):
    offs = offsets4()
    bi = bd = 3
    ki = kd = 2 if with_kron else 1
    n = 2
    blocks = crand((len(offs), bi * bd) + LAT, 0)
    kron = crand((len(offs), ki, kd), 1) if with_kron else None
    x = crand((n, kd * bd) + LAT, 2)
    got = SP.stencil_matvec_soa(blocks, kron, x, offs, bi, bd, interpret=True)
    want = SP.stencil_matvec_soa_reference(blocks, kron, x, offs, bi, bd)
    np.testing.assert_allclose(np.asarray(got.re), np.asarray(want.re),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.im), np.asarray(want.im),
                               rtol=2e-4, atol=2e-4)


def test_soa_layout_roundtrip():
    n, kd, bd = 3, 4, 3
    x = crand(LAT + (kd, bd, n), 3)
    soa = SP.aos_to_soa(x, 4)
    assert soa.shape == (n, kd * bd) + LAT
    back = SP.soa_to_aos(soa, 4, kd, bd)
    np.testing.assert_array_equal(np.asarray(back.re), np.asarray(x.re))


def test_eligibility():
    offs = offsets4()
    assert SP.soa_eligible(offs, LAT, 3, 3, 4, 4)
    assert not SP.soa_eligible(offs, (4, 4, 4, 100), 3, 3, 4, 4)  # T%128
    assert not SP.soa_eligible([(0, 0, 0, 2)], LAT, 3, 3, 4, 4)   # offset 2
    assert not SP.soa_eligible(offs, (4, 4, 4), 3, 3, 1, 1)       # 3D


def test_xin_variant_matches_reference():
    """The X-inside kernel variant (experimental) stays correct."""
    import numpy as np
    from superbblas_tpu import cplx
    from superbblas_tpu.ops.stencil_pallas import (
        stencil_matvec_soa_reference,
        stencil_matvec_soa_xin,
    )

    rng = np.random.default_rng(0)
    lat = (4, 4, 8, 128)
    bi = bd = 3
    KI = KD = 4

    def carr(shape):
        return cplx.CArray(
            jnp.asarray(rng.standard_normal(shape), jnp.float32),
            jnp.asarray(rng.standard_normal(shape), jnp.float32))

    offs = [(0, 0, 0, 0)] + [
        tuple(s if a == mu else 0 for a in range(4))
        for mu in range(4) for s in (1, -1)]
    blocks = carr((9, bi * bd) + lat)
    kron = carr((9, KI, KD))
    x = carr((2, KD * bd) + lat)
    y = stencil_matvec_soa_xin(blocks, kron, x, offs, bi, bd, interpret=True)
    r = stencil_matvec_soa_reference(blocks, kron, x, offs, bi, bd)
    assert float(jnp.max(jnp.abs(y.re - r.re))) < 1e-4
    assert float(jnp.max(jnp.abs(y.im - r.im))) < 1e-4


def test_bf16_storage_path():
    """bf16-stored operands accumulate in f32; error ~ input rounding."""
    import numpy as np
    from superbblas_tpu import cplx
    from superbblas_tpu.ops.stencil_pallas import (
        stencil_matvec_soa,
        stencil_matvec_soa_reference,
    )

    rng = np.random.default_rng(2)
    lat = (4, 4, 8, 128)

    def carr(shape, dt):
        return cplx.CArray(jnp.asarray(rng.standard_normal(shape), dt),
                           jnp.asarray(rng.standard_normal(shape), dt))

    offs = [(0, 0, 0, 0)] + [
        tuple(s if a == mu else 0 for a in range(4))
        for mu in range(4) for s in (1, -1)]
    b = carr((9, 9) + lat, jnp.float32)
    k = carr((9, 4, 4), jnp.float32)
    x = carr((2, 12) + lat, jnp.float32)
    ref = stencil_matvec_soa_reference(b, k, x, offs, 3, 3)
    tob = lambda c: cplx.cmap(lambda a: a.astype(jnp.bfloat16), c)
    y = stencil_matvec_soa(tob(b), k, tob(x), offs, 3, 3, interpret=True)
    assert y.re.dtype == jnp.bfloat16
    rel = float(jnp.max(jnp.abs(y.re.astype(jnp.float32) - ref.re))
                / jnp.max(jnp.abs(ref.re)))
    assert rel < 0.05, rel


def test_stream_variant_matches_reference():
    """The X-streaming kernel variant (experimental) stays correct."""
    import numpy as np
    from superbblas_tpu import cplx
    from superbblas_tpu.models import wilson_operator
    from superbblas_tpu.ops.stencil_pallas import (
        stencil_matvec_soa_reference,
        stencil_matvec_soa_stream,
    )

    op = wilson_operator((4, 4, 8, 128), mass=0.1, key=0, layout="soa",
                         dtype=jnp.complex64)
    rng = np.random.default_rng(0)
    x = cplx.CArray(
        jnp.asarray(rng.standard_normal((2, 12, 4, 4, 8, 128)), jnp.float32),
        jnp.asarray(rng.standard_normal((2, 12, 4, 4, 8, 128)), jnp.float32))
    y = stencil_matvec_soa_stream(op.blocks, op.kron, x, op.offsets, 3, 3,
                                  interpret=True)
    r = stencil_matvec_soa_reference(op.blocks, op.kron, x, op.offsets, 3, 3)
    assert float(jnp.max(jnp.abs(y.re - r.re))) < 1e-4
