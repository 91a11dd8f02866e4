"""Communication-avoiding operator powers (parallel/powers.py).

Oracle: the unrolled ``bsr_krylov(okr=...)`` path on global arrays — the
two must agree exactly on the core (reference semantics: bsr.h:2140-2247
computes the same y_k = A^{k+1} x through one widened halo gather).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from superbblas_tpu import bsr as B
from superbblas_tpu import cplx
from superbblas_tpu import parallel as par
from superbblas_tpu.parallel.powers import bsr_krylov_ca

from test_bsr import make_stencil_op


@pytest.fixture(scope="module")
def mesh():
    return par.make_mesh({"X": 4, "Y": 2})


def test_ca_powers_match_unrolled(mesh):
    dim = (16, 8)
    power = 3
    op, vals, offs = make_stencil_op(dim, 3, 3, seed=5)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(dim + (3, 5)))

    ref = B.bsr_krylov(2.0, op, x, "XYsn", okr="p", power=power)

    x_sh = jax.device_put(x, NamedSharding(mesh, P("X", "Y", None, None)))
    out = bsr_krylov_ca(2.0, op, x_sh, "XYsn", mesh,
                        {"X": "X", "Y": "Y"}, power=power)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_ca_powers_partial_sharding(mesh):
    """Only one lattice axis sharded; the other uses plain local rolls."""
    dim = (16, 8)
    power = 2
    op, _, _ = make_stencil_op(dim, 2, 2, seed=3)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(dim + (2, 4)))

    ref = B.bsr_krylov(1.0, op, x, "XYsn", okr="q", power=power)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("X", None, None, None)))
    out = bsr_krylov_ca(1.0, op, x_sh, "XYsn", mesh, {"X": "X"},
                        power=power, okr="q")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_ca_powers_kron_wilson(mesh):
    """Kron-factored (Wilson) operator, split-complex operands."""
    from superbblas_tpu.models import wilson_operator

    lat = (8, 8, 2, 2)
    power = 2
    op = wilson_operator(lat, mass=0.3, key=2, dtype=jnp.complex128)
    rng = np.random.default_rng(11)
    shape = lat + (4, 3, 2)
    x = cplx.CArray(jnp.asarray(rng.standard_normal(shape)),
                    jnp.asarray(rng.standard_normal(shape)))

    ref = B.bsr_krylov(1.0, op, x, "xyztSCn", okr="k", power=power)

    x_sh = jax.device_put(
        x, NamedSharding(mesh, P("X", "Y", None, None, None, None, None)))
    out = bsr_krylov_ca(1.0, op, x_sh, "xyztSCn", mesh,
                        {"x": "X", "y": "Y"}, power=power, okr="k")
    np.testing.assert_allclose(np.asarray(out.re), np.asarray(ref.re),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.im), np.asarray(ref.im),
                               rtol=1e-10, atol=1e-10)


def test_ca_powers_width_check(mesh):
    dim = (16, 8)
    op, _, _ = make_stencil_op(dim, 2, 2)
    x = jnp.ones(dim + (2, 1))
    x_sh = jax.device_put(x, NamedSharding(mesh, P("X", "Y", None, None)))
    with pytest.raises(ValueError, match="halo width"):
        bsr_krylov_ca(1.0, op, x_sh, "XYsn", mesh,
                      {"X": "X", "Y": "Y"}, power=5)


def test_ca_powers_gather_mode(mesh):
    """Gather-mode (irregular) operators route through the halo-plan CA
    executor (gather_sharded.apply_gather_sharded all_powers) — oracle:
    the unrolled bsr_krylov(okr=) on the replicated operand; the
    unsharded case falls back to a local power loop."""
    from test_gather_sharded import _irregular_op

    rng = np.random.default_rng(9)
    dim = (16, 4, 6)
    op = _irregular_op(dim, 2, 0, 1, rng)
    assert op.mode == "gather"
    x = cplx.CArray(jnp.asarray(rng.standard_normal(dim + (2, 3))),
                    jnp.asarray(rng.standard_normal(dim + (2, 3))))
    ref = B.bsr_krylov(2.0, op, x, "xyzcn", okr="p", power=2)

    x_sh = jax.device_put(
        x, NamedSharding(mesh, P("X", None, None, None, None)))
    out = bsr_krylov_ca(2.0, op, x_sh, "xyzcn", mesh, {"x": "X"}, power=2)
    np.testing.assert_allclose(np.asarray(out.re), np.asarray(ref.re),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.im), np.asarray(ref.im),
                               rtol=1e-10, atol=1e-10)

    # no sharded lattice axis -> local unrolled fallback
    out0 = bsr_krylov_ca(2.0, op, x, "xyzcn", mesh, {}, power=2)
    np.testing.assert_allclose(np.asarray(out0.re), np.asarray(ref.re),
                               rtol=1e-10, atol=1e-10)
