"""Dense batched solver tests (reference analog: tests/dense.cpp:40-222 —
algebraic identity checks: trsm(chol(A)) round-trips, gesm/inversion solve)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from superbblas_tpu import cplx, dense
from superbblas_tpu import parallel as par


def hpd_batch(rng, batch, n, complex_=True):
    """Hermitian positive definite matrices [*batch, n, n]."""
    shape = tuple(batch) + (n, n)
    a = rng.standard_normal(shape)
    if complex_:
        a = a + 1j * rng.standard_normal(shape)
    return a @ np.conj(np.swapaxes(a, -1, -2)) + n * np.eye(n)


def as_np(c):
    if cplx.is_carray(c):
        return np.asarray(c.re) + 1j * np.asarray(c.im)
    return np.asarray(c)


@pytest.mark.parametrize("mode", ["real", "complex", "split"])
def test_cholesky_roundtrip(mode):
    rng = np.random.default_rng(0)
    a = hpd_batch(rng, (2, 3), 4, complex_=(mode != "real"))
    # tensor labels: batch "xy", rows "r", cols "c"
    v = cplx.from_complex(a) if mode == "split" else jnp.asarray(a)
    u = dense.cholesky(v, "xyrc", "r", "c")
    un = as_np(u)
    np.testing.assert_allclose(
        np.conj(np.swapaxes(un, -1, -2)) @ un, a, rtol=1e-10, atol=1e-10)
    # upper triangular
    np.testing.assert_allclose(np.tril(un, -1), 0, atol=1e-12)


@pytest.mark.parametrize("mode", ["real", "complex", "split"])
def test_trsm_solves(mode):
    rng = np.random.default_rng(1)
    a = hpd_batch(rng, (3,), 4, complex_=(mode != "real"))
    x = rng.standard_normal((3, 4, 5))
    if mode != "real":
        x = x + 1j * rng.standard_normal((3, 4, 5))
    v = cplx.from_complex(a) if mode == "split" else jnp.asarray(a)
    xv = cplx.from_complex(x) if mode == "split" else jnp.asarray(x)
    u = dense.cholesky(v, "krc", "r", "c")
    y = dense.trsm(2.0, u, "krc", "r", "c", xv, "krn", "kcn")
    un = as_np(u)
    yn = as_np(y)
    # U y = 2 x
    np.testing.assert_allclose(np.einsum("krc,kcn->krn", un, yn), 2.0 * x,
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("mode", ["real", "complex", "split"])
def test_gesm_solves(mode):
    rng = np.random.default_rng(2)
    a = hpd_batch(rng, (2,), 5, complex_=(mode != "real"))  # invertible
    x = rng.standard_normal((2, 5, 3))
    if mode != "real":
        x = x + 1j * rng.standard_normal((2, 5, 3))
    v = cplx.from_complex(a) if mode == "split" else jnp.asarray(a)
    xv = cplx.from_complex(x) if mode == "split" else jnp.asarray(x)
    y = dense.gesm(1.0, v, "krc", "r", "c", xv, "krn", "kcn")
    yn = as_np(y)
    np.testing.assert_allclose(np.einsum("krc,kcn->krn", a, yn), x,
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("mode", ["real", "complex", "split"])
def test_inversion(mode):
    rng = np.random.default_rng(3)
    a = hpd_batch(rng, (4,), 3, complex_=(mode != "real"))
    v = cplx.from_complex(a) if mode == "split" else jnp.asarray(a)
    inv = dense.inversion(v, "krc", "r", "c")
    got = np.einsum("krc,kcs->krs", a, as_np(inv))
    want = np.broadcast_to(np.eye(3), (4, 3, 3))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_multilabel_rows_cols():
    """Rows/cols each split over two labels (like the reference's
    "sc"/"SC" spin-color pairs)."""
    rng = np.random.default_rng(4)
    a = hpd_batch(rng, (3,), 6, complex_=False)          # k, 6, 6
    a6 = a.reshape(3, 2, 3, 2, 3)                         # k s c S C
    u = dense.cholesky(jnp.asarray(a6), "kscSC", "sc", "SC")
    un = np.asarray(u).reshape(3, 6, 6)
    np.testing.assert_allclose(np.swapaxes(un, -1, -2) @ un, a,
                               rtol=1e-10, atol=1e-10)


def test_sharded_batch_cholesky():
    """Batch label sharded over the mesh: each device factorizes its own
    matrices (the reference reorders to rank-local batches; GSPMD keeps
    them local automatically)."""
    rng = np.random.default_rng(5)
    a = hpd_batch(rng, (8,), 4, complex_=False)
    mesh = par.make_mesh({"k": 8})
    ad = jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("k", None, None)))
    u = jax.jit(lambda v: dense.cholesky(v, "krc", "r", "c"))(ad)
    un = np.asarray(u)
    np.testing.assert_allclose(np.swapaxes(un, -1, -2) @ un, a,
                               rtol=1e-10, atol=1e-10)


def test_sharded_trsm_gesm_inversion():
    """Batch label sharded over the mesh for the three remaining dense
    ops (round-2 VERDICT item 9 — the reference's reorder-to-local
    applies to all four solvers, dense.h:672-808): each device solves its
    own batch entries under GSPMD."""
    rng = np.random.default_rng(6)
    a = hpd_batch(rng, (8,), 4, complex_=False)
    x = rng.standard_normal((8, 4, 3))
    mesh = par.make_mesh({"k": 8})
    sh = NamedSharding(mesh, P("k", None, None))
    ad = jax.device_put(jnp.asarray(a), sh)
    xd = jax.device_put(jnp.asarray(x), sh)

    u = dense.cholesky(ad, "krc", "r", "c")
    y = jax.jit(lambda u_, x_: dense.trsm(
        1.0, u_, "krc", "r", "c", x_, "krn", "kcn"))(u, xd)
    np.testing.assert_allclose(
        np.einsum("krc,kcn->krn", np.asarray(u), np.asarray(y)), x,
        rtol=1e-9, atol=1e-9)

    y2 = jax.jit(lambda a_, x_: dense.gesm(
        1.0, a_, "krc", "r", "c", x_, "krn", "kcn"))(ad, xd)
    np.testing.assert_allclose(
        np.einsum("krc,kcn->krn", a, np.asarray(y2)), x,
        rtol=1e-9, atol=1e-9)

    inv = jax.jit(lambda a_: dense.inversion(a_, "krc", "r", "c"))(ad)
    got = np.einsum("krc,kcs->krs", a, np.asarray(inv))
    np.testing.assert_allclose(
        got, np.broadcast_to(np.eye(4), (8, 4, 4)), rtol=1e-9, atol=1e-9)


def test_trsm_matrix_axis_sharded():
    """Adversarial sharding for trsm/gesm: the matrix ROW axis sharded
    over the mesh (dense.h:672-808 reorders this to local; GSPMD must
    still solve correctly, typically via an all-gather of the factor)."""
    rng = np.random.default_rng(7)
    a = hpd_batch(rng, (2,), 8, complex_=False)
    x = rng.standard_normal((2, 8, 5))
    mesh = par.make_mesh({"r": 8})
    ad = jax.device_put(jnp.asarray(a),
                        NamedSharding(mesh, P(None, "r", None)))
    xd = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, P(None, "r", None)))
    u = dense.cholesky(ad, "krc", "r", "c")
    y = dense.trsm(1.0, u, "krc", "r", "c", xd, "krn", "kcn")
    np.testing.assert_allclose(
        np.einsum("krc,kcn->krn", np.asarray(u), np.asarray(y)), x,
        rtol=1e-8, atol=1e-8)
    y2 = dense.gesm(1.0, ad, "krc", "r", "c", xd, "krn", "kcn")
    np.testing.assert_allclose(
        np.einsum("krc,kcn->krn", a, np.asarray(y2)), x,
        rtol=1e-8, atol=1e-8)
    inv = dense.inversion(ad, "krc", "r", "c")
    np.testing.assert_allclose(
        np.einsum("krc,kcs->krs", a, np.asarray(inv)),
        np.broadcast_to(np.eye(8), (2, 8, 8)), rtol=1e-8, atol=1e-8)


def test_cholesky_matrix_axis_sharded():
    """Adversarial sharding: a MATRIX axis sharded over the mesh (the
    case the reference's prepare_for_cholesky reorders away,
    dense.h:504-569) — GSPMD must still produce the correct factor."""
    import numpy as np

    from superbblas_tpu.dense import cholesky

    rng = np.random.default_rng(0)
    a = rng.standard_normal((6, 8, 8))
    a = a @ np.swapaxes(a, -1, -2) + 8 * np.eye(8)
    mesh = par.make_mesh({"r": 8})
    ad = jax.device_put(jnp.asarray(a),
                        NamedSharding(mesh, P(None, "r", None)))
    u = cholesky(ad, "ksc", "s", "c")
    want = np.linalg.cholesky(a).swapaxes(-1, -2)  # upper factor
    np.testing.assert_allclose(np.asarray(u), np.triu(np.asarray(u)),
                               atol=1e-10)
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(u), -1, -2) @ np.asarray(u), a, atol=1e-8)
