"""Sharded S3T checkpointing (save_sharded / load_sharded).

Oracle: round-trips through the byte-identical S3T format, cross-checked
against the host-side save/load path — the parallel-IO semantics of the
reference (MPI-IO collective writes, storage.h:202-342; per-rank
intersection reads, storage.h:1110-1186).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from superbblas_tpu import cplx, storage as st
from superbblas_tpu import parallel as par


@pytest.fixture(scope="module")
def mesh():
    return par.make_mesh({"X": 4, "Y": 2})


def test_sharded_roundtrip_and_reshard(tmp_path, mesh):
    rng = np.random.default_rng(0)
    xg = rng.standard_normal((8, 8, 6))
    x = jax.device_put(jnp.asarray(xg),
                       NamedSharding(mesh, P("X", "Y", None)))

    path = str(tmp_path / "ck.s3t")
    sto = st.create_storage(path, "xyn", (8, 8, 6), dtype=np.float64,
                            checksum=2)
    st.save_sharded(sto, x, "xyn")
    st.close_storage(sto)

    # reopen: checksums verify, host load reproduces the global array
    sto2 = st.open_storage(path, mode="r")
    st.check_or_write_checksums(sto2)
    assert len(sto2.blocks) == 8           # one block per shard
    host = st.load(1.0, sto2, np.zeros((8, 8, 6)), "xyn")
    np.testing.assert_array_equal(host, xg)

    # load directly into a DIFFERENT sharding (reshard through the file)
    new_sh = NamedSharding(mesh, P("Y", "X", None))
    y = st.load_sharded(sto2, new_sh)
    np.testing.assert_array_equal(np.asarray(y), xg)
    assert y.sharding == new_sh
    st.close_storage(sto2)


def test_sharded_complex_carray(tmp_path, mesh):
    rng = np.random.default_rng(1)
    re = rng.standard_normal((8, 4, 4))
    im = rng.standard_normal((8, 4, 4))
    sh = NamedSharding(mesh, P("X", None, None))
    x = cplx.CArray(jax.device_put(jnp.asarray(re), sh),
                    jax.device_put(jnp.asarray(im), sh))

    path = str(tmp_path / "ck_c.s3t")
    sto = st.create_storage(path, "xyn", (8, 4, 4), dtype=np.complex128,
                            checksum=1)
    st.save_sharded(sto, x, "xyn")
    st.close_storage(sto)

    sto2 = st.open_storage(path, mode="r")
    st.check_or_write_checksums(sto2)
    out = st.load_sharded(sto2, sh)
    np.testing.assert_allclose(np.asarray(out.re), re, atol=0)
    np.testing.assert_allclose(np.asarray(out.im), im, atol=0)
    st.close_storage(sto2)


def test_sharded_replicated_writes_once(tmp_path, mesh):
    xg = np.arange(24.0).reshape(4, 6)
    x = jax.device_put(jnp.asarray(xg), NamedSharding(mesh, P(None, None)))
    path = str(tmp_path / "ck_r.s3t")
    sto = st.create_storage(path, "xy", (4, 6), dtype=np.float64)
    st.save_sharded(sto, x, "xy")
    assert len(sto.blocks) == 1           # replicated -> single block
    st.close_storage(sto)
    sto2 = st.open_storage(path, mode="r")
    got = st.load(1.0, sto2, np.zeros((4, 6)), "xy")
    np.testing.assert_array_equal(got, xg)
    st.close_storage(sto2)


def test_sharding_mismatch_raises(tmp_path, mesh):
    x1 = jax.device_put(jnp.ones((8, 8)), NamedSharding(mesh, P("X", "Y")))
    x2 = jax.device_put(jnp.ones((8, 8)), NamedSharding(mesh, P("Y", "X")))
    path = str(tmp_path / "ck_m.s3t")
    sto = st.create_storage(path, "xy", (8, 8), dtype=np.float64)
    st.save_sharded(sto, x1, "xy")
    with pytest.raises(ValueError, match="no declared block"):
        st.save_sharded(sto, x2, "xy")
    st.close_storage(sto)


def test_async_saves(tmp_path, mesh):
    rng = np.random.default_rng(4)
    xg = rng.standard_normal((8, 8))
    x = jax.device_put(jnp.asarray(xg), NamedSharding(mesh, P("X", "Y")))

    p1 = str(tmp_path / "a.s3t")
    sto = st.create_storage(p1, "xy", (8, 8), dtype=np.float64, checksum=2)
    fut = st.save_sharded_async(sto, x, "xy")
    fut.result()
    st.close_storage(sto)
    back = st.load(1.0, st.open_storage(p1, "r"), np.zeros((8, 8)), "xy")
    np.testing.assert_array_equal(back, xg)

    p2 = str(tmp_path / "b.s3t")
    sto2 = st.create_storage(p2, "xy", (8, 8), dtype=np.float64)
    st.append_blocks(sto2, [((0, 0), (8, 8))])
    fut = st.save_async(1.0, jnp.asarray(xg), "xy", sto2, "xy")
    fut.result()
    st.close_storage(sto2)
    back = st.load(1.0, st.open_storage(p2, "r"), np.zeros((8, 8)), "xy")
    np.testing.assert_array_equal(back, xg)
