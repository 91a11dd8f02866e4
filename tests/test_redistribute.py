"""Explicit all_to_all redistribution + halo exchange tests.

Oracle: host-side pack/unpack of the global array (the same strategy as
the reference's mock-index verifier for its MPI layer, dist.h:1919-2116).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from superbblas_tpu import parallel as par
from superbblas_tpu.parallel import redistribute as R
from superbblas_tpu.parallel.halo import crop_halos, exchange_halos


@pytest.fixture(scope="module")
def mesh1d():
    return Mesh(np.asarray(jax.devices()[:8]), axis_names=("p",))


def put(stack, mesh):
    spec = P("p", *([None] * (stack.ndim - 1)))
    return jax.device_put(jnp.asarray(stack), NamedSharding(mesh, spec))


def run_case(mesh1d, src_part, dst_part, x, copy_add="copy"):
    stack = R.pack_global(x, src_part)
    out = R.redistribute_explicit(put(stack, mesh1d), src_part, dst_part,
                                  mesh1d, copy_add=copy_add)
    return R.unpack_global(np.asarray(out), dst_part)


def test_grid_to_grid(mesh1d):
    dim = (8, 8)
    src = par.basic_partitioning("xy", dim, (4, 2))
    dst = par.basic_partitioning("xy", dim, (2, 4))
    x = np.arange(64, dtype=np.float32).reshape(dim)
    got = run_case(mesh1d, src, dst, x)
    np.testing.assert_array_equal(got, x)


def test_uneven_partition(mesh1d):
    """Uneven splits (remainder on first ranks) — inexpressible in GSPMD."""
    dim = (10, 3)
    src = par.basic_partitioning("xy", dim, (8, 1))
    dst = par.basic_partitioning("xy", dim, (1, 1), nprocs=8)  # on rank 0
    x = np.random.default_rng(0).standard_normal(dim).astype(np.float32)
    got = run_case(mesh1d, src, dst, x)
    np.testing.assert_array_equal(got, x)


def test_replicated_source(mesh1d):
    dim = (8, 4)
    src = par.basic_partitioning("xy", dim, (1, 1), nprocs=8, replicate=True)
    dst = par.basic_partitioning("xy", dim, (4, 2))
    x = np.random.default_rng(1).standard_normal(dim).astype(np.float32)
    got = run_case(mesh1d, src, dst, x)
    np.testing.assert_array_equal(got, x)


def test_halo_extended_destination(mesh1d):
    """ext_power destination: every rank receives core + wrap halo."""
    dim = (16,)
    src = par.basic_partitioning("x", dim, (8,))
    dst = par.basic_partitioning("x", dim, (8,), ext_power=(1,))
    x = np.arange(16, dtype=np.float32)
    stack = R.pack_global(x, src)
    out = np.asarray(R.redistribute_explicit(put(stack, mesh1d), src, dst,
                                             mesh1d))
    for r in range(8):
        frm, size = dst.boxes[r]
        want = x[(np.arange(frm[0], frm[0] + size[0])) % 16]
        np.testing.assert_array_equal(out[r, :size[0]], want)


def test_add_semantics_with_replication(mesh1d):
    """copy_add='add': overlapping sources accumulate multiplicities
    (reference repetition handling, dist.h:2123)."""
    dim = (8,)
    # every rank holds the full vector
    src = par.basic_partitioning("x", dim, (1,), nprocs=8, replicate=True)
    dst = par.basic_partitioning("x", dim, (8,))
    x = np.ones(dim, dtype=np.float32)
    got = run_case(mesh1d, src, dst, x, copy_add="add")
    np.testing.assert_array_equal(got, 8 * np.ones(dim))


def test_matches_gspmd_resharding(mesh1d):
    """Cross-check the explicit path against GSPMD device_put."""
    dim = (8, 8, 4)
    src = par.basic_partitioning("xyz", dim, (8, 1, 1))
    dst = par.basic_partitioning("xyz", dim, (2, 4, 1))
    x = np.random.default_rng(2).standard_normal(dim).astype(np.float32)
    got = run_case(mesh1d, src, dst, x)
    # GSPMD path
    s_src = par.partition_sharding(src, "xyz")
    s_dst = par.partition_sharding(dst, "xyz")
    xd = jax.device_put(jnp.asarray(x), s_src)
    want = np.asarray(jax.device_put(xd, s_dst))
    np.testing.assert_array_equal(got, want)


def test_exchange_halos_values(mesh1d):
    x = np.arange(16, dtype=np.float32)
    spec = P("p")
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh1d, spec))
    ext = np.asarray(exchange_halos(xd, mesh1d, spec, {0: 1}))
    # each shard (2 elems) becomes 4: [left, a, b, right]
    ext = ext.reshape(8, 4)
    for r in range(8):
        lo, a, b, hi = ext[r]
        assert a == 2 * r and b == 2 * r + 1
        assert lo == (2 * r - 1) % 16
        assert hi == (2 * r + 2) % 16


def test_crop_halos():
    a = jnp.arange(6.0)
    out = crop_halos(a, {0: 1})
    np.testing.assert_array_equal(np.asarray(out), [1, 2, 3, 4])
