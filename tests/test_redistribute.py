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


def test_fuzz_random_toroidal_partitions(mesh1d):
    """Property sweep: random (possibly wrapping, overlapping, uneven)
    src partitions that cover the lattice, random dst boxes, both copy
    and add semantics — the breadth the reference's SB_DEBUG=2 mock-index
    layer exercises across its whole test matrix (dist.h:1919-2116)."""
    from superbblas_tpu.parallel import Partition

    rng = np.random.default_rng(1234)
    dim = (8, 6)
    n = 8

    def random_covering_partition():
        # start from an uneven slab covering, then jitter starts
        # toroidally (still a covering since sizes are kept)
        cuts = sorted(rng.choice(np.arange(1, dim[0]), size=n - 1,
                                 replace=True))
        starts = [0] + [int(c) for c in cuts]
        sizes = [(starts[i + 1] if i + 1 < n else dim[0]) - starts[i]
                 for i in range(n)]
        shift = int(rng.integers(0, dim[0]))
        boxes = tuple(((int((s + shift) % dim[0]), 0), (int(sz), dim[1]))
                      for s, sz in zip(starts, sizes))
        return Partition(dim=dim, boxes=boxes)

    def random_partition():
        boxes = []
        for _ in range(n):
            if rng.random() < 0.15:
                boxes.append(((0, 0), (0, 0)))     # empty
                continue
            f = (int(rng.integers(0, dim[0])), int(rng.integers(0, dim[1])))
            s = (int(rng.integers(1, dim[0] + 1)),
                 int(rng.integers(1, dim[1] + 1)))
            boxes.append((f, s))                   # may wrap and overlap
        return Partition(dim=dim, boxes=tuple(boxes))

    for case in range(6):
        src = random_covering_partition()
        dst = random_partition()
        x = rng.standard_normal(dim)
        got = run_case(mesh1d, src, dst, x)
        # oracle: every dst box must hold the global values
        for r, (frm, size) in enumerate(dst.boxes):
            if int(np.prod(size)) == 0:
                continue
            idx = np.ix_(*[np.arange(f, f + s) % d
                           for f, s, d in zip(frm, size, dim)])
            want = x[idx]
            stack = R.pack_global(x, src)  # only to reuse shapes
            # reconstruct this rank's received block from the op output
            out_stack = R.redistribute_explicit(
                put(R.pack_global(x, src), mesh1d), src, dst, mesh1d)
            blk = np.asarray(out_stack)[r][tuple(slice(0, s) for s in size)]
            np.testing.assert_allclose(blk, want, atol=1e-12,
                                       err_msg=f"case {case} rank {r}")


def test_ragged_method_matches_dense(mesh1d):
    """The ragged-layout executor (per-peer variable counts — emulated on
    CPU, lax.ragged_all_to_all on TPU) produces identical results to the
    dense tiled path on every fuzz shape (the MPI_Alltoallv analog,
    dist.h:1502-1548)."""
    from superbblas_tpu.parallel import Partition

    rng = np.random.default_rng(77)
    dim = (8, 6)
    n = 8
    for case in range(4):
        boxes_src, boxes_dst = [], []
        for _ in range(n):
            f = (int(rng.integers(0, dim[0])), int(rng.integers(0, dim[1])))
            s = (int(rng.integers(1, dim[0] + 1)),
                 int(rng.integers(1, dim[1] + 1)))
            boxes_src.append((f, s))
            f = (int(rng.integers(0, dim[0])), int(rng.integers(0, dim[1])))
            s = (int(rng.integers(1, dim[0] + 1)),
                 int(rng.integers(1, dim[1] + 1)))
            boxes_dst.append((f, s))
        src = Partition(dim=dim, boxes=tuple(boxes_src))
        dst = Partition(dim=dim, boxes=tuple(boxes_dst))
        x = rng.standard_normal(dim)
        stack = put(R.pack_global(x, src), mesh1d)
        for mode in ("copy", "add"):
            dense = np.asarray(R.redistribute_explicit(
                stack, src, dst, mesh1d, copy_add=mode, method="dense"))
            ragged = np.asarray(R.redistribute_explicit(
                stack, src, dst, mesh1d, copy_add=mode, method="ragged"))
            np.testing.assert_array_equal(ragged, dense,
                                          err_msg=f"case {case} {mode}")


def test_masked_explicit_fuzz(mesh1d, monkeypatch):
    """Masked copies through the REAL collective executor (round-2
    VERDICT item 5): random wrapped/overlapping partitions + random
    global masks vs a per-site host oracle, both semantics, with the
    SBT_DEBUG>=2 mock-index replay active on the last case (the
    reference's mask-aware plans + ns_copy_test, dist.h:1852-1916,
    1919-2116)."""
    from superbblas_tpu import flags
    from superbblas_tpu.parallel import Partition

    rng = np.random.default_rng(777)
    dim = (8, 6)
    n = 8
    for case in range(4):
        boxes_src, boxes_dst = [], []
        for _ in range(n):
            f = (int(rng.integers(0, dim[0])), int(rng.integers(0, dim[1])))
            s = (int(rng.integers(1, dim[0] + 1)),
                 int(rng.integers(1, dim[1] + 1)))
            boxes_src.append((f, s))
            f = (int(rng.integers(0, dim[0])), int(rng.integers(0, dim[1])))
            s = (int(rng.integers(1, dim[0] + 1)),
                 int(rng.integers(1, dim[1] + 1)))
            boxes_dst.append((f, s))
        src = Partition(dim=dim, boxes=tuple(boxes_src))
        dst = Partition(dim=dim, boxes=tuple(boxes_dst))
        mask0 = rng.random(dim) < 0.7
        mask1 = rng.random(dim) < 0.7
        x = rng.standard_normal(dim)
        stack = put(R.pack_global(x, src), mesh1d)

        if case == 3:
            monkeypatch.setenv("SBT_DEBUG", "2")
            flags.clear_cache()
            R.make_plan.cache_clear()
        try:
            for mode in ("copy", "add"):
                outs = {"auto": np.asarray(R.redistribute_explicit(
                    stack, src, dst, mesh1d, copy_add=mode,
                    mask_src=mask0, mask_dst=mask1))}
                # both masked strategies: boxes (mask-multiply around the
                # unmasked piece plan) and runs (element filtering)
                for pck in ("boxes", "runs"):
                    plan = R.RedistributionPlan(
                        src, dst, mode, pack=pck,
                        mask_src=mask0, mask_dst=mask1)
                    assert plan.pack == pck
                    assert plan.mask_mult == (pck == "boxes")
                    outs[pck] = np.asarray(
                        R._execute(plan, stack, mesh1d, "p", "dense"))
                # per-site oracle: with GLOBAL masks every replica shares
                # the mask value, so copy = x iff covered & m0 & m1;
                # add = x * (#covering src boxes) * m0 * m1
                for j, (dfrm, dsz) in enumerate(dst.boxes):
                    coords = np.meshgrid(
                        *[np.arange(f, f + s) % d
                          for f, s, d in zip(dfrm, dsz, dim)],
                        indexing="ij")
                    gx = x[tuple(coords)]
                    ncov = np.zeros(dsz, dtype=np.int64)
                    for sfrm, ssz in src.boxes:
                        inbox = np.ones(dsz, dtype=bool)
                        for c, f, z, d in zip(coords, sfrm, ssz, dim):
                            inbox &= ((c - f) % d) < z
                        ncov += inbox
                    m = mask0[tuple(coords)] & mask1[tuple(coords)]
                    if mode == "copy":
                        want = np.where(m & (ncov > 0), gx, 0.0)
                    else:
                        want = gx * ncov * m
                    for label, out in outs.items():
                        blk = out[j][tuple(slice(0, s) for s in dsz)]
                        np.testing.assert_allclose(
                            blk, want, atol=1e-12,
                            err_msg=f"case {case} {mode} {label} rank {j}")
        finally:
            if case == 3:
                monkeypatch.delenv("SBT_DEBUG", raising=False)
                flags.clear_cache()
                R.make_plan.cache_clear()


def test_masked_stacked_first_covering_rank(mesh1d):
    """STACKED (per-rank) masks: in copy mode the FIRST covering source
    rank is assigned the element; if ITS mask is off the element is
    dropped, not reassigned to a later covering rank (the reference
    filters plan indices after assignment, dist.h:944-970)."""
    from superbblas_tpu.parallel import Partition

    dim = (4,)
    n = 8
    full = ((0,), (4,))
    empty = ((0,), (0,))
    src = Partition(dim=dim, boxes=(full, full) + (empty,) * 6)
    dst = Partition(dim=dim, boxes=(full,) + (empty,) * 7)
    x = np.arange(1.0, 5.0)
    stack = put(R.pack_global(x, src), mesh1d)
    ms = np.zeros((n, 4), dtype=bool)
    ms[0] = [False, True, False, True]   # first covering rank
    ms[1] = [True, True, True, True]     # later replica: must NOT rescue
    for pck in ("boxes", "runs"):
        plan = R.RedistributionPlan(src, dst, "copy", pack=pck,
                                    mask_src=ms)
        out = np.asarray(R._execute(plan, stack, mesh1d, "p", "dense"))
        np.testing.assert_array_equal(out[0], [0.0, 2.0, 0.0, 4.0],
                                      err_msg=pck)
        # add mode counts every unmasked replica
        plan2 = R.RedistributionPlan(src, dst, "add", pack=pck,
                                     mask_src=ms)
        out2 = np.asarray(R._execute(plan2, stack, mesh1d, "p", "dense"))
        np.testing.assert_array_equal(out2[0], [1.0, 4.0, 3.0, 8.0],
                                      err_msg=pck)


def _rand_boxes(rng, dim, n):
    boxes = []
    for _ in range(n):
        f = tuple(int(rng.integers(0, d)) for d in dim)
        s = tuple(int(rng.integers(1, d + 1)) for d in dim)
        boxes.append((f, s))
    return tuple(boxes)


def test_permuting_converting_explicit_fuzz(mesh1d):
    """ONE-plan label-permuting + alpha-scaling + precision-converting
    explicit copy (round-3 VERDICT missing #1/#2): the dst partition
    lives on the PERMUTED lattice, moved values are scaled and converted
    f32 -> f64 inside the same executor call, fuzzed against a per-site
    oracle on wrapped/overlapping partitions, both semantics and both
    exchange methods.  Reference: dummy_normalize_copy/translate_range
    (dist.h:2455-2530, 596-654) + the templated alpha copy
    (dist.h:3534-3583)."""
    from superbblas_tpu.parallel import Partition

    rng = np.random.default_rng(4242)
    dim = (8, 6, 4)          # distinct extents catch axis mixups
    perm = (2, 0, 1)         # dst axis k <- src axis perm[k]
    inv = [0] * 3
    for k, p in enumerate(perm):
        inv[p] = k
    dim_d = tuple(dim[p] for p in perm)
    n = 8
    alpha = -1.75
    for case in range(3):
        src = Partition(dim=dim, boxes=_rand_boxes(rng, dim, n))
        dst = Partition(dim=dim_d, boxes=_rand_boxes(rng, dim_d, n))
        x = rng.standard_normal(dim).astype(np.float32)
        xt = np.transpose(x, perm)          # xt[c] = x at src coords
        stack = put(R.pack_global(x, src), mesh1d)
        for mode in ("copy", "add"):
            for method in ("dense", "ragged"):
                out = np.asarray(R.redistribute_explicit(
                    stack, src, dst, mesh1d, copy_add=mode, method=method,
                    perm=perm, alpha=alpha, out_dtype=np.float64))
                assert out.dtype == np.float64
                for j, (dfrm, dsz) in enumerate(dst.boxes):
                    coords = np.meshgrid(
                        *[np.arange(f, f + s) % d
                          for f, s, d in zip(dfrm, dsz, dim_d)],
                        indexing="ij")
                    gx = xt[tuple(coords)].astype(np.float64)
                    coords_s = [coords[inv[a]] for a in range(3)]
                    ncov = np.zeros(dsz, dtype=np.int64)
                    for sfrm, ssz in src.boxes:
                        inbox = np.ones(dsz, dtype=bool)
                        for c, f, z, d in zip(coords_s, sfrm, ssz, dim):
                            inbox &= ((c - f) % d) < z
                        ncov += inbox
                    if mode == "copy":
                        want = np.where(ncov > 0, alpha * gx, 0.0)
                    else:
                        want = alpha * gx * ncov
                    blk = out[j][tuple(slice(0, s) for s in dsz)]
                    np.testing.assert_allclose(
                        blk, want, atol=1e-6,
                        err_msg=f"case {case} {mode} {method} rank {j}")


def test_permuting_masked_and_auto(mesh1d):
    """Permuting plans compose with masks (dst mask in DESTINATION axis
    order) and with the redistribute_auto global entry (order_dst +
    fused transpose/scale/convert on both the GSPMD fast path and the
    explicit fallback)."""
    from superbblas_tpu.parallel import Partition

    rng = np.random.default_rng(7)
    dim = (6, 4)
    perm = (1, 0)
    dim_d = (4, 6)
    n = 8
    src = Partition(dim=dim, boxes=_rand_boxes(rng, dim, n))
    dst = Partition(dim=dim_d, boxes=_rand_boxes(rng, dim_d, n))
    x = rng.standard_normal(dim).astype(np.float32)
    m0 = rng.random(dim) < 0.6
    m1 = rng.random(dim_d) < 0.6
    stack = put(R.pack_global(x, src), mesh1d)
    out = np.asarray(R.redistribute_explicit(
        stack, src, dst, mesh1d, copy_add="copy", perm=perm,
        mask_src=m0, mask_dst=m1, alpha=3.0, out_dtype=np.float64))
    xt = np.transpose(x, perm)
    for j, (dfrm, dsz) in enumerate(dst.boxes):
        coords = np.meshgrid(*[np.arange(f, f + s) % d
                               for f, s, d in zip(dfrm, dsz, dim_d)],
                             indexing="ij")
        coords_s = [coords[1], coords[0]]
        ncov = np.zeros(dsz, dtype=np.int64)
        for sfrm, ssz in src.boxes:
            inbox = np.ones(dsz, dtype=bool)
            for c, f, z, d in zip(coords_s, sfrm, ssz, dim):
                inbox &= ((c - f) % d) < z
            ncov += inbox
        m = m0[tuple(coords_s)] & m1[tuple(coords)]
        want = np.where(m & (ncov > 0), 3.0 * xt[tuple(coords)], 0.0)
        blk = out[j][tuple(slice(0, s) for s in dsz)]
        np.testing.assert_allclose(blk, want, atol=1e-6,
                                   err_msg=f"rank {j}")

    # redistribute_auto global form: explicit fallback (irregular dst)
    got = np.asarray(R.redistribute_auto(
        x, src, dst, order="xy", order_dst="yx",
        mesh=mesh1d, alpha=2.0, out_dtype=np.float64))
    assert got.dtype == np.float64 and got.shape == dim_d
    # later ranks win on unpack overlap — check sites covered by the
    # LAST covering dst rank against 2 * x^T there; every covered site
    # must carry either 0 (uncovered src) or the scaled value
    xt64 = 2.0 * np.transpose(x, perm).astype(np.float64)
    cov_src = np.zeros(dim, dtype=bool)
    for sfrm, ssz in src.boxes:
        idx = np.ix_(*[np.arange(f, f + s) % d
                       for f, s, d in zip(sfrm, ssz, dim)])
        cov_src[idx] = True
    want_glob = np.where(np.transpose(cov_src, perm), xt64, 0.0)
    cov_dst = np.zeros(dim_d, dtype=bool)
    for dfrm, dsz in dst.boxes:
        idx = np.ix_(*[np.arange(f, f + s) % d
                       for f, s, d in zip(dfrm, dsz, dim_d)])
        cov_dst[idx] = True
    np.testing.assert_allclose(np.where(cov_dst, got, 0.0),
                               np.where(cov_dst, want_glob, 0.0),
                               atol=1e-6)

    # GSPMD fast path: regular full-cover partitions, fused
    # transpose+scale+convert via out_shardings
    srcg = par.basic_partitioning("xy", dim, (2, 4))
    dstg = par.basic_partitioning("yx", dim_d, (4, 2))
    got2 = np.asarray(R.redistribute_auto(
        x, srcg, dstg, order="xy", order_dst="yx",
        mesh=mesh1d, alpha=2.0, out_dtype=np.float64))
    np.testing.assert_allclose(got2, xt64, atol=1e-6)


def test_pack_strategies_match(mesh1d):
    """The "boxes" packer (per-rank static-copy programs under
    lax.switch) and the "runs" packer (blocked-run gather/scatter)
    produce identical results on wrapped/overlapping fuzz partitions,
    under both exchange methods and both copy semantics."""
    from superbblas_tpu.parallel import Partition

    rng = np.random.default_rng(515)
    dim = (8, 6)
    n = 8
    for case in range(3):
        boxes_src, boxes_dst = [], []
        for _ in range(n):
            f = (int(rng.integers(0, dim[0])), int(rng.integers(0, dim[1])))
            s = (int(rng.integers(1, dim[0] + 1)),
                 int(rng.integers(1, dim[1] + 1)))
            boxes_src.append((f, s))
            f = (int(rng.integers(0, dim[0])), int(rng.integers(0, dim[1])))
            s = (int(rng.integers(1, dim[0] + 1)),
                 int(rng.integers(1, dim[1] + 1)))
            boxes_dst.append((f, s))
        src = Partition(dim=dim, boxes=tuple(boxes_src))
        dst = Partition(dim=dim, boxes=tuple(boxes_dst))
        x = rng.standard_normal(dim)
        stack = put(R.pack_global(x, src), mesh1d)
        for mode in ("copy", "add"):
            outs = {}
            for pack in ("boxes", "runs"):
                plan = R.RedistributionPlan(src, dst, mode, pack=pack)
                assert plan.pack == pack
                for method in ("dense", "ragged"):
                    outs[(pack, method)] = np.asarray(
                        R._execute(plan, stack, mesh1d, "p", method))
            ref = outs[("boxes", "dense")]
            for key, got in outs.items():
                np.testing.assert_allclose(
                    got, ref, atol=1e-12,
                    err_msg=f"case {case} {mode} {key}")


def _simulate_plan(plan, stack):
    """Host-side execution of a plan's run descriptors (numpy): the
    reference-style mock replay used to validate plans at rank counts
    beyond the device mesh."""
    n = plan.n
    out = np.zeros((n,) + plan.dst_shape, dtype=stack.dtype)
    for j in range(n):
        dst_flat = out[j].reshape(-1)
        for i in range(n):
            si, di = plan.pair_elem_indices(i, j)
            vals = stack[i].reshape(-1)[si]
            if plan.copy_add == "copy":
                dst_flat[di] = vals
            else:
                dst_flat[di] += vals
    return out


@pytest.mark.parametrize("nrank", [32, 64])
def test_plan_scales_to_many_ranks(nrank):
    """Plan build + host-simulated execution at 32/64 ranks: the blocked
    plan must stay exact AND small — memory O(total run descriptors),
    not O(n^2 * max_fragment) elements (the round-1 scaling hole)."""
    from superbblas_tpu.parallel import Partition, basic_partitioning

    dim = (64, 32)
    rng = np.random.default_rng(nrank)
    procs = {32: (8, 4), 64: (16, 4)}[nrank]
    src = basic_partitioning("xy", dim, (nrank, 1))
    dst = basic_partitioning("xy", dim, procs)
    plan = R.RedistributionPlan(src, dst, "copy")
    # the whole second axis is contiguous per fragment: runs are blocked
    assert plan.block >= dst.boxes[0][1][1], plan.block
    # plan memory: run descriptors + the n^2 count matrix, far below the
    # round-1 element-granularity [n, n, max_pair_elems] layout
    old_bytes = 2 * nrank * nrank * int(plan.counts.max()) * plan.block * 4
    assert plan.nbytes < old_bytes / 8, (plan.nbytes, old_bytes)

    x = rng.standard_normal(dim)
    got = _simulate_plan(plan, R.pack_global(x, src))
    np.testing.assert_array_equal(R.unpack_global(got, dst), x)

    # and a wrapped/uneven fuzz at the same rank count
    boxes = []
    for _ in range(nrank):
        f = (int(rng.integers(0, dim[0])), int(rng.integers(0, dim[1])))
        s = (int(rng.integers(1, dim[0] + 1)),
             int(rng.integers(1, dim[1] + 1)))
        boxes.append((f, s))
    dst2 = Partition(dim=dim, boxes=tuple(boxes))
    plan2 = R.RedistributionPlan(src, dst2, "copy")
    got2 = _simulate_plan(plan2, R.pack_global(x, src))
    for r, (frm, size) in enumerate(dst2.boxes):
        idx = np.ix_(*[np.arange(f, f + s) % d
                       for f, s, d in zip(frm, size, dim)])
        np.testing.assert_array_equal(
            got2[r][tuple(slice(0, s) for s in size)], x[idx])


def test_plan_scales_4d_lattice_64_ranks():
    """Plan build + host simulation on a REALISTIC 4D lattice at 64
    ranks (16^3 x 32 split 4x4x2x2): exactness, blocked runs, and a
    plan-build time guard (host-side numpy must stay sub-second)."""
    import time

    from superbblas_tpu.parallel import basic_partitioning

    dim = (16, 16, 16, 32)
    src = basic_partitioning("xyzt", dim, (4, 4, 2, 2))
    dst = basic_partitioning("xyzt", dim, (2, 2, 4, 4))
    t0 = time.perf_counter()
    plan = R.RedistributionPlan(src, dst, "copy")
    dt = time.perf_counter() - t0
    assert dt < 5.0, dt   # generous: guards against algorithmic regressions, not CI load
    assert plan.block >= 8, plan.block    # t-axis runs stay blocked
    x = np.random.default_rng(0).standard_normal(dim)
    got = _simulate_plan(plan, R.pack_global(x, src))
    np.testing.assert_array_equal(R.unpack_global(got, dst), x)


def test_degenerate_shapes(mesh1d):
    """Edge shapes through the full executor: size-1 axes, 1-D lattices,
    a destination equal to the source, and an all-empty destination."""
    from superbblas_tpu.parallel import Partition

    # size-1 axes
    dim = (8, 1, 3)
    src = par.basic_partitioning("xyz", dim, (8, 1, 1))
    dst = par.basic_partitioning("xyz", dim, (1, 1, 3), nprocs=8)
    x = np.random.default_rng(1).standard_normal(dim)
    got = run_case(mesh1d, src, dst, x)
    np.testing.assert_array_equal(got, x)

    # identity redistribution (src == dst): pure local pass-through
    got2 = run_case(mesh1d, src, src, x)
    np.testing.assert_array_equal(got2, x)

    # all-empty destination: a valid no-op plan
    empty = Partition(dim=dim, boxes=tuple(
        (((0,) * 3), ((0,) * 3)) for _ in range(8)))
    plan = R.RedistributionPlan(src, empty, "copy")
    assert int(plan.counts.sum()) == 0

    # 1-D lattice with wrap
    dim1 = (12,)
    src1 = par.basic_partitioning("x", dim1, (8,))
    dst1 = Partition(dim=dim1, boxes=tuple(
        ((int(3 * r) % 12,), (5,)) for r in range(8)))
    x1 = np.arange(12.0)
    stack = put(R.pack_global(x1, src1), mesh1d)
    out = np.asarray(R.redistribute_explicit(stack, src1, dst1, mesh1d))
    for r, (frm, size) in enumerate(dst1.boxes):
        want = x1[(np.arange(frm[0], frm[0] + size[0])) % 12]
        np.testing.assert_array_equal(out[r, :size[0]], want)


def test_plan_cache_byte_budget(monkeypatch):
    """Exceeding SBT_CACHEGB evicts least-recently-used plans and the
    cache reports its byte footprint (SB_CACHEGB analog,
    cache.h:238-265)."""
    from superbblas_tpu import flags
    from superbblas_tpu.parallel import basic_partitioning
    from superbblas_tpu.utils import report_cache_usage

    R.make_plan.cache_clear()
    plans = []
    for k in range(2, 7):
        src = basic_partitioning("xy", (8 * k, 8), (8, 1))
        dst = basic_partitioning("xy", (8 * k, 8), (1, 8))
        plans.append(R.make_plan(src, dst))
    per_plan = plans[0].nbytes
    assert R.make_plan.cache_info().currsize == 5

    # budget that holds only ~2 plans
    monkeypatch.setenv("SBT_CACHEGB", str(2.5 * per_plan / (1 << 30)))
    flags.clear_cache()
    try:
        src = basic_partitioning("xy", (8, 8), (8, 1))
        dst = basic_partitioning("xy", (8, 8), (1, 8))
        R.make_plan(src, dst)          # insert triggers eviction
        info = R.make_plan.cache_info()
        assert info.currsize < 6
        assert info.bytes <= 2.5 * per_plan + per_plan
        stats = report_cache_usage()
        assert stats["redistribution_plans"]["bytes"] == info.bytes
    finally:
        flags.clear_cache()
        R.make_plan.cache_clear()


def test_redist_method_env_flag(mesh1d, monkeypatch):
    """SBT_REDIST_METHOD forces the exchange flavor (SB_USE_ALLTOALL
    analog): both values produce identical results through the public
    entry."""
    from superbblas_tpu import flags
    from superbblas_tpu.parallel.redistribute import _resolve_method

    dim = (8, 8)
    src = par.basic_partitioning("xy", dim, (4, 2))
    dst = par.basic_partitioning("xy", dim, (2, 4))
    x = np.random.default_rng(5).standard_normal(dim)
    stack = put(R.pack_global(x, src), mesh1d)
    outs = {}
    for m in ("ragged", "dense"):
        monkeypatch.setenv("SBT_REDIST_METHOD", m)
        flags.clear_cache()
        try:
            assert _resolve_method("auto", mesh1d) == m
            outs[m] = np.asarray(R.redistribute_explicit(
                stack, src, dst, mesh1d))
        finally:
            flags.clear_cache()
    np.testing.assert_array_equal(outs["ragged"], outs["dense"])
    np.testing.assert_array_equal(R.unpack_global(outs["dense"], dst), x)


def test_debug_ladder_catches_corrupt_plan(mesh1d, monkeypatch):
    """SBT_DEBUG>=2 replays every explicit redistribution with
    index-valued payloads through the REAL collective path; an
    intentionally corrupted plan must be caught by the ladder, not by
    downstream tests (ns_copy_test analog, dist.h:1919-2116)."""
    from superbblas_tpu import flags

    dim = (8, 8)
    src = par.basic_partitioning("xy", dim, (4, 2))
    dst = par.basic_partitioning("xy", dim, (2, 4))
    x = np.arange(64, dtype=np.float32).reshape(dim)
    stack = put(R.pack_global(x, src), mesh1d)

    monkeypatch.setenv("SBT_DEBUG", "2")
    flags.clear_cache()
    try:
        # sane plan passes the replay
        R.make_plan.cache_clear()
        out = R.redistribute_explicit(stack, src, dst, mesh1d)
        np.testing.assert_array_equal(R.unpack_global(np.asarray(out), dst),
                                      x)
        # corrupt the cached plan: swap the destination placement of two
        # equal-shaped pieces headed to the same rank (coverage stays
        # disjoint, values land at the wrong sites — only the mock-index
        # replay can catch it)
        plan = R.make_plan(src, dst)
        done = False
        keys = sorted(plan.pair_pieces, key=lambda k: k[1])
        for a in range(len(keys)):
            for b in range(a + 1, len(keys)):
                ka, kb = keys[a], keys[b]
                if ka[1] != kb[1]:
                    continue
                pa, pb = plan.pair_pieces[ka], plan.pair_pieces[kb]
                if (pa[0, 2] == pb[0, 2]).all():
                    pa, pb = pa.copy(), pb.copy()
                    pa[0, 1], pb[0, 1] = pb[0, 1].copy(), pa[0, 1].copy()
                    plan.pair_pieces[ka], plan.pair_pieces[kb] = pa, pb
                    done = True
                    break
            if done:
                break
        assert done, "fixture: no equal-shaped piece pair to corrupt"
        plan._send_starts = plan._recv_starts = None  # derived layouts too
        plan._dense = None
        plan._inv_dense = plan._inv_ragged = None
        with pytest.raises(RuntimeError, match="debug replay mismatch"):
            R.redistribute_explicit(stack, src, dst, mesh1d)
    finally:
        flags.clear_cache()
        R.make_plan.cache_clear()


def test_unified_redistribute_entry(mesh1d):
    """parallel.redistribute_auto picks the path automatically (the single
    copy() entry of the reference, dist.h:3534): GSPMD device_put for
    NamedSharding-expressible destinations, the explicit collective path
    for uneven/wrapped ones, and the stacked-local form directly."""
    dim = (8, 8)
    x = np.random.default_rng(0).standard_normal(dim)
    xj = jnp.asarray(x)

    # regular grid -> GSPMD path (output carries the grid sharding)
    src = par.basic_partitioning("xy", dim, (4, 2))
    dst = par.basic_partitioning("xy", dim, (2, 4))
    out = par.redistribute_auto(xj, src, dst, order="xy")
    np.testing.assert_array_equal(np.asarray(out), x)
    assert not isinstance(out.sharding, jax.sharding.SingleDeviceSharding)

    # uneven destination -> explicit fallback, still exact
    dst_uneven = par.basic_partitioning("xy", (8, 8), (5, 1), nprocs=8)
    out2 = par.redistribute_auto(xj, src, dst_uneven, order="xy", mesh=mesh1d)
    np.testing.assert_array_equal(np.asarray(out2), x)

    # stacked-local form goes through the explicit path and stays stacked
    stack = put(R.pack_global(x, src), mesh1d)
    out3 = par.redistribute_auto(stack, src, dst, mesh=mesh1d)
    np.testing.assert_array_equal(
        R.unpack_global(np.asarray(out3), dst), x)

    # add semantics force the explicit path even on regular grids
    srcr = par.basic_partitioning("xy", dim, (1, 1), nprocs=8,
                                  replicate=True)
    out4 = par.redistribute_auto(jnp.ones(dim), srcr, dst, order="xy",
                            mesh=mesh1d, copy_add="add")
    np.testing.assert_array_equal(np.asarray(out4), 8 * np.ones(dim))


def test_redistribute_auto_partial_source_zeroes_uncovered(mesh1d):
    """Review regression: a src partition that does NOT cover the
    lattice must produce ZEROS in uncovered destinations (the explicit
    path / ns_copy_test semantics) — the GSPMD device_put shortcut would
    silently return the stale input values there, so it must not be
    taken."""
    from superbblas_tpu.parallel import Partition

    dim = (4, 4)
    src = Partition(dim=dim, boxes=(((0, 0), (2, 4)),) + tuple(
        ((0, 0), (0, 0)) for _ in range(7)))        # top half only
    dst = par.basic_partitioning("xy", dim, (1, 1), nprocs=8,
                                 replicate=True)    # GSPMD-expressible
    x = np.arange(16, dtype=np.float64).reshape(dim)
    out = np.asarray(par.redistribute_auto(jnp.asarray(x), src, dst,
                                           order="xy", mesh=mesh1d))
    want = x.copy()
    want[2:] = 0.0
    np.testing.assert_array_equal(out, want)


def test_redistribute_auto_rank_device_mismatch_raises():
    """Review regression: more partition ranks than devices must raise a
    clear error, not silently truncate the mesh (which crashed with an
    opaque IndexError)."""
    dim = (32, 4)
    src = par.basic_partitioning("xy", dim, (16, 1))
    dst = par.basic_partitioning("xy", dim, (5, 1), nprocs=16)
    x = jnp.zeros(dim)
    with pytest.raises(ValueError, match="16 ranks"):
        par.redistribute_auto(x, src, dst, order="xy")


def test_components_partition_redistribution(mesh1d):
    """Multi-component partitions (the reference's multiple devices per
    rank, dist.h:205-241; tests/bsr.cpp --components=2): each component
    box maps to its own mesh device and the explicit path moves data
    between a 4-proc x 2-component layout and a plain 8-way grid."""
    from superbblas_tpu.parallel import Partition, basic_partitioning

    dim = (8, 8)
    src = basic_partitioning("xy", dim, (4, 1), ncomponents=2)
    assert src.ncomponents == 2 and src.nprocs == 4 and len(src.boxes) == 8
    assert src.has_full_support() and not src.are_there_repetitions()

    dst = basic_partitioning("xy", dim, (1, 8))
    rng = np.random.default_rng(0)
    x = rng.standard_normal(dim)
    got = run_case(mesh1d, src, dst, x)
    np.testing.assert_array_equal(got, x)

    # and back
    got2 = run_case(mesh1d, dst, src, x)
    np.testing.assert_array_equal(got2, x)


def test_giant_plan_int64_metadata():
    """IndexType widening (the reference's automatic int -> size_t switch
    for giant tensors, tensor.h:1113-1129): a plan whose per-pair run
    counts exceed int32 BUILDS with 64-bit host metadata instead of
    raising; only executing a single >=2^31-run message raises, with a
    clear error."""
    from superbblas_tpu.parallel import Partition

    dim = (2 ** 32,)
    src = Partition(dim=dim, boxes=(((0,), dim),))
    dst = Partition(dim=dim, boxes=(((1,), dim),))   # unaligned: B = 1
    plan = R.RedistributionPlan(src, dst, "copy")
    assert plan.block == 1
    assert plan.counts.dtype == np.int64
    assert int(plan.counts[0, 0]) == 2 ** 32
    assert plan.counts_elems[0, 0] == 2 ** 32
    # the boxes packer carries piece descriptors (no run materialization)
    assert plan.pack == "boxes"


def test_masked_plan_pack_strategies():
    """Masked plans support BOTH packers (round-3 VERDICT item 2):
    pack='boxes' keeps the unmasked piece plan with mask multiplies
    (mask_mult; default — copy bandwidth), pack='runs' filters to
    element granularity (post-mask counts)."""
    from superbblas_tpu.parallel import Partition

    dim = (8,)
    src = Partition(dim=dim, boxes=(((0,), (4,)), ((4,), (4,))))
    dst = Partition(dim=dim, boxes=(((0,), (8,)), ((0,), (0,))))
    mask = np.ones(dim, bool)
    mask[::2] = False
    plan = R.RedistributionPlan(src, dst, "copy", pack="boxes",
                                mask_src=mask)
    assert plan.pack == "boxes" and plan.mask_mult
    # boxes keeps UNMASKED counts (masked-out sites travel as zeros)
    assert int(plan.counts_elems.sum()) == int(np.prod(dim))
    plan2 = R.RedistributionPlan(src, dst, "copy", pack="runs",
                                 mask_src=mask)
    assert plan2.pack == "runs" and not plan2.mask_mult
    # post-mask element totals drive the degeneration warning, not the
    # unmasked piece volumes
    assert int(plan2.counts_elems.sum()) == int(mask.sum())
    # default (auto) resolves to the boxes strategy at this piece count
    plan3 = R.RedistributionPlan(src, dst, "copy", mask_src=mask)
    assert plan3.pack == "boxes" and plan3.mask_mult


def test_validate_overlap_sweep():
    """The O(pieces) sweep in _validate catches overlapping copy-mode
    coverage without rasterizing the destination volume: tampered plans
    raise; axis-0-overlapping but axis-1-disjoint pieces pass."""
    from superbblas_tpu.parallel import Partition

    dim = (8, 8)
    src = Partition(dim=dim, boxes=(((0, 0), dim),))
    dst = Partition(dim=dim, boxes=(((0, 0), dim),))
    plan = R.RedistributionPlan(src, dst, "copy")
    plan._validate()   # the pristine plan is fine

    # same axis-0 rows, disjoint columns -> no overlap
    plan.pair_pieces[(0, 0)] = np.asarray(
        [[(0, 0), (0, 0), (8, 4)], [(0, 4), (0, 4), (8, 4)]])
    plan._validate()

    # genuine 2D overlap at (2:4, 2:4)
    plan.pair_pieces[(0, 0)] = np.asarray(
        [[(0, 0), (0, 0), (4, 4)], [(2, 2), (2, 2), (4, 4)]])
    with pytest.raises(ValueError, match="more than once"):
        plan._validate()

    # 1D: axis-0 overlap alone must trigger
    src1 = Partition(dim=(8,), boxes=(((0,), (8,)),))
    plan1 = R.RedistributionPlan(src1, src1, "copy")
    plan1.pair_pieces[(0, 0)] = np.asarray(
        [[(0,), (0,), (5,)], [(3,), (3,), (5,)]])
    with pytest.raises(ValueError, match="more than once"):
        plan1._validate()


def test_pack_global_device_jit_cache(mesh1d):
    """pack/unpack_global_device memoize their jitted closures per
    (partition, mesh/sharding) — jax.jit keys on function identity, so
    per-call closures would recompile the static slice/scatter graphs
    every invocation (review finding)."""
    from superbblas_tpu.parallel import Partition

    dim = (8, 4)
    part = Partition(dim=dim, boxes=tuple(
        (((2 * r) % 8, 0), (2, 4)) for r in range(8)))
    x = jnp.asarray(np.random.default_rng(3).standard_normal(dim))
    xg = jax.device_put(x, NamedSharding(mesh1d, P()))
    n0 = len(R._DEVICE_PACK_CACHE)
    s1 = R.pack_global_device(xg, part, mesh1d, "p")
    s2 = R.pack_global_device(xg, part, mesh1d, "p")
    assert len(R._DEVICE_PACK_CACHE) == n0 + 1   # one entry, two calls
    g1 = R.unpack_global_device(s1, part)
    g2 = R.unpack_global_device(s2, part)
    assert len(R._DEVICE_PACK_CACHE) == n0 + 2
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(x))


def test_perm_plan_piece_count_guard():
    """A label-permuting plan above MAX_BOX_PIECES must raise with
    guidance instead of silently baking thousands of static copies into
    one lax.switch program (perm forces the boxes packer)."""
    from superbblas_tpu.parallel import Partition, basic_partitioning

    n = R.RedistributionPlan.MAX_BOX_PIECES + 8
    dim = (n, 2)
    src = basic_partitioning("xy", dim, (n, 1))
    # dst partitions the (1,0)-permuted lattice: rank r owns column r
    dst = Partition(dim=(2, n), boxes=tuple(
        ((0, r), (2, 1)) for r in range(n)))
    with pytest.raises(ValueError, match="MAX_BOX_PIECES"):
        R.RedistributionPlan(src, dst, "copy", perm=(1, 0))
    # the same geometry WITHOUT perm builds fine (runs packer)
    dst_id = Partition(dim=dim, boxes=tuple(
        ((r, 0), (1, 2)) for r in range(n)))
    plan = R.RedistributionPlan(src, dst_id, "copy")
    assert plan.pack == "runs"
