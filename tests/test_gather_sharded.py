"""Halo-plan sharded gather matvec (parallel/gather_sharded.py) vs the
replicated oracle, plus the traffic contract: collective-permutes only,
never GSPMD's nnz-times-field all-reduce (round-3 VERDICT item 6;
reference extended-domain BSR, bsr.h:2020-2192)."""

import itertools
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from superbblas_tpu import bsr as B
from superbblas_tpu import cplx
from superbblas_tpu.parallel import apply_gather_sharded, make_gather_halo_plan


def _irregular_op(dim, nc, k_shard, reach, rng, kron=False):
    """Stencil + one random neighbor within +-reach planes of k_shard:
    genuinely irregular (no near-uniform merge), but halo-bounded."""
    nd = len(dim)
    offs = [(0,) * nd] + [
        tuple(s if a == mu else 0 for a in range(nd))
        for mu in range(nd) for s in (1, -1)]
    maxnnz = len(offs) + 1
    ii = np.zeros(dim, np.int64)
    jj = np.zeros(dim + (maxnnz, nd), np.int64)
    vals = np.zeros(dim + (maxnnz, nc, nc))
    for s in itertools.product(*[range(d) for d in dim]):
        kk = 0
        for off in offs:
            jj[s][kk] = [(a + o) % d for a, o, d in zip(s, off, dim)]
            vals[s][kk] = rng.standard_normal((nc, nc))
            kk += 1
        t = [int(rng.integers(0, d)) for d in dim]
        t[k_shard] = (s[k_shard]
                      + int(rng.integers(-reach, reach + 1))) % dim[k_shard]
        jj[s][kk] = t
        vals[s][kk] = rng.standard_normal((nc, nc))
        ii[s] = kk + 1
    lat = "xyzt"[:nd]
    if kron:
        kr = rng.standard_normal((maxnnz, 2, 2))
        return B.create_kron_bsr(
            lat + "Ss", dim + (2, nc), lat + "Cc", dim + (2, nc),
            (1,) * nd + (1, nc), (1,) * nd + (1, nc),
            (1,) * nd + (2, 1), (1,) * nd + (2, 1),
            ii, jj, jnp.asarray(vals), jnp.asarray(kr))
    return B.create_bsr(lat + "s", dim + (nc,), lat + "c", dim + (nc,),
                        (1,) * nd + (nc,), (1,) * nd + (nc,), ii, jj,
                        jnp.asarray(vals))


@pytest.mark.parametrize("k_shard,dim", [(0, (16, 4, 6)), (1, (4, 16, 6))])
def test_gather_sharded_matches_oracle(k_shard, dim):
    rng = np.random.default_rng(k_shard)
    op = _irregular_op(dim, 2, k_shard, 2, rng)
    assert op.mode == "gather"
    w, jj_local = make_gather_halo_plan(op, k_shard, 8)
    assert 2 <= w <= dim[k_shard] // 8 + 1
    x = cplx.CArray(jnp.asarray(rng.standard_normal(dim + (2, 3))),
                    jnp.asarray(rng.standard_normal(dim + (2, 3))))
    want = B.bsr_krylov(1.0, op, x, "xyzcn")

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("d",))
    axes = {c: ("d" if i == k_shard else None)
            for i, c in enumerate("xyz")}
    spec = P(*[("d" if i == k_shard else None) for i in range(3)],
             None, None)
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    got = apply_gather_sharded(op, xs, mesh, axes)
    assert got.re.sharding.spec == spec
    gr = np.asarray(jax.device_put(got.re, NamedSharding(mesh, P())))
    gi = np.asarray(jax.device_put(got.im, NamedSharding(mesh, P())))
    np.testing.assert_allclose(gr, np.asarray(want.re), atol=1e-10)
    np.testing.assert_allclose(gi, np.asarray(want.im), atol=1e-10)

    # traffic contract: minimal halo (collective-permutes), no all-reduce
    hlo = jax.jit(lambda v: apply_gather_sharded(op, v, mesh, axes)) \
        .lower(xs).compile().as_text()
    assert len(re.findall(r" collective-permute\(", hlo)) >= 2
    assert not re.findall(r" all-reduce\(", hlo)


def test_gather_sharded_kron():
    rng = np.random.default_rng(7)
    dim = (16, 4, 4)
    op = _irregular_op(dim, 2, 0, 1, rng, kron=True)
    assert op.mode == "gather" and op.kron is not None
    x = cplx.CArray(jnp.asarray(rng.standard_normal(dim + (2, 2, 3))),
                    jnp.asarray(rng.standard_normal(dim + (2, 2, 3))))
    want = B.bsr_krylov(1.0, op, x, "xyzCcn")
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("d",))
    spec = P("d", None, None, None, None, None)
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    got = apply_gather_sharded(op, xs, mesh,
                               {"x": "d", "y": None, "z": None})
    gr = np.asarray(jax.device_put(got.re, NamedSharding(mesh, P())))
    np.testing.assert_allclose(gr, np.asarray(want.re), atol=1e-10)


def test_gather_sharded_unbounded_raises():
    rng = np.random.default_rng(3)
    dim = (16, 4, 4)
    op = _irregular_op(dim, 2, 0, 7, rng)   # reach 7 > L=2: unbounded
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("d",))
    x = cplx.CArray(jnp.asarray(rng.standard_normal(dim + (2, 1))),
                    jnp.asarray(rng.standard_normal(dim + (2, 1))))
    xs = jax.device_put(x, NamedSharding(mesh, P("d")))
    with pytest.raises(ValueError, match="unbounded|planes past"):
        apply_gather_sharded(op, xs, mesh,
                             {"x": "d", "y": None, "z": None})


@pytest.mark.parametrize("kron", [False, True])
def test_gather_sharded_ca_powers(kron):
    """power=p applies the operator p times after ONE widened exchange
    (the okr-powers / bsr_krylov_ca analog for irregular operators,
    bsr.h:2109-2247): halo-site rows travel with the field, shells
    invalidate inward by w per apply, the cropped core matches p
    replicated applies; all_powers stacks the s-step basis."""
    rng = np.random.default_rng(11)
    dim = (16, 4, 6)
    op = _irregular_op(dim, 2, 0, 1, rng, kron=kron)
    assert op.mode == "gather"
    xsh = dim + ((2, 2, 3) if kron else (2, 3))
    x = cplx.CArray(jnp.asarray(rng.standard_normal(xsh)),
                    jnp.asarray(rng.standard_normal(xsh)))
    ox = "xyzCcn" if kron else "xyzcn"
    w1 = B.bsr_krylov(1.0, op, x, ox)
    w2 = B.bsr_krylov(1.0, op, w1, ox)
    w3 = B.bsr_krylov(1.0, op, w2, ox)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("d",))
    spec = P("d", *([None] * (len(xsh) - 1)))
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    axes = {"x": "d", "y": None, "z": None}

    got3 = apply_gather_sharded(op, xs, mesh, axes, power=3)
    gr = np.asarray(jax.device_put(got3.re, NamedSharding(mesh, P())))
    np.testing.assert_allclose(gr, np.asarray(w3.re), atol=1e-9)
    assert got3.re.sharding.spec == spec

    stack = apply_gather_sharded(op, xs, mesh, axes, power=2,
                                 all_powers=True)
    sr = np.asarray(jax.device_put(stack.re, NamedSharding(mesh, P())))
    assert sr.shape[0] == 2
    np.testing.assert_allclose(sr[0], np.asarray(w1.re), atol=1e-9)
    np.testing.assert_allclose(sr[1], np.asarray(w2.re), atol=1e-9)

    # ONE exchange: exactly one ppermute pair even at power=3
    import re as _re
    hlo = jax.jit(lambda v: apply_gather_sharded(op, v, mesh, axes,
                                                 power=3)) \
        .lower(xs).compile().as_text()
    # field + blocks rows each take one pair (re+im parts fuse or not —
    # bound the count instead of pinning XLA's fusion choices)
    n_cp = len(_re.findall(r" collective-permute\(", hlo))
    assert 2 <= n_cp <= 8, n_cp
    assert not _re.findall(r" all-reduce\(", hlo)

    # power too large for the slab raises
    with pytest.raises(ValueError, match="planes past"):
        apply_gather_sharded(op, xs, mesh, axes, power=9)


def test_gather_sharded_multi_axis():
    """Two sharded lattice axes: per-axis halo plans compose (corners
    ride the sequential per-axis extension), power=2 still takes one
    widened exchange per axis."""
    rng = np.random.default_rng(21)
    dim = (8, 8, 6)
    op = _irregular_op(dim, 2, 0, 1, rng)
    assert op.mode == "gather"
    x = cplx.CArray(jnp.asarray(rng.standard_normal(dim + (2, 3))),
                    jnp.asarray(rng.standard_normal(dim + (2, 3))))
    w1 = B.bsr_krylov(1.0, op, x, "xyzcn")
    w2 = B.bsr_krylov(1.0, op, w1, "xyzcn")

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("a", "b"))
    spec = P("a", "b", None, None, None)
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    axes = {"x": "a", "y": "b", "z": None}

    # the extra neighbor is random along y: width 2 on an 8-torus halved
    ws, jj_local = make_gather_halo_plan(op, (0, 1), (2, 2))
    assert ws == (1, 2) and jj_local.shape[:2] == (2, 2)

    got = apply_gather_sharded(op, xs, mesh, axes)
    assert got.re.sharding.spec == spec
    gr = np.asarray(jax.device_put(got.re, NamedSharding(mesh, P())))
    np.testing.assert_allclose(gr, np.asarray(w1.re), atol=1e-10)

    got2 = apply_gather_sharded(op, xs, mesh, axes, power=2)
    g2 = np.asarray(jax.device_put(got2.re, NamedSharding(mesh, P())))
    np.testing.assert_allclose(g2, np.asarray(w2.re), atol=1e-9)


def test_ca_powers_within_slab_coupling():
    """Review-found corruption case: a coupling that never leaves its
    owner's SLAB (off-slab width contribution 0) still forces a wide
    frame at power>1 — a halo row legally reads the far end of its own
    slab, which a w*p frame misses.  The reach-based plan must either
    produce exact core results or raise; it must never silently return
    garbage."""
    rng = np.random.default_rng(31)
    dim = (16, 4, 4)
    nd, nc = 3, 2
    offs = [(0, 0, 0), (1, 0, 0), (-1, 0, 0)]
    n = 4
    L = dim[0] // n
    ii = np.full(dim, len(offs) + 1, np.int64)
    jj = np.zeros(dim + (len(offs) + 1, nd), np.int64)
    vals = rng.standard_normal(dim + (len(offs) + 1, nc, nc))
    for s in itertools.product(*[range(d) for d in dim]):
        for kk, off in enumerate(offs):
            jj[s][kk] = [(a + o) % d for a, o, d in zip(s, off, dim)]
        # random coupling WITHIN the owner's slab along x, random y/z
        t = [int(rng.integers(0, d)) for d in dim]
        t[0] = (s[0] // L) * L + int(rng.integers(0, L))
        jj[s][len(offs)] = t
    op = B.create_bsr("xyzs", dim + (nc,), "xyzc", dim + (nc,),
                      (1, 1, 1, nc), (1, 1, 1, nc), ii, jj,
                      jnp.asarray(vals))
    assert op.mode == "gather"
    x = cplx.CArray(jnp.asarray(rng.standard_normal(dim + (nc, 3))),
                    jnp.asarray(rng.standard_normal(dim + (nc, 3))))
    w1 = B.bsr_krylov(1.0, op, x, "xyzcn")
    w2 = B.bsr_krylov(1.0, op, w1, "xyzcn")

    mesh = Mesh(np.asarray(jax.devices()[:n]), ("d",))
    spec = P("d", None, None, None, None)
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    axes = {"x": "d", "y": None, "z": None}

    # frame must widen to the neighbor slabs: W = L (reach-based)
    W, _ = make_gather_halo_plan(op, 0, n, power=2)
    assert W == L, W
    got = apply_gather_sharded(op, xs, mesh, axes, power=2)
    gr = np.asarray(jax.device_put(got.re, NamedSharding(mesh, P())))
    np.testing.assert_allclose(gr, np.asarray(w2.re), atol=1e-9)

    # power=3 reaches the whole torus: W would exceed L -> honest raise
    with pytest.raises(ValueError, match="planes past"):
        make_gather_halo_plan(op, 0, n, power=3)


def test_gather_overlap_matches_oracle():
    """Core/halo split for gather operators (apply_gather_overlap +
    bsr_krylov_overlap routing): full result matches the replicated
    matvec; just_local matches a host-masked operator that drops every
    slab-crossing slot; the core dot depends only on the local block
    (collective-permutes overlap it)."""
    from superbblas_tpu.parallel import apply_gather_overlap
    from superbblas_tpu.parallel.overlap import bsr_krylov_overlap

    rng = np.random.default_rng(41)
    dim = (16, 4, 6)
    nc, n = 2, 4
    L = dim[0] // n
    op = _irregular_op(dim, nc, 0, 1, rng)
    assert op.mode == "gather"
    x = cplx.CArray(jnp.asarray(rng.standard_normal(dim + (nc, 3))),
                    jnp.asarray(rng.standard_normal(dim + (nc, 3))))
    want = B.bsr_krylov(1.0, op, x, "xyzcn")

    mesh = Mesh(np.asarray(jax.devices()[:n]), ("d",))
    spec = P("d", None, None, None, None)
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    axes = {"x": "d", "y": None, "z": None}

    got = apply_gather_overlap(op, xs, mesh, axes)
    gr = np.asarray(jax.device_put(got.re, NamedSharding(mesh, P())))
    np.testing.assert_allclose(gr, np.asarray(want.re), atol=1e-9)

    # just_local oracle: zero every slot whose neighbor leaves the
    # owner's slab along x
    jj = np.asarray(op.jj_flat).reshape(dim + (-1,))
    vloc = np.asarray(op.blocks).copy()
    nb_x = np.unravel_index(jj, dim)[0]
    own = (np.arange(dim[0]) // L)[:, None, None, None]
    crossing = (nb_x // L) != own
    vloc[crossing] = 0.0
    op_loc = B.create_bsr(
        "xyzs", dim + (nc,), "xyzc", dim + (nc,), (1, 1, 1, nc),
        (1, 1, 1, nc),
        np.full(dim, jj.shape[-1], np.int64),
        np.stack(np.unravel_index(jj, dim), axis=-1),
        jnp.asarray(vloc))
    want_loc = B.bsr_krylov(1.0, op_loc, x, "xyzcn")
    got_loc = apply_gather_overlap(op, xs, mesh, axes, just_local=True)
    glr = np.asarray(jax.device_put(got_loc.re, NamedSharding(mesh, P())))
    np.testing.assert_allclose(glr, np.asarray(want_loc.re), atol=1e-9)

    # the public label-machinery entry routes gather ops here
    out = bsr_krylov_overlap(2.0, op, xs, "xyzcn", mesh, axes)
    orr = np.asarray(jax.device_put(out.re, NamedSharding(mesh, P())))
    np.testing.assert_allclose(orr, 2.0 * np.asarray(want.re), atol=1e-9)


def test_gather_plan_ignores_padded_slots():
    """Padded jj slots (>= row_counts, blocks zeroed by create_bsr) must
    not inflate the halo width or fail the reach check (review finding:
    padding conventionally points at site 0, which reads as a coupling
    to the far side of the lattice): a ragged operator whose REAL
    couplings stay within one plane plans at W=1/W=2 and matches the
    replicated oracle."""
    from superbblas_tpu.parallel import apply_gather_overlap

    dim = (16, 4, 4)
    nc, n = 2, 4
    rng = np.random.default_rng(61)
    maxnnz = 5
    ii = np.zeros(dim, np.int64)
    jj = np.zeros(dim + (maxnnz, 3), np.int64)   # padding -> site 0
    vals = np.zeros(dim + (maxnnz, nc, nc))
    offs = [(0, 0, 0), (1, 0, 0), (-1, 0, 0)]
    for s in itertools.product(*[range(d) for d in dim]):
        for kk, off in enumerate(offs):
            jj[s][kk] = [(a + o) % d for a, o, d in zip(s, off, dim)]
            vals[s][kk] = rng.standard_normal((nc, nc))
        cnt = len(offs)
        if (s[0] + s[1]) % 2:                    # ragged: extra random slot
            t = [int(rng.integers(0, d)) for d in dim]
            t[0] = (s[0] + int(rng.integers(-1, 2))) % dim[0]
            jj[s][cnt] = t
            vals[s][cnt] = rng.standard_normal((nc, nc))
            cnt += 1
        ii[s] = cnt
    op = B.create_bsr("xyzs", dim + (nc,), "xyzc", dim + (nc,),
                      (1, 1, 1, nc), (1, 1, 1, nc), ii, jj,
                      jnp.asarray(vals))
    assert op.mode == "gather" and op.row_counts is not None
    W, _ = make_gather_halo_plan(op, 0, n)
    assert W == 1, W
    W2, _ = make_gather_halo_plan(op, 0, n, power=2)
    assert W2 == 2, W2

    x = cplx.CArray(jnp.asarray(rng.standard_normal(dim + (nc, 3))),
                    jnp.asarray(rng.standard_normal(dim + (nc, 3))))
    w1 = B.bsr_krylov(1.0, op, x, "xyzcn")
    w2 = B.bsr_krylov(1.0, op, w1, "xyzcn")
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("d",))
    spec = P("d", None, None, None, None)
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    axes = {"x": "d", "y": None, "z": None}
    got = apply_gather_sharded(op, xs, mesh, axes, power=2)
    gr = np.asarray(jax.device_put(got.re, NamedSharding(mesh, P())))
    np.testing.assert_allclose(gr, np.asarray(w2.re), atol=1e-9)
    gov = apply_gather_overlap(op, xs, mesh, axes)
    gvr = np.asarray(jax.device_put(gov.re, NamedSharding(mesh, P())))
    np.testing.assert_allclose(gvr, np.asarray(w1.re), atol=1e-9)


def test_gather_overlap_kron_multiaxis():
    """Overlap executor on the kron-factored variant over a 2x2 mesh —
    the masked-blocks reshape and per-axis core classification under
    multi-axis sharding, vs the replicated oracle."""
    from superbblas_tpu.parallel import apply_gather_overlap

    rng = np.random.default_rng(71)
    dim = (8, 8, 6)
    op = _irregular_op(dim, 2, 0, 1, rng, kron=True)
    assert op.mode == "gather" and op.kron is not None
    x = cplx.CArray(jnp.asarray(rng.standard_normal(dim + (2, 2, 3))),
                    jnp.asarray(rng.standard_normal(dim + (2, 2, 3))))
    want = B.bsr_krylov(1.0, op, x, "xyzCcn")
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("a", "b"))
    spec = P("a", "b", None, None, None, None)
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    axes = {"x": "a", "y": "b", "z": None}
    got = apply_gather_overlap(op, xs, mesh, axes)
    gr = np.asarray(jax.device_put(got.re, NamedSharding(mesh, P())))
    np.testing.assert_allclose(gr, np.asarray(want.re), atol=1e-9)
    jl = apply_gather_overlap(op, xs, mesh, axes, just_local=True)
    jax.block_until_ready(jl.re)
