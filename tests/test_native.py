"""Native C++ plan engine vs the Python box algebra."""

import numpy as np
import pytest

from superbblas_tpu import native
from superbblas_tpu import parallel as par
from superbblas_tpu.labels import intersect_box, volume


@pytest.fixture(scope="module")
def lib_available():
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    return True


def boxes_arr(part):
    return np.asarray([[b[0], b[1]] for b in part.boxes])


def _covered(boxes, dim):
    import itertools
    pts = set()
    for frm, size in boxes:
        for rel in itertools.product(*[range(s) for s in size]):
            pts.add(tuple((f + r) % d for f, r, d in zip(frm, rel, dim)))
    return pts


@pytest.mark.parametrize("copy_add", ["copy", "add"])
def test_fragment_plan_matches_python(lib_available, copy_add):
    dim = (8, 6)
    src = par.basic_partitioning("xy", dim, (4, 2))
    dst = par.basic_partitioning("xy", dim, (2, 2), nprocs=8,
                                 ext_power=(1, 0))
    rows = native.fragment_plan(boxes_arr(src), boxes_arr(dst), dim, copy_add)
    assert rows is not None
    nd = 2
    # 1) every fragment is inside both its src and dst boxes
    for row in rows:
        i, j = int(row[0]), int(row[1])
        ff = tuple(row[2:4])
        fs = tuple(row[4:6])
        inter_s = intersect_box(ff, fs, *src.boxes[i], dim)
        inter_d = intersect_box(ff, fs, *dst.boxes[j], dim)
        assert sum(volume(s) for _, s in inter_s) == volume(fs)
        assert sum(volume(s) for _, s in inter_d) == volume(fs)
    # 2) per dst rank: coverage is the whole dst box; for 'copy' each dst
    #    point is covered exactly once
    for j in range(len(dst.boxes)):
        frags = [(tuple(r[2:4]), tuple(r[4:6])) for r in rows if r[1] == j]
        want = _covered([dst.boxes[j]], dim)
        got = _covered(frags, dim)
        assert got == want
        if copy_add == "copy":
            assert sum(volume(s) for _, s in frags) == len(want)


def test_intersect_all_matches_python(lib_available):
    dim = (8, 8)
    a = [((0, 0), (5, 5)), ((6, 6), (4, 4))]   # second wraps
    b = [((2, 2), (8, 8)), ((0, 0), (2, 2))]
    rows = native.intersect_all(
        np.asarray([[x[0], x[1]] for x in a]),
        np.asarray([[x[0], x[1]] for x in b]), dim)
    assert rows is not None
    for ia in range(2):
        for ib in range(2):
            want = {(_f, _s) for _f, _s in
                    intersect_box(a[ia][0], a[ia][1], b[ib][0], b[ib][1], dim)
                    if volume(_s) > 0}
            got = {(tuple(r[2:4]), tuple(r[4:6])) for r in rows
                   if r[0] == ia and r[1] == ib}
            assert got == want, (ia, ib, got, want)


def test_redistribution_uses_native_and_matches(lib_available):
    """End-to-end: plans built through the native engine produce correct
    redistribution (validated elsewhere against GSPMD; here vs pack/unpack
    oracle)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from superbblas_tpu.parallel import redistribute as R

    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("p",))
    dim = (12, 5)
    src = par.basic_partitioning("xy", dim, (8, 1))   # uneven: 12/8
    dst = par.basic_partitioning("xy", dim, (2, 4))
    x = np.random.default_rng(3).standard_normal(dim).astype(np.float32)
    stack = R.pack_global(x, src)
    from jax.sharding import NamedSharding, PartitionSpec as P
    xd = jax.device_put(jnp.asarray(stack),
                        NamedSharding(mesh, P("p", None, None)))
    out = R.redistribute_explicit(xd, src, dst, mesh)
    got = R.unpack_global(np.asarray(out), dst)
    np.testing.assert_array_equal(got, x)


def test_native_plan_matches_python_on_wrapped_boxes():
    """Regression: wrapped x wrapped 1-D intersections coalesce into <= 2
    toroidal arcs; the native sweep truncated at 2 LINEAR pieces and
    dropped fragments for full-extent wrapped destinations (found by
    fuzzing: a ((7,5),(8,1)) destination box on an (8,6) lattice)."""
    import numpy as np

    from superbblas_tpu import native
    from superbblas_tpu.parallel import Partition
    from superbblas_tpu.parallel.redistribute import RedistributionPlan

    if native.get_lib() is None:
        import pytest

        pytest.skip("no native toolchain")

    rng = np.random.default_rng(999)
    dim = (8, 6)
    n = 8
    for case in range(25):
        cuts = sorted(rng.choice(np.arange(1, dim[0]), size=n - 1,
                                 replace=True))
        starts = [0] + [int(c) for c in cuts]
        sizes = [(starts[i + 1] if i + 1 < n else dim[0]) - starts[i]
                 for i in range(n)]
        sh = int(rng.integers(0, dim[0]))
        src = Partition(dim=dim, boxes=tuple(
            ((int((s + sh) % dim[0]), 0), (int(z), dim[1]))
            for s, z in zip(starts, sizes)))
        boxes = []
        for _ in range(n):
            f = (int(rng.integers(0, dim[0])), int(rng.integers(0, dim[1])))
            z = (int(rng.integers(1, dim[0] + 1)),
                 int(rng.integers(1, dim[1] + 1)))
            boxes.append((f, z))
        dst = Partition(dim=dim, boxes=tuple(boxes))

        p_native = RedistributionPlan(src, dst, "copy")
        orig = native.fragment_plan
        native.fragment_plan = lambda *a, **k: None
        try:
            p_python = RedistributionPlan(src, dst, "copy")
        finally:
            native.fragment_plan = orig
        # identical coverage: same scatter targets per (src, dst) pair
        for i in range(n):
            for j in range(n):
                sn = sorted(p_native.pair_elem_indices(i, j)[1].tolist())
                sp = sorted(p_python.pair_elem_indices(i, j)[1].tolist())
                assert sn == sp, (case, i, j)
