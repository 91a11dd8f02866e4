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
