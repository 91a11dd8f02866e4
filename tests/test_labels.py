"""Unit tests for the label/coordinate core (superbblas_tpu.labels)."""

import numpy as np
import pytest

from superbblas_tpu import labels as L


def test_find_permutation():
    assert L.find_permutation("abc", "cab") == (2, 0, 1)
    assert L.find_permutation("abc", "xbz") == (-1, 1, -1)


def test_reorder_coor():
    assert L.reorder_coor((10, 20, 30), (2, 0, 1)) == (30, 10, 20)
    assert L.reorder_coor((10, 20), (1, -1, 0), blank=1) == (20, 1, 10)


def test_normalize_coor():
    assert L.normalize_coor((-1, 5, 4), (4, 4, 4)) == (3, 1, 0)


def test_split_interval_no_wrap():
    assert L.split_interval(1, 3, 8) == ((0, 1, 3),)


def test_split_interval_wrap():
    assert L.split_interval(6, 4, 8) == ((0, 6, 2), (2, 0, 2))


def test_split_box_wrap_count():
    frags = list(L.split_box((6, 3), (4, 2), (8, 8)))
    assert len(frags) == 2
    total = sum(L.volume(s) for _, _, s in frags)
    assert total == 8


def test_intersect_interval_basic():
    assert L.intersect_interval(0, 4, 2, 4, 8) == ((2, 2),)
    assert L.intersect_interval(0, 4, 4, 4, 8) == ()


def test_intersect_interval_wrap():
    # [6, 10) wraps to {6,7,0,1}; [0, 4) = {0,1,2,3}; overlap {0,1}
    assert L.intersect_interval(6, 4, 0, 4, 8) == ((0, 2),)


def test_intersect_box():
    out = L.intersect_box((0, 0), (4, 4), (2, 2), (4, 4), (8, 8))
    assert out == (((2, 2), (2, 2)),)


def test_contraction_plan_groups():
    # o0 = "tab", o1 = "tac" -> r = "tbc": T=t, A=a, B=b, C=c
    p = L.ContractionPlan("tab", (5, 3, 4), "tac", (5, 3, 6), "tbc", (5, 4, 6))
    assert (p.T, p.A, p.B, p.C) == ("t", "a", "b", "c")
    assert (p.volT, p.volA, p.volB, p.volC) == (5, 3, 4, 6)
    assert p.dot_general_dims() == (((1,), (1,)), ((0,), (0,)))


def test_contraction_plan_rejects_unmatched():
    with pytest.raises(ValueError, match="unmatched"):
        L.ContractionPlan("ab", (2, 3), "bc", (3, 4), "a", (2,))
    with pytest.raises(ValueError, match="unmatched"):
        L.ContractionPlan("ab", (2, 3), "bc", (3, 4), "acx", (2, 4, 5))


def test_contraction_plan_rejects_extent_mismatch():
    with pytest.raises(ValueError, match="extent mismatch"):
        L.ContractionPlan("ab", (2, 3), "bc", (4, 4), "ac", (2, 4))


def test_check_isomorphic():
    L.check_isomorphic("ab", (1, 3), (2, 3), "b", (3,))
    with pytest.raises(ValueError):
        L.check_isomorphic("ab", (2, 3), (2, 3), "b", (3,))


def test_translate_coor():
    out = L.translate_coor((3, 4), "xy", (1, 1), "yx", (0, 0))
    assert out == (3, 2)


def test_fuzz_intersect_box_bruteforce():
    """intersect_box against a per-site oracle: random N-D toroidal boxes
    where BOTH may wrap — the returned fragments must cover exactly the
    set intersection, disjointly."""
    import itertools as it

    rng = np.random.default_rng(2024)

    def covered(frm, size, dim):
        return {tuple((f + o) % d for f, o, d in zip(frm, off, dim))
                for off in it.product(*[range(s) for s in size])}

    for case in range(60):
        nd = int(rng.integers(1, 4))
        dim = tuple(int(rng.integers(1, 8)) for _ in range(nd))
        fa = tuple(int(rng.integers(0, d)) for d in dim)
        sa = tuple(int(rng.integers(0, d + 1)) for d in dim)
        fb = tuple(int(rng.integers(0, d)) for d in dim)
        sb = tuple(int(rng.integers(0, d + 1)) for d in dim)
        frags = list(L.intersect_box(fa, sa, fb, sb, dim))
        got = set()
        total = 0
        for ff, fs in frags:
            pts = covered(ff, fs, dim)
            total += len(pts)
            got |= pts
        want = covered(fa, sa, dim) & covered(fb, sb, dim)
        assert got == want, (case, dim, (fa, sa), (fb, sb))
        assert total == len(got), ("overlapping fragments", case, dim)
