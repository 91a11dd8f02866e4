"""Partition-layer unit tests (reference analog: tests/dist.cpp:103-126
exact-partition checks and the make_hole checks)."""

import numpy as np
import pytest

from superbblas_tpu.labels import intersect_box, volume
from superbblas_tpu.parallel import (
    Factors23,
    Partition,
    basic_partitioning,
    box_minus,
    make_hole,
    partitioning_distributed_procs,
    subtract_interval,
)


def test_factors23_exact():
    for n, v in [(1, 1), (2, 2), (3, 3), (4, 4), (6, 6), (8, 8), (12, 12),
                 (16, 16), (24, 24)]:
        assert Factors23(n).value == v


def test_factors23_approx_lower_bound():
    for n in range(1, 200):
        f = Factors23(n)
        assert f.value <= n
        assert f.value * 4 >= n * 3  # >= 0.75 n
        assert f.value == 2 ** f.two * 3 ** f.three


def test_partitioning_distributed_procs_basic():
    # 4 procs over xyzt with equal dims: factors go to distinct largest axes
    p = partitioning_distributed_procs("xyzt", (8, 8, 8, 8), "tzyx", 4)
    assert volume(p) == 4
    assert sorted(p) == [1, 1, 2, 2]


def test_partitioning_distributed_procs_skips_singletons():
    p = partitioning_distributed_procs("xyzt", (1, 8, 1, 8), "xyzt", 4)
    assert p[0] == 1 and p[2] == 1
    assert volume(p) == 4


def test_partitioning_distributed_procs_prefers_large():
    p = partitioning_distributed_procs("xy", (16, 2), "xy", 8)
    assert p == (8, 1) or volume(p) == 8 and p[0] >= p[1]


def test_basic_partitioning_even():
    part = basic_partitioning("xy", (8, 4), (2, 2))
    assert part.nprocs == 4
    assert part.grid_shape() == (2, 2)
    # rank scan: first label slowest
    assert part.box(0) == ((0, 0), (4, 2))
    assert part.box(1) == ((0, 2), (4, 2))
    assert part.box(2) == ((4, 0), (4, 2))
    assert part.box(3) == ((4, 2), (4, 2))


def test_basic_partitioning_uneven_remainder_first():
    part = basic_partitioning("x", (10,), (4,))
    sizes = [b[1][0] for b in part.boxes]
    froms = [b[0][0] for b in part.boxes]
    assert sizes == [3, 3, 2, 2]
    assert froms == [0, 3, 6, 8]


def test_basic_partitioning_dist_labels_scan_order():
    # with dist_labels "yx", y varies slowest
    part = basic_partitioning("xy", (4, 4), (2, 2), dist_labels="yx")
    assert part.box(0) == ((0, 0), (2, 2))
    assert part.box(1) == ((2, 0), (2, 2))  # x moves fastest
    assert part.box(2) == ((0, 2), (2, 2))


def test_basic_partitioning_ext_power():
    part = basic_partitioning("x", (8,), (2,), ext_power=(1,))
    assert part.box(0) == ((7,), (6,))   # [0,4) extended by 1 both sides, wraps
    assert part.box(1) == ((3,), (6,))


def test_basic_partitioning_ext_power_clamps():
    part = basic_partitioning("x", (4,), (2,), ext_power=(2,))
    for b in part.boxes:
        assert b == ((0,), (4,))


def test_basic_partitioning_replicate():
    part = basic_partitioning("xy", (4, 4), (1, 1), nprocs=4, replicate=True)
    assert part.is_replicated()
    assert len(part.boxes) == 4


def test_basic_partitioning_more_procs_than_elems():
    part = basic_partitioning("x", (2,), (1,), nprocs=4)
    assert volume(part.box(3)[1]) == 0


def test_subtract_interval():
    assert subtract_interval(0, 8, 2, 3, 8) == [(0, 2), (5, 3)]
    assert subtract_interval(0, 4, 4, 4, 8) == [(0, 4)]
    assert subtract_interval(0, 4, 0, 8, 8) == []
    # wrapped hole
    assert subtract_interval(0, 8, 6, 4, 8) == [(2, 4)]


def _covered(boxes, dim):
    """Set of lattice points covered by the boxes."""
    pts = set()
    import itertools
    for frm, size in boxes:
        for rel in itertools.product(*[range(s) for s in size]):
            pts.add(tuple((f + r) % d for f, r, d in zip(frm, rel, dim)))
    return pts


def test_box_minus_exact_cover():
    dim = (6, 6)
    box = ((1, 1), (4, 4))
    hole = ((2, 2), (2, 2))
    frags = box_minus(box[0], box[1], hole[0], hole[1], dim)
    want = _covered([box], dim) - _covered([hole], dim)
    got = _covered(frags, dim)
    assert got == want
    # disjoint
    total = sum(volume(s) for _, s in frags)
    assert total == len(got)


def test_box_minus_wrapped():
    dim = (8,)
    frags = box_minus((6,), (4,), (0,), (2,), dim)   # box wraps, hole at start
    want = _covered([((6,), (4,))], dim) - _covered([((0,), (2,))], dim)
    assert _covered(frags, dim) == want


def test_make_hole_full_cover():
    part = basic_partitioning("xy", (8, 8), (2, 2))
    holed = make_hole(part, (3, 3), (2, 2))
    dim = (8, 8)
    want = _covered(part.boxes, dim) - _covered([((3, 3), (2, 2))], dim)
    assert _covered(holed.boxes, dim) == want
    # fragments within one source box are disjoint
    tot = sum(volume(s) for _, s in holed.boxes)
    assert tot == len(want)


def test_has_full_support():
    part = basic_partitioning("xy", (4, 4), (2, 2))
    assert part.has_full_support()
    holed = make_hole(part, (0, 0), (1, 1))
    assert not holed.has_full_support()


def test_repetitions_and_comm_predicates():
    """are_there_repetitions (dist.h:2123) and may_need_communications
    (dist.h:2159) parity."""
    from superbblas_tpu.parallel import (
        basic_partitioning,
        may_need_communications,
    )

    grid = basic_partitioning("xy", (8, 8), (4, 2))
    assert not grid.are_there_repetitions()
    halo = basic_partitioning("xy", (8, 8), (4, 2), ext_power=(1, 0))
    assert halo.are_there_repetitions()

    assert not may_need_communications(grid, grid)
    # gathering the halo-extended partition needs neighbor data
    assert may_need_communications(grid, halo)
    # shrinking back into the grid from the halo partition is local
    assert not may_need_communications(halo, grid)


def test_box_minus_wrapped_x_wrapped_fuzz():
    """Regression: when box and hole both wrap on an axis, their overlap
    is two DISJOINT toroidal arcs; the old slab sweep followed only the
    largest arc and silently dropped part of the remainder (e.g. box
    ((2,3),(2,3)) minus hole ((2,1),(2,1)) on a (3,4) lattice lost sites
    (0,0) and (0,3)).  box_minus must tile box \\ hole exactly and
    disjointly for arbitrary toroidal inputs."""
    from itertools import product as _prod

    def covered(frm, size, dim):
        return {
            tuple((f + o) % d for f, o, d in zip(frm, off, dim))
            for off in _prod(*[range(z) for z in size])
        }

    rng = np.random.default_rng(7)
    for _ in range(300):
        nd = int(rng.integers(1, 4))
        dim = tuple(int(rng.integers(1, 8)) for _ in range(nd))
        bf = tuple(int(rng.integers(0, d)) for d in dim)
        bz = tuple(int(rng.integers(1, d + 1)) for d in dim)
        hf = tuple(int(rng.integers(0, d)) for d in dim)
        hz = tuple(int(rng.integers(1, d + 1)) for d in dim)
        frags = box_minus(bf, bz, hf, hz, dim)
        want = covered(bf, bz, dim) - covered(hf, hz, dim)
        got = set()
        nsum = 0
        for ff, fz in frags:
            got |= covered(ff, fz, dim)
            nsum += volume(fz)
        assert got == want, (dim, (bf, bz), (hf, hz))
        assert nsum == len(got), ("overlapping fragments", dim, (bf, bz), (hf, hz))


def test_plan_matches_elementwise_ground_truth():
    """Copy-mode fragment plans (both engines) against a brute-force
    per-site oracle: every destination site covered by some source box
    must be written exactly once, from the FIRST source box containing
    it; add mode keeps full multiplicity.  Catches the box_minus arc
    truncation that made overlapping-source copy plans drop sites."""
    from itertools import product as _prod

    from superbblas_tpu import native
    from superbblas_tpu.parallel.redistribute import RedistributionPlan

    def sites(frm, size, dim):
        return [
            tuple((f + o) % d for f, o, d in zip(frm, off, dim))
            for off in _prod(*[range(z) for z in size])
        ]

    rng = np.random.default_rng(321)
    for case in range(40):
        nd = int(rng.integers(1, 4))
        dim = tuple(int(rng.integers(1, 8)) for _ in range(nd))
        n = int(rng.integers(1, 6))
        mode = ["copy", "add"][int(rng.integers(0, 2))]

        def rand_part():
            boxes = []
            for _ in range(n):
                f = tuple(int(rng.integers(0, d)) for d in dim)
                z = tuple(int(rng.integers(1, d + 1)) for d in dim)
                boxes.append((f, z))
            return Partition(dim=dim, boxes=tuple(boxes))

        src, dst = rand_part(), rand_part()
        src_sets = [set(sites(*b, dim)) for b in src.boxes]
        engines = ["python"] + (["native"] if native.get_lib() else [])
        for engine in engines:
            orig = native.fragment_plan
            if engine == "python":
                native.fragment_plan = lambda *a, **k: None
            try:
                plan = RedistributionPlan(src, dst, mode)
            finally:
                native.fragment_plan = orig
            for j in range(n):
                dfrm, dsz = dst.boxes[j]
                want = {i: [] for i in range(n)}
                for site in sites(dfrm, dsz, dim):
                    covering = [i for i in range(n) if site in src_sets[i]]
                    dloc = 0
                    for f, c, d, zsh in zip(dfrm, site, dim, plan.dst_shape):
                        dloc = dloc * zsh + ((c - f) % d)
                    if mode == "copy":
                        if covering:
                            want[covering[0]].append(dloc)
                    else:
                        for i in covering:
                            want[i].append(dloc)
                for i in range(n):
                    got = sorted(plan.pair_elem_indices(i, j)[1].tolist())
                    assert got == sorted(want[i]), (engine, case, dim, mode, i, j)
