"""Tracker, reduce ops, and debug-ladder tests."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from superbblas_tpu import cplx
from superbblas_tpu.ops.reduce import label_sum, scal, select
from superbblas_tpu.utils import tracker
from superbblas_tpu.utils.testing import check_consistency, verify_copy


def test_tracker_paths_and_report():
    tracker.reset_timings()
    with tracker.track("outer", flops=100, force=True):
        with tracker.track("inner", flops=50, memops=10, force=True):
            _ = jnp.ones((4, 4)).sum()
    t = tracker.get_timings()
    assert "outer" in t and "outer/inner" in t
    assert t["outer/inner"]["flops"] == 50
    rep = tracker.report_timings()
    assert "outer/inner" in rep and "GFLOPS" in rep
    tracker.reset_timings()


def test_tracker_disabled_is_noop():
    tracker.reset_timings()
    with tracker.track("nope"):
        pass
    assert tracker.get_timings() == {}


def test_memory_report_runs():
    usage = tracker.report_memory_usage()
    assert "live_array_bytes" in usage


def test_label_sum():
    x = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    got = label_sum(jnp.asarray(x), "abc", "ca")
    np.testing.assert_allclose(np.asarray(got), x.sum(axis=1).T)


def test_label_sum_carray():
    x = np.arange(12).reshape(3, 4) + 1j * np.ones((3, 4))
    got = label_sum(cplx.from_complex(x), "ab", "b")
    np.testing.assert_allclose(np.asarray(got.re), x.real.sum(0))


def test_select():
    x = np.arange(16, dtype=np.float64).reshape(4, 4)
    m = x % 3 == 0
    got = select(jnp.asarray(x), m)
    np.testing.assert_array_equal(np.asarray(got), x.reshape(-1)[m.reshape(-1)])


def test_scal():
    x = cplx.from_complex(np.ones((2, 2)) + 1j)
    got = scal(2j, x)
    np.testing.assert_allclose(np.asarray(got.re), -2 * np.ones((2, 2)))


def test_verify_copy_ok():
    verify_copy((4, 4), "ab", (4, 4), "ba", (0, 0), (2, 2), (1, 1), "copy")


def test_check_consistency():
    check_consistency(o0="abc", size0=(1, 2))
    with pytest.raises(ValueError):
        check_consistency(o0="aa")


def test_cache_report_and_clear(capsys):
    from superbblas_tpu.utils import clear_caches, report_cache_usage
    from superbblas_tpu.parallel import basic_partitioning
    from superbblas_tpu.parallel.redistribute import make_plan

    src = basic_partitioning("xy", (8, 8), (2, 1))
    dst = basic_partitioning("xy", (8, 8), (1, 2))
    make_plan(src, dst, "copy")
    stats = report_cache_usage()
    assert stats["redistribution_plans"]["entries"] >= 1
    clear_caches()
    stats = report_cache_usage()
    assert stats["redistribution_plans"]["entries"] == 0


def test_tracked_ops_record(monkeypatch):
    import jax.numpy as jnp
    import numpy as np

    from superbblas_tpu import bsr as B, flags
    from superbblas_tpu.utils import get_timings, report_timings, reset_timings

    monkeypatch.setenv("SBT_TRACK_TIME", "1")
    flags.clear_cache()
    try:
        reset_timings()
        from test_bsr import make_stencil_op

        op, _, _ = make_stencil_op((4, 4), 2, 2)
        B.bsr_krylov(1.0, op, jnp.ones((4, 4, 2, 3)), "XYsn")
        t = get_timings()
        assert t["bsr_krylov"]["calls"] == 1
        assert t["bsr_krylov"]["flops"] > 0
        rep = report_timings()
        assert "bsr_krylov" in rep
    finally:
        flags.clear_cache()


def test_tracked_nested_flops_under_path(monkeypatch):
    """Flops recorded by @tracked ops land under the SAME hierarchical
    path as the timing — a bare-name bucket would misreport GFLOPS when
    ops nest (e.g. multigrid calling bsr_krylov)."""
    from superbblas_tpu import flags
    from superbblas_tpu.utils.tracker import (get_timings, reset_timings,
                                              track, tracked)

    monkeypatch.setenv("SBT_TRACK_TIME", "1")
    flags.clear_cache()
    try:
        reset_timings()

        @tracked("leaf", flops_fn=lambda out, *a, **k: 42.0)
        def leaf():
            return jnp.ones(())

        with track("outer"):
            leaf()
        t = get_timings()
        assert t["outer/leaf"]["flops"] == 42.0
        assert "leaf" not in t
    finally:
        flags.clear_cache()
        reset_timings()


def test_memory_leak_check():
    import jax.numpy as jnp

    from superbblas_tpu.utils import check_for_memory_leaks, memory_snapshot

    base = memory_snapshot()
    tmp = jnp.ones((256, 256))
    try:
        check_for_memory_leaks(base)
        raised = False
    except RuntimeError:
        raised = True
    assert raised
    del tmp
    check_for_memory_leaks(base)   # clean after release


def test_debug_ladder_fires_on_distributed_copy(monkeypatch):
    """SBT_DEBUG>=2 replays every distributed copy through the mock-index
    verifier (the reference's dist.h:2282-2285 hook)."""
    import jax.numpy as jnp

    from superbblas_tpu import flags, parallel
    from superbblas_tpu.utils import testing as T

    calls = []
    orig = T.verify_copy
    monkeypatch.setattr(T, "verify_copy",
                        lambda *a, **k: (calls.append(a), orig(*a, **k))[1])
    monkeypatch.setenv("SBT_DEBUG", "2")
    flags.clear_cache()
    try:
        x = jnp.arange(16.0).reshape(4, 4)
        y = jnp.zeros((4, 4))
        out = parallel.copy(1.0, x, "ab", y, "ba")
        assert len(calls) == 1
        import numpy as np

        np.testing.assert_array_equal(np.asarray(out), np.asarray(x).T)
    finally:
        flags.clear_cache()
