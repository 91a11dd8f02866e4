"""Tests for label-based local copy/permute/scale/add.

Oracle: independent numpy implementation using modular index arithmetic —
the same strategy as the reference's mock-index verifier (dist.h:1919-2116).
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from superbblas_tpu import local_copy, local_permute


def numpy_copy_oracle(alpha, x, o0, y, o1, from0, size0, from1, copy_add):
    """Element-by-element toroidal reference copy."""
    out = np.array(y, copy=True)
    dim0 = x.shape
    dim1 = out.shape
    for rel in itertools.product(*[range(s) for s in size0]):
        c0 = tuple((f + r) % d for f, r, d in zip(from0, rel, dim0))
        # destination coordinate: permute rel into o1 space
        c1 = []
        for j, c in enumerate(o1):
            if c in o0:
                i = o0.index(c)
                c1.append((from1[j] + rel[i]) % dim1[j])
            else:
                c1.append(from1[j] % dim1[j])
        c1 = tuple(c1)
        v = alpha * x[c0]
        if copy_add == "copy":
            out[c1] = v
        else:
            out[c1] += v
    return out


def rand(shape, dtype, seed=0):
    rng = np.random.default_rng(seed)
    if np.issubdtype(dtype, np.complexfloating):
        return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(dtype)
    return rng.standard_normal(shape).astype(dtype)


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.complex64])
def test_full_permute(dtype):
    x = rand((3, 4, 5), dtype)
    y = np.zeros((5, 3, 4), dtype=dtype)
    got = local_copy(1, jnp.asarray(x), "abc", jnp.asarray(y), "cab")
    np.testing.assert_allclose(np.asarray(got), np.transpose(x, (2, 0, 1)), rtol=1e-6)


def test_permute_helper():
    x = rand((3, 4), np.float64)
    got = local_permute(jnp.asarray(x), "ab", "ba")
    np.testing.assert_array_equal(np.asarray(got), x.T)


@pytest.mark.parametrize("copy_add", ["copy", "add"])
@pytest.mark.parametrize("alpha", [1.0, 0.0, -2.5])
def test_box_copy_no_wrap(copy_add, alpha):
    x = rand((6, 8), np.float64, seed=1)
    y = rand((8, 10), np.float64, seed=2)
    from0, size0, from1 = (1, 2), (4, 5), (2, 3)
    got = local_copy(alpha, jnp.asarray(x), "ab", jnp.asarray(y), "ba",
                     from0=from0, size0=size0, from1=from1, copy_add=copy_add)
    want = numpy_copy_oracle(alpha, x, "ab", y, "ba",
                             from0, size0, (2, 3), copy_add)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


@pytest.mark.parametrize("copy_add", ["copy", "add"])
def test_box_copy_wrap_source(copy_add):
    x = rand((6, 8), np.float64, seed=3)
    y = rand((6, 8), np.float64, seed=4)
    from0, size0, from1 = (4, 6), (4, 5), (0, 0)   # wraps in both axes
    got = local_copy(1.0, jnp.asarray(x), "ab", jnp.asarray(y), "ab",
                     from0=from0, size0=size0, from1=from1, copy_add=copy_add)
    want = numpy_copy_oracle(1.0, x, "ab", y, "ab", from0, size0, from1, copy_add)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


@pytest.mark.parametrize("copy_add", ["copy", "add"])
def test_box_copy_wrap_dest(copy_add):
    x = rand((6, 8), np.float64, seed=5)
    y = rand((6, 8), np.float64, seed=6)
    from0, size0, from1 = (0, 0), (4, 5), (4, 6)   # dest box wraps
    got = local_copy(1.0, jnp.asarray(x), "ab", jnp.asarray(y), "ab",
                     from0=from0, size0=size0, from1=from1, copy_add=copy_add)
    want = numpy_copy_oracle(1.0, x, "ab", y, "ab", from0, size0, from1, copy_add)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


def test_rank_change_drop_and_add_labels():
    # o0 has a size-1 label 'z' not in o1; o1 has a label 'w' not in o0.
    x = rand((1, 4, 5), np.float64, seed=7)
    y = rand((5, 3, 4), np.float64, seed=8)
    got = local_copy(1.0, jnp.asarray(x), "zab", jnp.asarray(y), "bwa",
                     from0=(0, 0, 0), size0=(1, 4, 5), from1=(0, 1, 0))
    want = numpy_copy_oracle(1.0, x, "zab", y, "bwa", (0, 0, 0), (1, 4, 5),
                             (0, 1, 0), "copy")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


def test_precision_convert():
    x = rand((4, 4), np.float32, seed=9)
    y = np.zeros((4, 4), dtype=np.float64)
    got = local_copy(1.0, jnp.asarray(x), "ab", jnp.asarray(y), "ab")
    assert got.dtype == jnp.float64
    np.testing.assert_allclose(np.asarray(got), x.astype(np.float64), rtol=1e-6)


def test_alpha_zero_zeroes_box():
    y = rand((4, 4), np.float64, seed=10)
    x = rand((4, 4), np.float64, seed=11)
    got = local_copy(0.0, jnp.asarray(x), "ab", jnp.asarray(y), "ab",
                     from0=(0, 0), size0=(2, 2), from1=(1, 1))
    want = y.copy()
    want[1:3, 1:3] = 0.0
    np.testing.assert_allclose(np.asarray(got), want)


def test_masked_copy_pairing():
    # Even-odd style mask: copy masked elements only, compaction pairing.
    x = rand((4, 4), np.float64, seed=12)
    y = np.zeros((4, 4), dtype=np.float64)
    m = (np.add.outer(np.arange(4), np.arange(4)) % 2 == 0)
    got = local_copy(1.0, jnp.asarray(x), "ab", jnp.asarray(y), "ab",
                     mask0=m, mask1=m)
    want = np.where(m, x, 0.0)
    np.testing.assert_allclose(np.asarray(got), want)


def test_masked_copy_incompatible_raises():
    x = rand((4, 4), np.float64, seed=13)
    y = np.zeros((4, 4), dtype=np.float64)
    m0 = np.zeros((4, 4), dtype=bool); m0[0, 0] = True
    m1 = np.zeros((4, 4), dtype=bool); m1[0, 0] = True; m1[1, 1] = True
    with pytest.raises(ValueError, match="incompatible"):
        local_copy(1.0, jnp.asarray(x), "ab", jnp.asarray(y), "ab",
                   mask0=m0, mask1=m1)


def test_masked_copy_different_positions():
    # mask pairing moves data: source mask on row 0, dest mask on row 1.
    x = np.arange(16, dtype=np.float64).reshape(4, 4)
    y = np.zeros((4, 4), dtype=np.float64)
    m0 = np.zeros((4, 4), dtype=bool); m0[0, :] = True
    m1 = np.zeros((4, 4), dtype=bool); m1[1, :] = True
    got = local_copy(1.0, jnp.asarray(x), "ab", jnp.asarray(y), "ab",
                     mask0=m0, mask1=m1)
    want = np.zeros((4, 4)); want[1, :] = x[0, :]
    np.testing.assert_allclose(np.asarray(got), want)


def test_complex_scale():
    x = rand((3, 3), np.complex128, seed=14)
    y = np.zeros((3, 3), dtype=np.complex128)
    alpha = 1.5 - 0.5j
    got = local_copy(alpha, jnp.asarray(x), "ab", jnp.asarray(y), "ab")
    np.testing.assert_allclose(np.asarray(got), alpha * x, rtol=1e-12)


def test_fuzz_wrapped_box_copies():
    """Randomized local_copy sweep vs the per-site toroidal oracle:
    wrapped source AND destination boxes, label permutations, copy/add,
    alpha variants — the breadth that caught the storage wrapped-seam
    bug (apply the same pressure to the local engine)."""
    from superbblas_tpu.utils.testing import numpy_copy_reference

    rng = np.random.default_rng(77)
    for case in range(25):
        nd = int(rng.integers(1, 4))
        labels = "abc"[:nd]
        dim0 = tuple(int(rng.integers(2, 7)) for _ in range(nd))
        perm = list(rng.permutation(nd))
        o0 = labels
        o1 = "".join(labels[i] for i in perm)
        dim1 = tuple(int(rng.integers(2, 7)) for _ in range(nd))
        # size must fit BOTH frames per matching label
        size0 = tuple(
            int(rng.integers(1, min(dim0[i],
                                    dim1[o1.index(o0[i])]) + 1))
            for i in range(nd))
        from0 = tuple(int(rng.integers(0, d)) for d in dim0)
        from1 = tuple(int(rng.integers(0, d)) for d in dim1)
        copy_add = ["copy", "add"][int(rng.integers(0, 2))]
        alpha = [1.0, 2.5, -1.0][int(rng.integers(0, 3))]
        x = rng.standard_normal(dim0)
        y = rng.standard_normal(dim1)
        got = np.asarray(local_copy(alpha, jnp.asarray(x), o0,
                                    jnp.asarray(y), o1, from0=from0,
                                    size0=size0, from1=from1,
                                    copy_add=copy_add))
        want = numpy_copy_reference(alpha, x, o0, y, o1, from0, size0,
                                    from1, copy_add)
        np.testing.assert_allclose(got, want, atol=1e-12,
                                   err_msg=f"case {case}: {o0}->{o1} "
                                           f"{from0}{size0}->{from1} "
                                           f"{copy_add}")
