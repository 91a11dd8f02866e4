"""Tests for label-driven local contraction.

Sweep mirrors the reference's tests/contract.cpp:41-433: rank splits
NT/NA/NB/NC in {0,1,2}, label-order permutations, conjugation flags, and
alpha/beta in {0, +-1, other}.  Oracle: numpy einsum.
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from superbblas_tpu import local_contraction


def rand(shape, dtype, rng):
    if np.issubdtype(dtype, np.complexfloating):
        return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(dtype)
    return rng.standard_normal(shape).astype(dtype)


def oracle(alpha, x0, o0, conj0, x1, o1, conj1, beta, r, o_r):
    a = np.conj(x0) if conj0 else x0
    b = np.conj(x1) if conj1 else x1
    out = alpha * np.einsum(f"{o0},{o1}->{o_r}", a, b)
    if r is not None and beta != 0:
        out = out + beta * r
    return out


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_matmul_basic(dtype):
    rng = np.random.default_rng(0)
    a = rand((4, 5), dtype, rng)
    b = rand((5, 6), dtype, rng)
    r = rand((4, 6), dtype, rng)
    got = local_contraction(2.0, jnp.asarray(a), "ij", False,
                            jnp.asarray(b), "jk", False,
                            0.5, jnp.asarray(r), "ik")
    np.testing.assert_allclose(np.asarray(got),
                               oracle(2.0, a, "ij", False, b, "jk", False, 0.5, r, "ik"),
                               rtol=1e-12)


def test_batched_with_transpose_output():
    rng = np.random.default_rng(1)
    a = rand((3, 4, 5), np.float64, rng)   # t a b
    b = rand((5, 3, 6), np.float64, rng)   # b t c  (note: 'b' contracted here)
    got = local_contraction(1.0, jnp.asarray(a), "tab", False,
                            jnp.asarray(b), "btc", False,
                            0.0, None, "cat")
    want = oracle(1.0, a, "tab", False, b, "btc", False, 0.0, None, "cat")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


def test_conjugation():
    rng = np.random.default_rng(2)
    a = rand((4, 5), np.complex128, rng)
    b = rand((5, 6), np.complex128, rng)
    for c0, c1 in itertools.product([False, True], repeat=2):
        got = local_contraction(1.0, jnp.asarray(a), "ij", c0,
                                jnp.asarray(b), "jk", c1, 0.0, None, "ik")
        want = oracle(1.0, a, "ij", c0, b, "jk", c1, 0.0, None, "ik")
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


def test_no_contracted_labels_outer_product():
    rng = np.random.default_rng(3)
    a = rand((3, 4), np.float64, rng)
    b = rand((3, 5), np.float64, rng)
    got = local_contraction(1.0, jnp.asarray(a), "tb", False,
                            jnp.asarray(b), "tc", False, 0.0, None, "tcb")
    want = oracle(1.0, a, "tb", False, b, "tc", False, 0.0, None, "tcb")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


def test_full_reduction_to_batch_only():
    rng = np.random.default_rng(4)
    a = rand((3, 4, 5), np.float64, rng)
    b = rand((3, 4, 5), np.float64, rng)
    got = local_contraction(1.0, jnp.asarray(a), "tab", False,
                            jnp.asarray(b), "tab", False, 0.0, None, "t")
    want = oracle(1.0, a, "tab", False, b, "tab", False, 0.0, None, "t")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


def test_reference_style_sweep():
    """Exhaustive small sweep in the spirit of tests/contract.cpp."""
    rng = np.random.default_rng(5)
    dims = {"t": 2, "a": 3, "b": 2, "c": 3}
    for nT, nA, nB, nC in itertools.product([0, 1], repeat=4):
        T = "t" if nT else ""
        A = "a" if nA else ""
        B = "b" if nB else ""
        C = "c" if nC else ""
        o0 = T + A + B
        o1 = T + A + C
        o_r = T + B + C
        if not o0 or not o1:
            continue
        shape0 = tuple(dims[c] for c in o0)
        shape1 = tuple(dims[c] for c in o1)
        x0 = rand(shape0, np.complex128, rng)
        x1 = rand(shape1, np.complex128, rng)
        # label-order rotations of each operand (the reference sweeps all
        # permutations; rotations keep coverage of every leading label while
        # bounding XLA compile count)
        def rotations(n):
            return [tuple((i + r) % n for i in range(n)) for r in range(max(n, 1))]

        for p0 in rotations(len(o0)):
            o0p = "".join(o0[i] for i in p0)
            x0p = np.transpose(x0, p0) if p0 else x0
            for p1 in rotations(len(o1)):
                o1p = "".join(o1[i] for i in p1)
                x1p = np.transpose(x1, p1) if p1 else x1
                for alpha, beta in [(1.0, 0.0), (2.0, -0.5)]:
                    shape_r = tuple(dims[c] for c in o_r)
                    r = rand(shape_r, np.complex128, rng) if o_r else rand((), np.complex128, rng)
                    got = local_contraction(alpha, jnp.asarray(x0p), o0p, False,
                                            jnp.asarray(x1p), o1p, True,
                                            beta, jnp.asarray(r), o_r)
                    want = oracle(alpha, x0p, o0p, False, x1p, o1p, True, beta, r, o_r)
                    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10,
                                               err_msg=f"{o0p},{o1p}->{o_r}")


def test_rejects_unmatched_labels():
    a = jnp.zeros((2, 3))
    b = jnp.zeros((3, 4))
    with pytest.raises(ValueError, match="unmatched"):
        local_contraction(1.0, a, "ix", False, b, "jk", False, 0.0, None, "ik")


def test_f32_accumulates_f32():
    rng = np.random.default_rng(6)
    a = rand((128, 256), np.float32, rng)
    b = rand((256, 64), np.float32, rng)
    got = local_contraction(1.0, jnp.asarray(a), "ij", False,
                            jnp.asarray(b), "jk", False, 0.0, None, "ik")
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), a @ b, rtol=1e-4, atol=1e-4)


def test_randomized_alpha_beta_conj_sweep():
    """Reference-style breadth (tests/contract.cpp:41-433): random label
    splits, dims in {1,2,3}, alpha/beta in {0, +-1, 0.5}, +-conj per
    operand, against a numpy einsum oracle."""
    import numpy as np

    from superbblas_tpu import local_contraction
    from superbblas_tpu.utils.testing import numpy_contraction_reference

    rng = np.random.default_rng(42)
    labels = "tabcde"
    for case in range(60):
        nT, nA, nB, nC = rng.integers(0, 3, size=4)
        if nT + nA + nB + nC == 0:
            continue
        T = labels[:nT]
        A = labels[nT:nT + nA]
        Bl = labels[nT + nA:nT + nA + nB]
        C = labels[nT + nA + nB:nT + nA + nB + nC]
        dims = {c: int(rng.integers(1, 4)) for c in labels}
        o0 = "".join(rng.permutation(list(T + A + Bl))) if T + A + Bl else ""
        o1 = "".join(rng.permutation(list(T + A + C))) if T + A + C else ""
        o_r = "".join(rng.permutation(list(T + Bl + C))) if T + Bl + C else ""
        if not o0 or not o1 or not o_r:
            continue
        sh0 = tuple(dims[c] for c in o0)
        sh1 = tuple(dims[c] for c in o1)
        shr = tuple(dims[c] for c in o_r)
        x0 = rng.standard_normal(sh0)
        x1 = rng.standard_normal(sh1)
        r0 = rng.standard_normal(shr)
        alpha = float(rng.choice([0.0, 1.0, -1.0, 0.5]))
        beta = float(rng.choice([0.0, 1.0, -1.0, 0.5]))
        conj0 = bool(rng.integers(2))
        conj1 = bool(rng.integers(2))

        want = numpy_contraction_reference(
            alpha, x0, o0, conj0, x1, o1, conj1, beta, r0, o_r)
        got = local_contraction(
            alpha, jnp.asarray(x0), o0, conj0, jnp.asarray(x1), o1, conj1,
            beta, jnp.asarray(r0), o_r)
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-10, atol=1e-12,
            err_msg=f"case {case}: {o0},{o1}->{o_r} a={alpha} b={beta} "
                    f"c0={conj0} c1={conj1} dims={dims}")
