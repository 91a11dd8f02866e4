"""Context/async layer and AOT export tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from superbblas_tpu import aot, context
from superbblas_tpu import local_contraction


def test_context_and_make_sure():
    ctx = context.create_cpu_context()
    x = context.make_sure(jnp.ones((2, 2)), ctx)
    assert x.devices() == {ctx.device}


def test_wait_returns_value():
    y = jnp.ones((4,)) * 3
    out = context.wait(y)
    np.testing.assert_array_equal(np.asarray(out), 3 * np.ones(4))


def test_concurrent_scope_runs():
    with context.concurrent("fork"):
        a = jnp.ones((4,)).sum()
    assert float(a) == 4.0


def test_aot_compile_and_export(tmp_path):
    def f(a, b):
        return local_contraction(1.0, a, "ij", False, b, "jk", False,
                                 0.0, None, "ik")

    a = jnp.ones((4, 5))
    b = jnp.ones((5, 6))
    exe = aot.aot_compile(f, (a, b))
    np.testing.assert_allclose(np.asarray(exe(a, b)), np.asarray(f(a, b)))

    p = str(tmp_path / "op.bin")
    aot.export_compiled(f, (a, b), p)
    g = aot.load_exported(p)
    np.testing.assert_allclose(np.asarray(g(a, b)), np.asarray(f(a, b)))
