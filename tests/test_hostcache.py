"""Host-cache plumbing for jit-constant operators (utils/hostcache.py).

On the tunneled TPU platform, jit LOWERING embeds closure constants by
reading the array's host value — a device->host fetch that measured
78-953 s per operator constant when the tunnel data plane stalls
(round 5).  Operator constructors therefore attach the numpy value they
were built from; these tests pin the invariants that keep that path
alive: caches exist on every constructor output (including through the
SoA layout permutation and the bf16 storage cast), cached values are
bit-identical to the device values, and the adjoint is built host-side
and memoized instead of being rebuilt eagerly at every trace.
"""

import jax
import jax.numpy as jnp
import numpy as np

from superbblas_tpu import cplx
from superbblas_tpu.models import wilson_operator
from superbblas_tpu.models.wilson import adjoint_operator
from superbblas_tpu.utils.hostcache import (
    asarray_cached, attach_host_cache, host_value)


def test_asarray_cached_roundtrip_and_demotion():
    h = np.arange(12, dtype=np.float32).reshape(3, 4)
    d = asarray_cached(h)
    hv = host_value(d)
    assert hv is not None
    np.testing.assert_array_equal(hv, np.asarray(d))
    assert not hv.flags.writeable
    # x64-off demotion keeps the cache bit-identical to the device value
    h64 = np.linspace(0, 1, 7, dtype=np.float64)
    d64 = asarray_cached(h64)
    hv64 = host_value(d64)
    if d64.dtype == jnp.float32:   # x64 disabled
        assert hv64.dtype == np.float32
    np.testing.assert_array_equal(hv64, np.asarray(d64))


def test_attach_rejects_mismatch():
    d = jnp.ones((2, 3), jnp.float32)
    attach_host_cache(d, np.ones((9,), np.float32))   # silent no-op
    assert host_value(d) is None or host_value(d).shape == (2, 3)


def test_operator_constructors_carry_host_caches():
    op = wilson_operator((4, 4, 4, 8), mass=0.1, key=3)
    for a in (op.blocks.re, op.blocks.im, op.kron.re, op.kron.im):
        hv = host_value(a)
        assert hv is not None
        np.testing.assert_array_equal(hv, np.asarray(a))
    # the SoA layout permutation runs host-side and keeps the cache
    op_s = wilson_operator((2, 2, 8, 128), mass=0.1, key=1, layout="soa")
    assert host_value(op_s.blocks.re) is not None
    np.testing.assert_array_equal(host_value(op_s.blocks.re),
                                  np.asarray(op_s.blocks.re))
    # the bf16 storage cast preserves it too
    from superbblas_tpu.bsr import bsr_cast_storage

    op_b = bsr_cast_storage(op_s, jnp.bfloat16)
    assert op_b.blocks.re.dtype == jnp.bfloat16
    assert host_value(op_b.blocks.re) is not None


def test_adjoint_memoized_and_host_built():
    op = wilson_operator((4, 4, 4, 8), mass=0.1, key=3)
    adj = adjoint_operator(op)
    assert adjoint_operator(op) is adj
    assert adjoint_operator(adj) is op
    assert host_value(adj.blocks.re) is not None
    # host-built adjoint must EQUAL the device-built one: strip the
    # caches by round-tripping the blocks through plain device arrays
    import dataclasses

    op_dev = dataclasses.replace(
        op, blocks=cplx.CArray(jnp.asarray(np.asarray(op.blocks.re)),
                               jnp.asarray(np.asarray(op.blocks.im))))
    assert host_value(op_dev.blocks.re) is None
    adj_dev = adjoint_operator(op_dev)
    np.testing.assert_allclose(np.asarray(adj.blocks.re),
                               np.asarray(adj_dev.blocks.re), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(adj.blocks.im),
                               np.asarray(adj_dev.blocks.im), rtol=0, atol=0)


def test_lowering_uses_cache_without_fetch(monkeypatch):
    """jit-lowering a program that closes over a cached operator must not
    fetch the blocks from the device (the 78-953 s tunnel stall class)."""
    import jax._src.array as jarray

    op = wilson_operator((4, 4, 4, 8), mass=0.1, key=5)
    from superbblas_tpu.models import apply_wilson

    x = cplx.CArray(jnp.ones((4, 4, 4, 8, 4, 3, 1), op.blocks.re.dtype),
                    jnp.zeros((4, 4, 4, 8, 4, 3, 1), op.blocks.re.dtype))

    fetched = []
    orig = jarray.ArrayImpl._single_device_array_to_np_array_did_copy

    def spy(self):
        fetched.append(self.shape)
        return orig(self)

    monkeypatch.setattr(
        jarray.ArrayImpl,
        "_single_device_array_to_np_array_did_copy", spy)
    jax.jit(lambda v: apply_wilson(op, v)).lower(x)
    big = [s for s in fetched if np.prod(s) * 4 > 1 << 20]
    assert not big, f"lowering fetched large device constants: {big}"
