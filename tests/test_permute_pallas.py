"""Pallas tiled transpose (ops/permute_pallas.py) vs jnp.transpose.

Runs the kernel in interpret mode on the CPU test backend; the on-device
path is exercised by bench.py (~320 GB/s vs XLA's ~250 on v5e).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from superbblas_tpu.ops.permute_pallas import (
    pallas_permute,
    permute_eligible,
)


@pytest.mark.parametrize("perm", [(3, 2, 1, 0), (3, 1, 2, 0)])
@pytest.mark.parametrize("shape", [(16, 8, 8, 32), (16, 4, 8, 32),
                                   (8, 16, 24, 128)])
def test_matches_transpose(shape, perm):
    assert permute_eligible(shape, perm, jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    out = pallas_permute(x, perm, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.transpose(x, perm)))


def test_eligibility_gates():
    f32 = jnp.float32
    assert not permute_eligible((16, 8, 8), (2, 1, 0), f32)       # rank
    assert not permute_eligible((16, 8, 8, 32), (0, 1, 2, 3), f32)
    assert not permute_eligible((16, 8, 8, 32), (3, 2, 1, 0), jnp.float64)
    assert not permute_eligible((16, 9, 8, 32), (3, 2, 1, 0), f32)  # Y=9
    assert not permute_eligible((4096, 8, 8, 4096), (3, 2, 1, 0), f32)  # vmem
