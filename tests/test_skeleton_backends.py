"""LUT and arithmetic simple-point backends must agree exactly."""
import numpy as np
import pytest

import jax.numpy as jnp

from nellie_tpu.kernels.simple_point import get_simple26_lut
from nellie_tpu.kernels.skeleton import (
    _deletable,
    _deletable_arith,
    _deletable_packed,
    skeletonize_3d,
)

# compile-heavy: runs in the CI tests-slow job, not the fast path
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("p", [0.2, 0.5, 0.8])
def test_deletable_backends_agree(rng, p):
    fg = jnp.asarray(rng.random((20, 24, 25)) < p)
    lut = jnp.asarray(get_simple26_lut())
    ref = np.asarray(_deletable(fg, lut))
    np.testing.assert_array_equal(ref, np.asarray(_deletable_arith(fg)))
    np.testing.assert_array_equal(ref, np.asarray(_deletable_packed(fg)))


def test_skeleton_backends_agree(rng):
    z, y, x = np.mgrid[0:16, 0:24, 0:40]
    mask = (((z - 8) ** 2) * 0.5 + (y - 12 + 4 * np.sin(x / 6.0)) ** 2) <= 8
    a = np.asarray(skeletonize_3d(jnp.asarray(mask), backend="arith"))
    b = np.asarray(skeletonize_3d(jnp.asarray(mask), backend="lut"))
    c = np.asarray(skeletonize_3d(jnp.asarray(mask), backend="packed"))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)
