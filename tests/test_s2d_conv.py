"""Phase-packed stride-2 conv / transpose-conv vs the direct XLA forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from mode_tpu.ops.s2d_conv import conv3d_stride2_s2d, deconv3d_stride2_d2s


def _direct_conv_s2(x, w):
  dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                  ("NDHWC", "DHWIO", "NDHWC"))
  return lax.conv_general_dilated(x, w, (2, 2, 2), [(1, 1)] * 3,
                                  dimension_numbers=dn,
                                  precision=lax.Precision.HIGHEST)


def _direct_deconv_s2(x, kernel_t):
  w_flipped = jnp.flip(kernel_t, axis=(0, 1, 2))
  w_io = jnp.swapaxes(w_flipped, -1, -2)
  dn = lax.conv_dimension_numbers(x.shape, w_io.shape,
                                  ("NDHWC", "DHWIO", "NDHWC"))
  return lax.conv_general_dilated(
      x, w_io, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
      dimension_numbers=dn, precision=lax.Precision.HIGHEST)


@pytest.mark.parametrize("shape,cout", [
    ((1, 8, 8, 4, 8), 16),
    ((2, 4, 6, 8, 16), 8),
])
def test_conv3d_stride2_s2d(shape, cout):
  key = jax.random.PRNGKey(0)
  k1, k2 = jax.random.split(key)
  x = jax.random.normal(k1, shape, jnp.float32) * 0.3
  w = jax.random.normal(k2, (3, 3, 3, shape[-1], cout), jnp.float32) * 0.1
  got = conv3d_stride2_s2d(x, w)
  ref = _direct_conv_s2(x, w)
  assert got.shape == ref.shape
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                             rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,cout", [
    ((1, 4, 4, 2, 8), 16),
    ((2, 2, 3, 4, 16), 8),
])
def test_deconv3d_stride2_d2s(shape, cout):
  key = jax.random.PRNGKey(1)
  k1, k2 = jax.random.split(key)
  x = jax.random.normal(k1, shape, jnp.float32) * 0.3
  kernel_t = jax.random.normal(k2, (3, 3, 3, cout, shape[-1]),
                               jnp.float32) * 0.1
  got = deconv3d_stride2_d2s(x, kernel_t)
  ref = _direct_deconv_s2(x, kernel_t)
  assert got.shape == ref.shape
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                             rtol=1e-5, atol=1e-5)
