"""Pallas sphere-conv kernel parity vs the XLA gather path (interpret mode
on CPU; the compiled TPU path is exercised by bench/verification)."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from mode_tpu.ops.pallas import sphere_conv_kernel as sck
from mode_tpu.ops.sphere_conv import gen_sphere_positions, sphere_conv_xla


def _interpret_pallas():
  orig = pl.pallas_call
  return mock.patch.object(
      pl, "pallas_call", lambda *a, **kw: orig(*a, **{**kw,
                                                      "interpret": True}))


@pytest.mark.parametrize("h,w,cin,cout,bj", [(32, 16, 8, 16, 8),
                                             (64, 32, 64, 64, 8),
                                             (64, 32, 16, 8, 4)])
def test_pallas_matches_xla(rng, h, w, cin, cout, bj):
  x = rng.normal(size=(2, h, w, cin)).astype(np.float32)
  wgt = (rng.normal(size=(3, 3, cin, cout)) * 0.2).astype(np.float32)
  ref = np.asarray(sphere_conv_xla(jnp.asarray(x), jnp.asarray(wgt)))
  with _interpret_pallas():
    out = np.asarray(sck.sphere_conv_cassini_pallas(
        jnp.asarray(x), jnp.asarray(wgt), block_j=bj))
  np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_shift_structure_invariants():
  """The kernel's decomposition assumptions hold on the position grid."""
  h, w, k = 64, 32, 3
  pos = gen_sphere_positions(h, w, k, k, "Cassini")
  # columns are exactly row-invariant
  assert np.abs(pos[..., 1] - pos[:, :1, :, 1]).max() == 0.0
  # rows are (i + delta) mod H up to f32 noise
  delta = pos[:, 0, :, 0]
  for i in (1, h // 2, h - 1):
    err = np.abs(pos[:, i, :, 0] - (i + delta) % h)
    err = np.minimum(err, h - err)
    assert err.max() < 1e-3
  # column offsets stay within the +-2 band
  assert np.abs(pos[:, 0, :, 1] - np.arange(w)[None]).max() < 2.0
