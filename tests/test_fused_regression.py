"""Fused regression-head kernel parity vs the XLA path (interpret mode)."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mode_tpu.models.disparity import (confidence_from_prob,
                                       disparity_regression)
from mode_tpu.ops.pallas.regression_kernel import fused_disparity_regression
from mode_tpu.ops.resize import upsample_trilinear


def _interpret_pallas():
  orig = pl.pallas_call
  return mock.patch.object(
      pl, "pallas_call", lambda *a, **kw: orig(*a, **{**kw,
                                                      "interpret": True}))


def test_fused_regression_matches_xla(rng):
  n, d, hq, wq = 2, 16, 32, 128
  maxdisp, h, w = 48, 128, 512
  cost = rng.normal(size=(n, d, hq, wq)).astype(np.float32) * 2.0

  up = upsample_trilinear(jnp.asarray(cost)[..., None], maxdisp, h, w)[..., 0]
  prob = jax.nn.softmax(up, axis=1)
  pred_ref = np.asarray(disparity_regression(prob, maxdisp))
  conf_ref = np.asarray(confidence_from_prob(prob, jnp.asarray(pred_ref),
                                             maxdisp))

  with _interpret_pallas():
    pred, conf = fused_disparity_regression(jnp.asarray(cost), maxdisp, h, w)
  np.testing.assert_allclose(np.asarray(pred), pred_ref, rtol=1e-4,
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(conf), conf_ref, rtol=1e-4,
                             atol=1e-4)
