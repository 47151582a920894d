"""Pallas 2-D lane-major conv kernel + fusion-net dispatch parity tests.

Runs the kernel in interpret mode on CPU (Mosaic-lowering behavior is
covered by scripts/tpu_kernel_check.py on the real chip, per the verify
skill). The reference is XLA's NHWC conv at HIGHEST precision.
"""

import functools
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.experimental import pallas as pl

from mode_tpu.ops.pallas import conv2d_kernel as c2
from mode_tpu.ops.pallas import conv3d_kernel as c3


@pytest.fixture
def interpret_pallas(monkeypatch):
  orig = pl.pallas_call
  monkeypatch.setattr(pl, "pallas_call",
                      functools.partial(orig, interpret=True))


def _xla_ref(x, w, scale, bias, residual, relu):
  dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
  y = lax.conv_general_dilated(x, w, (1, 1), [(1, 1)] * 2,
                               dimension_numbers=dn,
                               precision=lax.Precision.HIGHEST)
  if scale is not None:
    y = y * scale + bias
  if residual is not None:
    y = y + residual
  if relu:
    y = jnp.maximum(y, 0.0)
  return y


@pytest.mark.parametrize("shape,cout,res,relu", [
    ((1, 16, 128, 8), 16, False, True),       # lanes = W
    ((2, 8, 256, 16), 8, True, True),         # batch, residual, 256 lanes
    ((1, 128, 24, 8), 8, False, False),       # lanes = H
    ((1, 12, 128, 8), 8, True, False),        # odd-ish M (mb fallback)
])
def test_conv2d_band_pallas_parity(interpret_pallas, shape, cout, res, relu):
  b, h, w, c = shape
  key = jax.random.PRNGKey(0)
  k1, k2, k3, k4, k5 = jax.random.split(key, 5)
  x = jax.random.normal(k1, shape, jnp.float32) * 0.3
  wgt = jax.random.normal(k2, (3, 3, c, cout), jnp.float32) * 0.1
  scale = jax.random.normal(k3, (cout,), jnp.float32) * 0.2 + 1.0
  bias = jax.random.normal(k4, (cout,), jnp.float32) * 0.1
  residual = (jax.random.normal(k5, (b, h, w, cout), jnp.float32) * 0.3
              if res else None)

  got = c2.conv2d_fused(x, wgt, scale, bias, residual, relu=relu)
  ref = _xla_ref(x, wgt, scale, bias, residual, relu)
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                             rtol=1e-4, atol=1e-4)


def test_conv2d_fast_grads_match_xla(interpret_pallas):
  """The custom-VJP wrapper's grads equal the XLA conv's."""
  key = jax.random.PRNGKey(1)
  k1, k2 = jax.random.split(key)
  x = jax.random.normal(k1, (1, 8, 128, 8), jnp.float32) * 0.3
  w = jax.random.normal(k2, (3, 3, 8, 8), jnp.float32) * 0.1

  def loss_fast(x, w):
    return jnp.sum(jnp.sin(c2.conv2d_3x3_fast(x, w)))

  def loss_xla(x, w):
    return jnp.sum(jnp.sin(c2._conv2d_xla(x, w)))

  gx_f, gw_f = jax.grad(loss_fast, argnums=(0, 1))(x, w)
  gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
  np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x),
                             rtol=1e-4, atol=1e-4)
  np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_x),
                             rtol=1e-4, atol=1e-4)


def test_fusion_net_pallas_dispatch_parity(interpret_pallas):
  """ModeFusion eval forward with the Pallas mode forced on — which takes
  the lane-major `_forward_lane` path (fused BN/ReLU epilogues, lane-major
  XLA at the small-lane deep level) — equals the pure-XLA NHWC forward at
  random weights, with the param tree unchanged either way."""
  from mode_tpu.models.fusion import ModeFusion

  h, w = 32, 128
  key = jax.random.PRNGKey(2)
  model = ModeFusion(max_depth=1000.0)
  depths = [jax.random.uniform(jax.random.fold_in(key, i), (1, h, w, 1),
                               jnp.float32, 0, 100) for i in range(6)]
  confs = [jax.random.uniform(jax.random.fold_in(key, 10 + i), (1, h, w, 1))
           for i in range(6)]
  rgbs = [jax.random.normal(jax.random.fold_in(key, 20 + i), (1, h, w, 3))
          for i in range(4)]

  variables = model.init(key, depths, confs, rgbs, train=False)
  y_xla = model.apply(variables, depths, confs, rgbs, train=False)

  c3.set_conv3d_pallas("on")
  try:
    y_pallas = model.apply(variables, depths, confs, rgbs, train=False)
  finally:
    c3.set_conv3d_pallas("auto")
  np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_xla),
                             rtol=2e-3, atol=2e-3)


def _xla_ref_dil(x, w, scale, bias, residual, relu, dil):
  dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
  y = lax.conv_general_dilated(x, w, (1, 1), [(dil, dil)] * 2,
                               rhs_dilation=(dil, dil),
                               dimension_numbers=dn,
                               precision=lax.Precision.HIGHEST)
  if scale is not None:
    y = y * scale + bias
  if residual is not None:
    y = y + residual
  if relu:
    y = jnp.maximum(y, 0.0)
  return y


@pytest.mark.parametrize("b,m,c,cout,lanes,g,dil,res,relu", [
    (4, 8, 8, 8, 128, 2, 1, False, True),
    (6, 8, 16, 8, 128, 3, 1, True, True),
    (6, 16, 8, 16, 128, 6, 1, True, False),
    (6, 8, 16, 16, 128, 3, 2, True, True),    # layer3 config: dilation 2
    (2, 8, 8, 8, 256, 2, 2, False, False),
])
def test_conv2d_band_bpack_parity(interpret_pallas, b, m, c, cout, lanes,
                                  g, dil, res, relu):
  """Batch-packed band kernel == XLA dilated NHWC conv (images must stay
  independent: the per-image edge-lane masks are the bit that's new)."""
  key = jax.random.PRNGKey(3)
  k1, k2, k3, k4, k5 = jax.random.split(key, 5)
  xn = jax.random.normal(k1, (b, m, lanes, c), jnp.float32) * 0.3
  wgt = jax.random.normal(k2, (3, 3, c, cout), jnp.float32) * 0.1
  scale = jax.random.normal(k3, (cout,), jnp.float32) * 0.2 + 1.0
  bias = jax.random.normal(k4, (cout,), jnp.float32) * 0.1
  resn = (jax.random.normal(k5, (b, m, lanes, cout), jnp.float32) * 0.3
          if res else None)

  xl = jnp.transpose(xn, (0, 1, 3, 2))
  rl = None if resn is None else jnp.transpose(resn, (0, 1, 3, 2))
  got = c2.conv2d_band_bpack(xl, wgt, scale, bias, rl, relu=relu, g=g,
                             dilation=dil)
  ref = _xla_ref_dil(xn, wgt, scale, bias, resn, relu, dil)
  np.testing.assert_allclose(np.asarray(jnp.transpose(got, (0, 1, 3, 2))),
                             np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fe_lane_stage_dispatch_parity(interpret_pallas):
  """SphereFeatureExtraction eval with the Pallas mode forced on — layers
  1-3 lane-resident with batch-packed convs (incl. layer2's stride-2 lane
  XLA convs and layer3's dilation-2 packed convs) — equals the NHWC XLA
  path at random weights, same param tree."""
  from mode_tpu.models.disparity import SphereFeatureExtraction

  b, h, w = 6, 256, 512                      # ERP 2:1, lane-eligible W
  key = jax.random.PRNGKey(4)
  x = jax.random.normal(key, (b, h, w, 3), jnp.float32) * 0.5
  model = SphereFeatureExtraction(sphere_type="ERP")
  variables = model.init(key, x, train=False)
  y_xla = model.apply(variables, x, train=False)

  c3.set_conv3d_pallas("on")
  try:
    y_lane = model.apply(variables, x, train=False)
  finally:
    c3.set_conv3d_pallas("auto")
  assert y_lane.shape == y_xla.shape
  np.testing.assert_allclose(np.asarray(y_lane), np.asarray(y_xla),
                             rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("dil,g", [(1, 2), (2, 2)])
def test_conv2d_bpack_train_grads_match_xla(interpret_pallas, dil, g):
  """The batch-packed training conv's custom VJP (packed fwd + packed
  grad-input + XLA grad-weight) equals the XLA conv's gradients."""
  key = jax.random.PRNGKey(5)
  k1, k2 = jax.random.split(key)
  x = jax.random.normal(k1, (2, 8, 128, 8), jnp.float32) * 0.3
  w = jax.random.normal(k2, (3, 3, 8, 8), jnp.float32) * 0.1

  def loss_fast(x, w):
    return jnp.sum(jnp.sin(c2.conv2d_3x3_fast_train(x, w, g, dil)))

  def loss_xla(x, w):
    return jnp.sum(jnp.sin(c2._conv2d_xla_dil(x, w, dil)))

  gx_f, gw_f = jax.grad(loss_fast, argnums=(0, 1))(x, w)
  gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
  np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x),
                             rtol=1e-4, atol=1e-4)
  np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_x),
                             rtol=1e-4, atol=1e-4)
