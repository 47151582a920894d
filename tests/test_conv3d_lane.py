"""Pallas conv3d kernel + lane-major mid-section parity tests.

Runs the kernel in interpret mode on CPU (Mosaic-lowering behavior is
covered by scripts/tpu_kernel_check.py on the real chip, per the verify
skill). The reference is XLA's NDHWC conv3d at HIGHEST precision.
"""

import functools
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.experimental import pallas as pl

from mode_tpu.ops.pallas import conv3d_kernel as ck


@pytest.fixture
def interpret_pallas(monkeypatch):
  orig = pl.pallas_call
  monkeypatch.setattr(pl, "pallas_call",
                      functools.partial(orig, interpret=True))


def _xla_ref(x, w, scale, bias, residual, relu):
  dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                  ("NDHWC", "DHWIO", "NDHWC"))
  y = lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                               dimension_numbers=dn,
                               precision=lax.Precision.HIGHEST)
  y = y * scale + bias
  if residual is not None:
    y = y + residual
  if relu:
    y = jnp.maximum(y, 0.0)
  return y


@pytest.mark.parametrize("shape,cout,res,relu", [
    ((1, 4, 8, 128, 8), 16, False, True),     # lanes = W
    ((2, 4, 16, 128, 16), 8, True, True),     # batch, residual
    ((1, 4, 128, 16, 8), 8, True, False),     # lanes = H
    ((1, 8, 24, 256, 8), 8, False, False),    # 256 lanes, odd-ish M
    ((1, 4, 8, 128, 8), 1, False, False),     # narrow head (cout padded)
])
def test_conv3d_band_pallas_parity(interpret_pallas, shape, cout, res, relu):
  b, d, h, w, c = shape
  key = jax.random.PRNGKey(0)
  k1, k2, k3, k4, k5 = jax.random.split(key, 5)
  x = jax.random.normal(k1, shape, jnp.float32) * 0.3
  wgt = jax.random.normal(k2, (3, 3, 3, c, cout), jnp.float32) * 0.1
  scale = jax.random.normal(k3, (cout,), jnp.float32) * 0.2 + 1.0
  bias = jax.random.normal(k4, (cout,), jnp.float32) * 0.1
  residual = (jax.random.normal(k5, (b, d, h, w, cout), jnp.float32) * 0.3
              if res else None)

  la = ck.lane_axis_for(shape)
  y = ck.conv3d_band_pallas(
      ck.to_lane_major(x, la), ck.weight_lane_major(wgt, la), scale, bias,
      None if residual is None else ck.to_lane_major(residual, la),
      relu=relu)
  y = ck.from_lane_major(y, la)
  ref = _xla_ref(x, wgt, scale, bias, residual, relu)
  np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                             rtol=1e-5, atol=1e-5)


def test_lane_mid_section_matches_ndhwc(interpret_pallas):
  """Full ModeDisparity eval: lane-major fast path == NDHWC path."""
  from mode_tpu.models.disparity import ModeDisparity

  # cost volume (1, 4, 64, 128, 64) — lane-eligible (W/4 = 128 lanes).
  # Regular FE: the mid-section under test is identical, and it has no
  # 2:1-panorama constraint, so the test stays CPU-sized.
  h, w, maxdisp = 256, 512, 16
  model = ModeDisparity(maxdisp=maxdisp, conv="Regular", out_conf=True)
  key = jax.random.PRNGKey(0)
  left = jax.random.normal(key, (1, h, w, 3), jnp.float32) * 0.5
  right = jnp.roll(left, 2, axis=2)
  variables = model.init(jax.random.PRNGKey(1), left, right, train=False)

  ck.set_conv3d_pallas("off")
  try:
    ref_pred, ref_conf = model.apply(variables, left, right, train=False)
    ck.set_conv3d_pallas("on")
    lane_pred, lane_conf = model.apply(variables, left, right, train=False)
  finally:
    ck.set_conv3d_pallas("auto")

  np.testing.assert_allclose(np.asarray(lane_pred), np.asarray(ref_pred),
                             rtol=2e-4, atol=2e-4)
  np.testing.assert_allclose(np.asarray(lane_conf), np.asarray(ref_conf),
                             rtol=2e-4, atol=2e-4)


def _xla_ref_s2(x, w, scale, bias, relu):
  dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                  ("NDHWC", "DHWIO", "NDHWC"))
  y = lax.conv_general_dilated(x, w, (2, 2, 2), [(1, 1)] * 3,
                               dimension_numbers=dn,
                               precision=lax.Precision.HIGHEST)
  y = y * scale + bias
  if relu:
    y = jnp.maximum(y, 0.0)
  return y


@pytest.mark.parametrize("shape,cout,relu", [
    ((1, 4, 8, 16, 128), 16, True),           # lanes = W (conv1 shape class)
    ((2, 4, 16, 8, 256), 8, False),           # batch, 256 lanes
    ((1, 8, 4, 8, 128), 8, True),             # deep D
])
def test_conv3d_band_s2_parity(interpret_pallas, shape, cout, relu):
  """Stride-2 band kernel == XLA stride-2 conv (lane-major in/out)."""
  b, d, m, c, lanes = shape
  key = jax.random.PRNGKey(3)
  k1, k2, k3, k4 = jax.random.split(key, 4)
  xl = jax.random.normal(k1, shape, jnp.float32) * 0.3
  wgt = jax.random.normal(k2, (3, 3, 3, c, cout), jnp.float32) * 0.1
  scale = jax.random.normal(k3, (cout,), jnp.float32) * 0.2 + 1.0
  bias = jax.random.normal(k4, (cout,), jnp.float32) * 0.1

  y = ck.conv3d_band_s2_pallas(xl, wgt, scale, bias, relu=relu)
  assert y.shape == (b, d // 2, m // 2, cout, lanes // 2)

  # reference in NDHWC: lane axis plays W
  x_ndhwc = jnp.transpose(xl, (0, 1, 2, 4, 3))
  ref = _xla_ref_s2(x_ndhwc, wgt, scale[None, None, None, None],
                    bias[None, None, None, None], relu)
  ref = jnp.transpose(ref, (0, 1, 2, 4, 3))
  np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                             rtol=1e-5, atol=1e-5)


def _xla_ref_deconv(x, kernel_t, scale, bias, relu):
  w_flipped = jnp.flip(kernel_t, axis=(0, 1, 2))
  w_io = jnp.swapaxes(w_flipped, -1, -2)
  dn = lax.conv_dimension_numbers(x.shape, w_io.shape,
                                  ("NDHWC", "DHWIO", "NDHWC"))
  y = lax.conv_general_dilated(
      x, w_io, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
      dimension_numbers=dn, precision=lax.Precision.HIGHEST)
  y = y * scale + bias
  if relu:
    y = jnp.maximum(y, 0.0)
  return y


@pytest.mark.parametrize("shape,cout,relu,la", [
    ((1, 4, 8, 16, 128), 16, True, 3),        # lanes = W (conv6 class)
    ((2, 2, 4, 8, 256), 8, False, 3),         # batch, 256 lanes
    ((1, 4, 8, 8, 128), 8, True, 2),          # lanes = H
])
def test_conv3d_band_deconv_parity(interpret_pallas, shape, cout, relu, la):
  """Deconv band kernel == XLA ConvTranspose3d(k3 s2 p1 op1)."""
  b, d, m, c, lanes = shape
  key = jax.random.PRNGKey(5)
  k1, k2, k3, k4 = jax.random.split(key, 4)
  xl = jax.random.normal(k1, shape, jnp.float32) * 0.3
  kernel_t = jax.random.normal(k2, (3, 3, 3, cout, c), jnp.float32) * 0.1
  scale = jax.random.normal(k3, (cout,), jnp.float32) * 0.2 + 1.0
  bias = jax.random.normal(k4, (cout,), jnp.float32) * 0.1

  y = ck.conv3d_band_deconv_pallas(xl, kernel_t, scale, bias, relu=relu,
                                   lane_axis=la)
  assert y.shape == (b, 2 * d, 2 * m, cout, 2 * lanes)

  # reference in NDHWC: band axis plays H, lane axis plays W (or swapped)
  x_ndhwc = jnp.transpose(xl, (0, 1, 2, 4, 3))
  kt = kernel_t if la == 3 else jnp.transpose(kernel_t, (0, 2, 1, 3, 4))
  ref = _xla_ref_deconv(x_ndhwc, kt, scale[None, None, None, None],
                        bias[None, None, None, None], relu)
  ref = jnp.transpose(ref, (0, 1, 2, 4, 3))
  np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                             rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,cout,relu,la", [
    ((1, 4, 8, 16, 16), 16, True, 3),    # F = 128
    ((2, 2, 4, 8, 32), 8, False, 3),     # batch
    ((1, 3, 16, 8, 16), 8, True, 2),     # lanes = H, F = 256
])
def test_conv3d_fold_deconv_parity(interpret_pallas, shape, cout, relu, la):
  """Folded-lane deconv == XLA ConvTranspose3d(k3 s2 p1 op1)."""
  b, d, m, c, lanes = shape
  key = jax.random.PRNGKey(11)
  k1, k2, k3, k4 = jax.random.split(key, 4)
  xl = jax.random.normal(k1, shape, jnp.float32) * 0.3
  kernel_t = jax.random.normal(k2, (3, 3, 3, cout, c), jnp.float32) * 0.1
  scale = jax.random.normal(k3, (cout,), jnp.float32) * 0.2 + 1.0
  bias = jax.random.normal(k4, (cout,), jnp.float32) * 0.1

  y = ck.conv3d_fold_deconv_pallas(xl, kernel_t, scale, bias, relu=relu,
                                   lane_axis=la)
  assert y.shape == (b, 2 * d, 2 * m, cout, 2 * lanes)

  x_ndhwc = jnp.transpose(xl, (0, 1, 2, 4, 3))
  kt = kernel_t if la == 3 else jnp.transpose(kernel_t, (0, 2, 1, 3, 4))
  ref = _xla_ref_deconv(x_ndhwc, kt, scale[None, None, None, None],
                        bias[None, None, None, None], relu)
  ref = jnp.transpose(ref, (0, 1, 2, 4, 3))
  np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                             rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,cout,relu", [
    ((1, 4, 8, 16, 16), 16, True),      # F = 128, db = 4
    ((2, 4, 4, 8, 32), 8, False),       # F = 128, batch
    ((1, 6, 16, 8, 16), 8, True),       # F = 256, db = 2
    ((1, 3, 32, 16, 64), 16, True),     # conv4-like fold (F = 2048), db = 1
])
def test_conv3d_fold_parity(interpret_pallas, shape, cout, relu):
  """Folded-lane (M·L on the lanes) kernel == XLA stride-1 conv."""
  b, d, m, c, lanes = shape
  key = jax.random.PRNGKey(7)
  k1, k2, k3, k4 = jax.random.split(key, 4)
  xl = jax.random.normal(k1, shape, jnp.float32) * 0.3
  wgt = jax.random.normal(k2, (3, 3, 3, c, cout), jnp.float32) * 0.1
  scale = jax.random.normal(k3, (cout,), jnp.float32) * 0.2 + 1.0
  bias = jax.random.normal(k4, (cout,), jnp.float32) * 0.1

  y = ck.conv3d_fold_pallas(xl, wgt, scale, bias, relu=relu)
  assert y.shape == (b, d, m, cout, lanes)

  # reference in NDHWC: M plays H, the lane axis plays W
  x_ndhwc = jnp.transpose(xl, (0, 1, 2, 4, 3))
  ref = _xla_ref(x_ndhwc, wgt, scale, bias, None, relu)
  ref = jnp.transpose(ref, (0, 1, 2, 4, 3))
  np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                             rtol=1e-5, atol=1e-5)


def test_lane_gate_rejects_ineligible():
  assert not ck.band_pallas_ok((1, 4, 16, 30, 128), 32)   # C % 8
  assert not ck.band_pallas_ok((1, 4, 16, 32, 96), 32)    # lanes % 128
  ck.set_conv3d_pallas("off")
  try:
    assert not ck.band_pallas_ok((1, 4, 16, 32, 128), 32)
  finally:
    ck.set_conv3d_pallas("auto")
  # fold gate: full-lane shapes belong to the band kernel; C % 8 rejected
  ck.set_conv3d_pallas("on")
  try:
    assert not ck.fold_pallas_ok((1, 4, 16, 32, 128), 32)  # lanes full
    assert not ck.fold_pallas_ok((1, 4, 16, 30, 64), 32)   # C % 8
    assert not ck.fold_pallas_ok((1, 4, 3, 32, 17), 32)    # F % 128
    assert ck.fold_pallas_ok((1, 4, 32, 64, 64), 64)       # conv4 shape
    ck.set_fold_pallas("off")                              # fold-only off
    assert not ck.fold_pallas_ok((1, 4, 32, 64, 64), 64)
    assert not ck.fold_deconv_ok((1, 4, 32, 64, 64), 64)
    assert ck.band_pallas_ok((1, 4, 16, 32, 128), 32)      # band unaffected
  finally:
    ck.set_conv3d_pallas("auto")
    ck.set_fold_pallas("auto")


def test_conv3d_fold_custom_vjp_grads(interpret_pallas):
  """conv3d_fold_fast gradients == XLA conv gradients (1/16-class shape:
  no single axis fills the lanes, H*W folds to full tiles)."""
  key = jax.random.PRNGKey(4)
  k1, k2, k3 = jax.random.split(key, 3)
  b, d, h, w, c, cout = 1, 4, 16, 8, 8, 16
  x = jax.random.normal(k1, (b, d, h, w, c), jnp.float32) * 0.3
  wgt = jax.random.normal(k2, (3, 3, 3, c, cout), jnp.float32) * 0.1
  cot = jax.random.normal(k3, (b, d, h, w, cout), jnp.float32)

  def xla_conv(x_, w_):
    dn = lax.conv_dimension_numbers(x_.shape, w_.shape,
                                    ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(x_, w_, (1, 1, 1), [(1, 1)] * 3,
                                    dimension_numbers=dn,
                                    precision=lax.Precision.HIGHEST)

  def loss_ref(x_, w_):
    return jnp.sum(xla_conv(x_, w_) * cot)

  def loss_fast(x_, w_):
    return jnp.sum(ck.conv3d_fold_fast(x_, w_) * cot)

  y_ref = xla_conv(x, wgt)
  y = ck.conv3d_fold_fast(x, wgt)
  np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                             rtol=1e-4, atol=1e-4)
  dx_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, wgt)
  dx, dw = jax.grad(loss_fast, argnums=(0, 1))(x, wgt)
  np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                             rtol=1e-4, atol=1e-4)
  np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                             rtol=1e-4, atol=1e-4)


def test_conv3d_s2_fast_grads(interpret_pallas):
  """conv3d_s2_fast fwd + grads == XLA stride-2 conv autodiff. The shape
  puts 128 lanes on one axis for the band-s2 fwd while the cotangent's
  half-res shape routes the grad-input deconv through the FOLD kernel."""
  b, d, h, w, c, cout = 1, 4, 128, 16, 8, 16
  key = jax.random.PRNGKey(13)
  k1, k2, k3 = jax.random.split(key, 3)
  x = jax.random.normal(k1, (b, d, h, w, c), jnp.float32) * 0.3
  wgt = jax.random.normal(k2, (3, 3, 3, c, cout), jnp.float32) * 0.1
  cot = jax.random.normal(k3, (b, d // 2, h // 2, w // 2, cout), jnp.float32)

  ck.set_conv3d_pallas("on")
  prev_strided = ck._TRAIN_STRIDED
  ck.set_conv3d_train_strided(True)
  try:
    assert ck.train_s2_eligible((b, d, h, w, c), cout, 4)
    # cotangent (1, 2, 64, 8, 16): no 128 axis -> fold deconv route
    assert ck._deconv_route((b, d // 2, h // 2, w // 2, cout), c, 4)[0] == \
        "fold"

    def loss_ref(x_, w_):
      return jnp.sum(_xla_ref_s2(x_, w_, 1.0, 0.0, False) * cot)

    def loss_fast(x_, w_):
      return jnp.sum(ck.conv3d_s2_fast(x_, w_) * cot)

    np.testing.assert_allclose(
        np.asarray(ck.conv3d_s2_fast(x, wgt)),
        np.asarray(_xla_ref_s2(x, wgt, 1.0, 0.0, False)),
        rtol=1e-4, atol=1e-4)
    dx_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, wgt)
    dx, dw = jax.grad(loss_fast, argnums=(0, 1))(x, wgt)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)
  finally:
    ck.set_conv3d_pallas("auto")
    ck.set_conv3d_train_strided(prev_strided)


def test_convtranspose3d_fast_grads(interpret_pallas):
  """convtranspose3d_fast fwd + grads == XLA deconv autodiff. The input has
  no 128 axis (fold-deconv fwd); the doubled cotangent routes the
  grad-input through the band-s2 kernel."""
  b, d, h, w, c, cout = 1, 2, 64, 8, 8, 16
  key = jax.random.PRNGKey(17)
  k1, k2, k3 = jax.random.split(key, 3)
  x = jax.random.normal(k1, (b, d, h, w, c), jnp.float32) * 0.3
  kt = jax.random.normal(k2, (3, 3, 3, cout, c), jnp.float32) * 0.1
  cot = jax.random.normal(k3, (b, 2 * d, 2 * h, 2 * w, cout), jnp.float32)

  ck.set_conv3d_pallas("on")
  prev_strided = ck._TRAIN_STRIDED
  ck.set_conv3d_train_strided(True)
  try:
    assert ck.train_deconv_eligible((b, d, h, w, c), cout, 4)
    assert ck._deconv_route((b, d, h, w, c), cout, 4)[0] == "fold"
    assert ck._s2_route((b, 2 * d, 2 * h, 2 * w, cout), c, 4) is not None

    def ref(x_, k_):
      return _xla_ref_deconv(x_, k_, 1.0, 0.0, False)

    def loss_ref(x_, k_):
      return jnp.sum(ref(x_, k_) * cot)

    def loss_fast(x_, k_):
      return jnp.sum(ck.convtranspose3d_fast(x_, k_) * cot)

    np.testing.assert_allclose(np.asarray(ck.convtranspose3d_fast(x, kt)),
                               np.asarray(ref(x, kt)),
                               rtol=1e-4, atol=1e-4)
    dx_ref, dk_ref = jax.grad(loss_ref, argnums=(0, 1))(x, kt)
    dx, dk = jax.grad(loss_fast, argnums=(0, 1))(x, kt)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-4, atol=1e-4)
  finally:
    ck.set_conv3d_pallas("auto")
    ck.set_conv3d_train_strided(prev_strided)


def test_conv3d_custom_vjp_grads(interpret_pallas):
  """conv3d_ndhwc_fast gradients == XLA conv gradients (f32, interpret)."""
  key = jax.random.PRNGKey(2)
  k1, k2, k3 = jax.random.split(key, 3)
  b, d, h, w, c, cout = 1, 4, 8, 128, 8, 16
  x = jax.random.normal(k1, (b, d, h, w, c), jnp.float32) * 0.3
  wgt = jax.random.normal(k2, (3, 3, 3, c, cout), jnp.float32) * 0.1
  cot = jax.random.normal(k3, (b, d, h, w, cout), jnp.float32)

  def xla_conv(x_, w_):
    dn = lax.conv_dimension_numbers(x_.shape, w_.shape,
                                    ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(x_, w_, (1, 1, 1), [(1, 1)] * 3,
                                    dimension_numbers=dn,
                                    precision=lax.Precision.HIGHEST)

  def loss_ref(x_, w_):
    return jnp.sum(xla_conv(x_, w_) * cot)

  def loss_fast(x_, w_):
    return jnp.sum(ck.conv3d_ndhwc_fast(x_, w_) * cot)

  dx_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, wgt)
  dx, dw = jax.grad(loss_fast, argnums=(0, 1))(x, wgt)
  np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                             rtol=1e-4, atol=1e-4)
  np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                             rtol=1e-4, atol=1e-4)
