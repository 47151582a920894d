"""Pallas kernels under a device mesh (shard_map wrappers).

The SPMD partitioner cannot split a Pallas custom call, so under a mesh
every Pallas fast path routes through ``mode_tpu.parallel.shard_ops``:
shard-local kernels + explicit ICI collectives (halo ppermute, dw psum).
These tests force the kernels ON in interpret mode under a (2 data x 4
spatial) virtual-CPU mesh and pin shard_map outputs against the
single-device kernels — the composition property the reference gets from
CUDA-op-under-DataParallel (``sphere_conv_cuda.cpp:129-210`` via
``train_disparity.py:264-265``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from mode_tpu.parallel import make_mesh
from mode_tpu.parallel import mesh as pmesh
from mode_tpu.parallel import shard_ops


@pytest.fixture
def interpret_pallas(monkeypatch):
  orig = pl.pallas_call
  monkeypatch.setattr(pl, "pallas_call",
                      functools.partial(orig, interpret=True))


@pytest.fixture
def mesh24():
  return make_mesh(data=2, spatial=4)


@pytest.mark.parametrize("res,relu", [(False, True), (True, False)])
def test_sharded_conv3d_band_matches_single(interpret_pallas, mesh24, res,
                                            relu):
  from mode_tpu.ops.pallas.conv3d_kernel import conv3d_band_pallas

  b, d, m, c, lanes, cout = 2, 4, 16, 8, 128, 16
  key = jax.random.PRNGKey(0)
  k1, k2, k3, k4, k5 = jax.random.split(key, 5)
  x = jax.random.normal(k1, (b, d, m, c, lanes), jnp.float32) * 0.3
  w = jax.random.normal(k2, (3, 3, 3, c, cout), jnp.float32) * 0.1
  scale = jax.random.normal(k3, (cout,), jnp.float32) * 0.2 + 1.0
  bias = jax.random.normal(k4, (cout,), jnp.float32) * 0.1
  residual = (jax.random.normal(k5, (b, d, m, cout, lanes),
                                jnp.float32) * 0.3 if res else None)

  ref = conv3d_band_pallas(x, w, scale, bias, residual, relu=relu)
  with mesh24:
    y = shard_ops.conv3d_band_sharded(x, w, scale, bias, residual, relu,
                                      mesh24)
  np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                             rtol=1e-5, atol=1e-5)


def test_sharded_sphere_conv_fwd_and_grads(interpret_pallas, mesh24):
  """shard_map'd sphere conv: forward parity + psum'd weight gradient."""
  from mode_tpu.ops.pallas.sphere_conv_kernel import (
      sphere_conv_cassini_pallas)

  n, h, w_, cin, cout = 2, 64, 32, 8, 8
  key = jax.random.PRNGKey(1)
  k1, k2, k3 = jax.random.split(key, 3)
  x = jax.random.normal(k1, (n, h, w_, cin), jnp.float32) * 0.5
  wgt = jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.2
  cot = jax.random.normal(k3, (n, h, w_, cout), jnp.float32)
  static = ("Cassini", 1, 1, 1, None)

  ref = sphere_conv_cassini_pallas(x, wgt)
  with mesh24:
    y = shard_ops.sphere_conv_fast_sharded(x, wgt, static, mesh24)
  np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                             rtol=1e-5, atol=1e-5)

  # gradients: single-device Pallas backward is the oracle (its own parity
  # vs the XLA VJP is pinned in test_pallas_sphere_conv)
  from mode_tpu.ops.pallas.sphere_conv_kernel import (
      sphere_conv_cassini_pallas_bwd)
  dx_ref, dw_ref = sphere_conv_cassini_pallas_bwd(x, wgt, cot)

  def loss(xx, ww):
    return jnp.sum(shard_ops.sphere_conv_fast_sharded(xx, ww, static,
                                                      mesh24) * cot)

  with mesh24:
    dx, dw = jax.grad(loss, argnums=(0, 1))(x, wgt)
  np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                             rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                             rtol=1e-5, atol=1e-5)


def test_sharded_fused_regression(interpret_pallas, mesh24):
  from mode_tpu.ops.pallas.regression_kernel import (
      fused_disparity_regression)

  n, d_in, hq, wq = 2, 8, 16, 128
  maxdisp, h, w_ = 16, 64, 512
  cost = jax.random.normal(jax.random.PRNGKey(2), (n, d_in, hq, wq),
                           jnp.float32)
  pred_ref, conf_ref = fused_disparity_regression(cost, maxdisp, h, w_)
  with mesh24:
    pred, conf = shard_ops.fused_regression_sharded(cost, maxdisp, h, w_,
                                                    mesh24)
  np.testing.assert_allclose(np.asarray(pred), np.asarray(pred_ref),
                             rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(np.asarray(conf), np.asarray(conf_ref),
                             rtol=1e-5, atol=1e-5)


def test_lane_mid_section_under_mesh(interpret_pallas, mesh24):
  """Full ModeDisparity eval with Pallas FORCED ON under a (2,4) mesh ==
  single-device lane-major output (the driver-level multi-chip property the
  round-2 dryrun never exercised)."""
  from mode_tpu.models import disparity as disp_mod
  from mode_tpu.models.disparity import ModeDisparity
  from mode_tpu.ops.pallas import conv3d_kernel as ck

  h, w_, maxdisp, b = 256, 512, 16, 2
  model = ModeDisparity(maxdisp=maxdisp, conv="Regular", out_conf=True)
  key = jax.random.PRNGKey(3)
  left = jax.random.normal(key, (b, h, w_, 3), jnp.float32) * 0.5
  right = jnp.roll(left, 2, axis=2)
  variables = model.init(jax.random.PRNGKey(4), left[:1], right[:1],
                         train=False)

  ck.set_conv3d_pallas("on")
  # fold kernels have no shard_map wrapper (their gates reject an active
  # mesh), so force them off on BOTH sides — this test pins the sharded
  # band/regression kernels against the same single-device dispatch, and
  # the fold kernels carry their own parity tests (test_conv3d_lane.py)
  ck.set_fold_pallas("off")
  disp_mod.set_fused_regression("on")
  try:
    ref_pred, ref_conf = model.apply(variables, left, right, train=False)
    with mesh24, pmesh.activate(mesh24):
      pred, conf = model.apply(variables, left, right, train=False)
  finally:
    ck.set_conv3d_pallas("auto")
    ck.set_fold_pallas("auto")
    disp_mod.set_fused_regression("auto")

  np.testing.assert_allclose(np.asarray(pred), np.asarray(ref_pred),
                             rtol=2e-4, atol=2e-4)
  np.testing.assert_allclose(np.asarray(conf), np.asarray(ref_conf),
                             rtol=2e-4, atol=2e-4)


def test_band_gate_rejects_indivisible_mesh(mesh24):
  from mode_tpu.ops.pallas import conv3d_kernel as ck
  ck.set_conv3d_pallas("on")
  try:
    with pmesh.activate(mesh24):
      assert not ck.band_pallas_ok((1, 4, 16, 32, 128), 32)   # B % data
      assert not ck.band_pallas_ok((2, 4, 18, 32, 128), 32)   # M % spatial
      assert ck.band_pallas_ok((2, 4, 16, 32, 128), 32)
  finally:
    ck.set_conv3d_pallas("auto")


@pytest.mark.parametrize("res,relu", [(False, True), (True, False)])
def test_sharded_conv2d_band_matches_single(interpret_pallas, mesh24, res,
                                            relu):
  from mode_tpu.ops.pallas.conv2d_kernel import conv2d_band_pallas

  b, m, c, lanes, cout = 2, 32, 8, 128, 16
  key = jax.random.PRNGKey(7)
  k1, k2, k3, k4, k5 = jax.random.split(key, 5)
  x = jax.random.normal(k1, (b, m, c, lanes), jnp.float32) * 0.3
  w = jax.random.normal(k2, (3, 3, c, cout), jnp.float32) * 0.1
  scale = jax.random.normal(k3, (cout,), jnp.float32) * 0.2 + 1.0
  bias = jax.random.normal(k4, (cout,), jnp.float32) * 0.1
  residual = (jax.random.normal(k5, (b, m, cout, lanes),
                                jnp.float32) * 0.3 if res else None)

  ref = conv2d_band_pallas(x, w, scale, bias, residual, relu=relu)
  with mesh24:
    y = shard_ops.conv2d_band_sharded(x, w, scale, bias, residual, relu,
                                      mesh24)
  np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                             rtol=1e-5, atol=1e-5)


def test_conv2d_lane_module_mesh_dispatch(interpret_pallas, mesh24):
  """Conv2dLane under an ACTIVE mesh routes to the shard_map wrapper and
  matches the single-device module output (the FE stem / fusion lane
  paths rely on this, models/blocks.py)."""
  from mode_tpu.models.blocks import Conv2dLane
  from mode_tpu.ops.pallas.conv3d_kernel import set_conv3d_pallas

  b, m, c, lanes, cout = 2, 32, 8, 128, 16
  key = jax.random.PRNGKey(9)
  x = jax.random.normal(key, (b, m, c, lanes), jnp.float32) * 0.3
  mod = Conv2dLane(cout)
  variables = mod.init(jax.random.PRNGKey(1), x)
  set_conv3d_pallas("on")            # force the Pallas policy on CPU
  try:
    ref = mod.apply(variables, x, relu=True)
    from mode_tpu.parallel import mesh as pmesh
    with mesh24, pmesh.activate(mesh24):
      y = mod.apply(variables, x, relu=True)
  finally:
    set_conv3d_pallas("auto")
  np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                             rtol=1e-5, atol=1e-5)
