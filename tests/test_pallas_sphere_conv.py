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


@pytest.mark.parametrize("h,w,cin,cout,bj", [(16, 32, 8, 16, 8),
                                             (32, 64, 16, 8, 4)])
def test_pallas_erp_matches_xla(rng, h, w, cin, cout, bj):
  """ERP layout (W = 2H): the transposed-band kernel."""
  x = rng.normal(size=(2, h, w, cin)).astype(np.float32)
  wgt = (rng.normal(size=(3, 3, cin, cout)) * 0.2).astype(np.float32)
  ref = np.asarray(sphere_conv_xla(jnp.asarray(x), jnp.asarray(wgt),
                                   sphere_type="ERP"))
  with _interpret_pallas():
    out = np.asarray(sck.sphere_conv_erp_pallas(
        jnp.asarray(x), jnp.asarray(wgt), block_j=bj))
  np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("h,w,cin,cout,bj", [(32, 16, 8, 16, 8),
                                             (64, 32, 16, 8, 4)])
def test_pallas_backward_matches_xla_vjp(rng, h, w, cin, cout, bj):
  """(dx, dw) from the Pallas col2im-transpose vs jax.grad of the XLA path."""
  x = rng.normal(size=(2, h, w, cin)).astype(np.float32)
  wgt = (rng.normal(size=(3, 3, cin, cout)) * 0.2).astype(np.float32)
  g = rng.normal(size=(2, h, w, cout)).astype(np.float32)

  _, vjp = jax.vjp(lambda xx, ww: sphere_conv_xla(xx, ww),
                   jnp.asarray(x), jnp.asarray(wgt))
  dx_ref, dw_ref = (np.asarray(t) for t in vjp(jnp.asarray(g)))

  with _interpret_pallas():
    dx, dw = sck.sphere_conv_cassini_pallas_bwd(
        jnp.asarray(x), jnp.asarray(wgt), jnp.asarray(g), block_j=bj)
  np.testing.assert_allclose(np.asarray(dw), dw_ref, rtol=2e-4, atol=2e-4)
  np.testing.assert_allclose(np.asarray(dx), dx_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("h,w,cin,cout,bj", [(16, 32, 8, 16, 8),
                                             (32, 64, 16, 8, 4)])
def test_pallas_erp_backward_matches_xla_vjp(rng, h, w, cin, cout, bj):
  """ERP (dx, dw) from the shared transposed kernels vs the XLA VJP."""
  x = rng.normal(size=(2, h, w, cin)).astype(np.float32)
  wgt = (rng.normal(size=(3, 3, cin, cout)) * 0.2).astype(np.float32)
  g = rng.normal(size=(2, h, w, cout)).astype(np.float32)

  _, vjp = jax.vjp(lambda xx, ww: sphere_conv_xla(xx, ww, sphere_type="ERP"),
                   jnp.asarray(x), jnp.asarray(wgt))
  dx_ref, dw_ref = (np.asarray(t) for t in vjp(jnp.asarray(g)))

  with _interpret_pallas():
    dx, dw = sck.sphere_conv_erp_pallas_bwd(
        jnp.asarray(x), jnp.asarray(wgt), jnp.asarray(g), block_j=bj)
  np.testing.assert_allclose(np.asarray(dw), dw_ref, rtol=2e-4, atol=2e-4)
  np.testing.assert_allclose(np.asarray(dx), dx_ref, rtol=2e-4, atol=2e-4)


def test_fast_path_custom_vjp_uses_pallas(rng):
  """The dispatched sphere_conv's grads equal the XLA path's end to end."""
  import importlib
  sc = importlib.import_module("mode_tpu.ops.sphere_conv")
  h, w, cin, cout = 32, 16, 8, 16
  x = jnp.asarray(rng.normal(size=(1, h, w, cin)).astype(np.float32))
  wgt = jnp.asarray((rng.normal(size=(3, 3, cin, cout)) * 0.2)
                    .astype(np.float32))

  def loss_fast(xx, ww):
    return jnp.sum(jnp.sin(sc._sphere_conv_fast(
        xx, ww, ("Cassini", 1, 1, 1, None))))

  def loss_ref(xx, ww):
    return jnp.sum(jnp.sin(sc.sphere_conv_xla(xx, ww)))

  gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, wgt)
  with _interpret_pallas():
    gx, gw = jax.grad(loss_fast, argnums=(0, 1))(x, wgt)
  np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                             rtol=2e-4, atol=2e-4)
  np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                             rtol=2e-4, atol=2e-4)


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
