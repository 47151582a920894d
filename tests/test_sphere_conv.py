"""Sphere-conv parity tests.

Two independent oracles pin the op:
  1. a slow, loop-based numpy port of the reference position generator
     (``/root/reference/models/basic/spherical_conv/sphere_conv.py:180-237``)
     checks the vectorized position grid bit-for-bit;
  2. a loop-based numpy im2col with the CUDA kernel's exact bilinear/bounds
     semantics (``sphere_conv_cuda_kernel.cu:196-262``) checks the gather
     tables + GEMM forward;
and torch autograd on an equivalent gather formulation checks the VJPs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mode_tpu.ops.sphere_conv import (
    build_gather_tables,
    gen_sphere_positions,
    positions_reference_layout,
    sphere_conv,
)


def _reference_positions_loopy(in_height, in_width, kh, kw, sphere_type):
  """Unvectorized transcription of the reference algorithm (test oracle)."""
  height, width = min(in_height, in_width), max(in_height, in_width)
  delta_lat = np.pi / height
  delta_lon = 2 * np.pi / width
  range_x = np.arange(-(kw // 2), kw // 2 + 1)
  if not kw % 2:
    range_x = np.delete(range_x, kw // 2)
  range_y = np.arange(-(kh // 2), kh // 2 + 1)
  if not kh % 2:
    range_y = np.delete(range_y, kh // 2)
  kerX = np.tan(range_x * delta_lon)
  kerY = np.tan(range_y * delta_lat) / np.cos(range_y * delta_lon)
  kerX, kerY = np.meshgrid(kerX, kerY)
  rho = np.sqrt(kerX**2 + kerY**2)
  if kh % 2 and kw % 2:
    rho[kh // 2][kw // 2] = 1e-8
  nu = np.arctan(rho)
  cos_nu, sin_nu = np.cos(nu), np.sin(nu)
  h_range = np.arange(0, height)
  w_range = np.arange(0, width)
  lat_range = ((h_range / height) - 0.5) * np.pi
  lon_range = ((w_range / width) - 0.5) * (2 * np.pi)
  lat = np.array([np.arcsin(cos_nu * np.sin(_lat) +
                            kerY * sin_nu * np.cos(_lat) / rho)
                  for _lat in lat_range])
  lat = np.array([lat for _ in lon_range]).transpose((1, 0, 2, 3))
  lon = np.array([np.arctan2(kerX * sin_nu,
                             (rho * np.cos(_lat) * cos_nu -
                              kerY * np.sin(_lat) * sin_nu))
                  for _lat in lat_range])
  lon = np.array([lon + _lon for _lon in lon_range]).transpose((1, 0, 2, 3))
  lat = (lat / np.pi + 0.5) * height
  lon = ((lon / (2 * np.pi) + 0.5) * width) % width
  if sphere_type == "ERP":
    LatLon = np.stack((lat, lon)).astype(np.float32)
    LatLon = LatLon.transpose((3, 4, 0, 1, 2))
    Kh, Kw, d, H, W = LatLon.shape
    LatLon = LatLon.reshape((1, d * Kh * Kw, H, W))
  else:
    LatLon = np.stack((lon, lat)).astype(np.float32)
    LatLon = LatLon.transpose((3, 4, 0, 2, 1))
    Kh, Kw, d, H, W = LatLon.shape
    LatLon = LatLon.reshape((1, d * Kh * Kw, H, W))
  return LatLon


@pytest.mark.parametrize("sphere_type,h,w", [("ERP", 8, 16),
                                             ("Cassini", 16, 8),
                                             ("ERP", 10, 20),
                                             ("Cassini", 32, 16)])
@pytest.mark.parametrize("k", [3, 5])
def test_positions_match_reference_layout(sphere_type, h, w, k):
  ours = positions_reference_layout(
      gen_sphere_positions(h, w, k, k, sphere_type))
  ref = _reference_positions_loopy(h, w, k, k, sphere_type)
  np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def _cuda_bilinear(x_hw, ph, pw):
  """The CUDA kernel's sampling rule (sphere_conv_cuda_kernel.cu:196-262):
  whole-sample bounds gate ``-1 < p < size``, then per-corner checks."""
  h, w = x_hw.shape
  if not (-1 < ph < h and -1 < pw < w):
    return 0.0
  h_low, w_low = int(np.floor(ph)), int(np.floor(pw))
  lh, lw = ph - h_low, pw - w_low
  hh, hw_ = 1 - lh, 1 - lw
  val = 0.0
  for (hi, wi, wt) in ((h_low, w_low, hh * hw_), (h_low, w_low + 1, hh * lw),
                       (h_low + 1, w_low, lh * hw_),
                       (h_low + 1, w_low + 1, lh * lw)):
    if 0 <= hi < h and 0 <= wi < w:
      val += wt * x_hw[hi, wi]
  return val


@pytest.mark.parametrize("sphere_type,h,w", [("ERP", 8, 16), ("Cassini", 16, 8)])
@pytest.mark.parametrize("stride", [1, 2])
def test_sphere_conv_forward_vs_cuda_semantics_oracle(rng, sphere_type, h, w,
                                                      stride):
  kh = kw = 3
  pad = 1
  cin, cout, n = 2, 3, 2
  x = rng.normal(size=(n, h, w, cin)).astype(np.float32)
  wgt = rng.normal(size=(kh, kw, cin, cout)).astype(np.float32) * 0.3

  out = np.asarray(sphere_conv(jnp.asarray(x), jnp.asarray(wgt), None,
                               sphere_type=sphere_type, stride=stride,
                               pad=pad))

  pos = gen_sphere_positions(h, w, kh, kw, sphere_type)  # (K, H, W, 2)
  h_out = (h + 2 * pad - kh) // stride + 1
  w_out = (w + 2 * pad - kw) // stride + 1
  expected = np.zeros((n, h_out, w_out, cout), np.float32)
  for b in range(n):
    for i in range(h_out):
      for j in range(w_out):
        for o in range(cout):
          acc = 0.0
          for ki in range(kh):
            for kj in range(kw):
              k = ki * kw + kj
              ph, pw = pos[k, i * stride, j * stride]
              for ci in range(cin):
                acc += wgt[ki, kj, ci, o] * _cuda_bilinear(
                    x[b, :, :, ci], float(ph), float(pw))
          expected[b, i, j, o] = acc
  np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_sphere_conv_grads_match_torch_gather_formulation(rng):
  """VJPs of the XLA op vs torch autograd over the same gather tables."""
  sphere_type, h, w = "Cassini", 16, 8
  kh = kw = 3
  cin, cout, n = 3, 4, 2
  x = rng.normal(size=(n, h, w, cin)).astype(np.float32)
  wgt = rng.normal(size=(kh, kw, cin, cout)).astype(np.float32) * 0.3
  g = rng.normal(size=(n, h, w, cout)).astype(np.float32)

  def loss(xx, ww):
    return jnp.sum(sphere_conv(xx, ww, None, sphere_type=sphere_type) *
                   jnp.asarray(g))

  gx, gw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(wgt))

  idx, tab = build_gather_tables(h, w, kh, kw, sphere_type, 1, 1, 1)
  tx = torch.from_numpy(x).requires_grad_(True)
  tw = torch.from_numpy(wgt).requires_grad_(True)
  xf = tx.reshape(n, h * w, cin)
  col = torch.zeros(n, kh * kw, h, w, cin)
  for corner in range(4):
    gidx = torch.from_numpy(idx[corner].reshape(-1).astype(np.int64))
    gathered = xf[:, gidx, :].reshape(n, kh * kw, h, w, cin)
    col = col + torch.from_numpy(tab[corner])[None, ..., None] * gathered
  out = torch.einsum("nkhwc,kco->nhwo", col,
                     tw.reshape(kh * kw, cin, cout))
  out.backward(torch.from_numpy(g))

  np.testing.assert_allclose(np.asarray(gx), tx.grad.numpy(), rtol=1e-4,
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), rtol=1e-4,
                             atol=1e-4)
