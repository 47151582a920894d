"""Geometry parity tests vs torch/numpy oracles transcribed from the
reference (``/root/reference/utils/geometry.py`` and the disparity→depth
bridge in ``save_output_disparity_stage.py``)."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mode_tpu.geometry import (
    cassini_disp_to_depth,
    cassini_to_erp,
    depth_to_cassini_disp,
    depth_view_transform_with_conf,
    erp_to_rect_cassini,
    rodrigues,
    rotate_cassini,
)
from mode_tpu.geometry.reprojection import disp_to_depth_at_cam1


# ---------------------------------------------------------------- oracles
def _torch_resample(src_hwc, grid_x, grid_y):
  """grid_sample bilinear/border/align_corners=True on CPU (oracle core)."""
  src = torch.from_numpy(src_hwc).unsqueeze(0).permute(0, 3, 1, 2).float()
  gx = torch.from_numpy(np.clip(grid_x, -1, 1)).float().unsqueeze(-1)
  gy = torch.from_numpy(np.clip(grid_y, -1, 1)).float().unsqueeze(-1)
  grid = torch.cat([gx, gy], dim=-1).unsqueeze(0)
  out = F.grid_sample(src, grid, mode="bilinear", align_corners=True,
                      padding_mode="border")
  return out[0].permute(1, 2, 0).numpy()


def _oracle_cassini2erp(cassini_hwc):
  hc, wc = cassini_hwc.shape[:2]
  erp_h, erp_w = wc, hc
  theta = np.arange(np.pi - np.pi / erp_w, -np.pi, -2 * np.pi / erp_w)
  theta_map = np.array([theta for _ in range(erp_h)]).astype(np.float32)
  phi = np.arange(0.5 * np.pi - 0.5 * np.pi / erp_h, -0.5 * np.pi,
                  -np.pi / erp_h)
  phi_map = np.array([phi for _ in range(erp_w)]).astype(np.float32).T
  theta_c = np.arctan2(np.tan(phi_map), np.cos(theta_map))
  phi_c = np.arcsin(np.cos(phi_map) * np.sin(theta_map))
  return _torch_resample(cassini_hwc, -phi_c / (0.5 * np.pi),
                         -theta_c / np.pi)


def _rot(pitch, yaw, roll):
  Rx = np.array([[1, 0, 0], [0, np.cos(roll), -np.sin(roll)],
                 [0, np.sin(roll), np.cos(roll)]])
  Rz = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                 [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
  Ry = np.array([[np.cos(pitch), 0, -np.sin(pitch)], [0, 1, 0],
                 [np.sin(pitch), 0, np.cos(pitch)]])
  return Rx @ Rz @ Ry


def _oracle_rotate_cassini(img_hwc, pitch, yaw, roll):
  R_I = np.linalg.inv(_rot(pitch, yaw, roll))
  h, w = img_hwc.shape[:2]
  theta = np.arange(np.pi - np.pi / h, -np.pi, -2 * np.pi / h)
  theta_map = np.array([theta for _ in range(w)]).astype(np.float32).T
  phi = np.arange(0.5 * np.pi - 0.5 * np.pi / w, -0.5 * np.pi, -np.pi / w)
  phi_map = np.array([phi for _ in range(h)]).astype(np.float32)
  x2 = np.sin(phi_map)
  y2 = np.cos(phi_map) * np.sin(theta_map)
  z2 = np.cos(phi_map) * np.cos(theta_map)
  X1 = np.matmul(R_I, np.expand_dims(np.dstack((x2, y2, z2)), -1))
  theta1 = np.arctan2(X1[:, :, 1, 0], X1[:, :, 2, 0])
  phi1 = np.arcsin(np.clip(X1[:, :, 0, 0], -1, 1))
  return _torch_resample(img_hwc, -phi1 / (0.5 * np.pi), -theta1 / np.pi)


def _oracle_erp2rect(erp_hwc, R, ca_h, ca_w):
  theta = np.arange(np.pi - np.pi / ca_h, -np.pi, -2 * np.pi / ca_h)
  theta_map = np.array([theta for _ in range(ca_w)]).astype(np.float32).T
  phi = np.arange(0.5 * np.pi - 0.5 * np.pi / ca_w, -0.5 * np.pi,
                  -np.pi / ca_w)
  phi_map = np.array([phi for _ in range(ca_h)]).astype(np.float32)
  x = np.sin(phi_map)
  y = np.cos(phi_map) * np.sin(theta_map)
  z = np.cos(phi_map) * np.cos(theta_map)
  X2 = np.matmul(np.linalg.inv(R), np.expand_dims(np.dstack((x, y, z)), -1))
  phi_erp = np.arcsin(np.clip(X2[:, :, 1, 0], -1, 1))
  theta_erp = np.arctan2(X2[:, :, 0, 0], X2[:, :, 2, 0])
  return _torch_resample(erp_hwc, -theta_erp / np.pi,
                         -phi_erp / (0.5 * np.pi))


def _oracle_view_trans(view_1, conf_1, y0, z0, x0, pitch, yaw, roll,
                       dtype=np.float64):
  """Direct transcription of depthViewTransWithConf + the numba loop.

  ``dtype=float64`` reproduces the reference bit-for-bit (numpy upcasts the
  rotation matmul); float32 mirrors the TPU path's arithmetic so the two can
  be compared without rint-boundary cell flips caused purely by precision.
  """
  R = _rot(pitch, yaw, roll).astype(dtype)
  t = np.array([[x0], [y0], [z0]]).astype(dtype)
  h, w = view_1.shape
  theta = np.arange(np.pi - np.pi / h, -np.pi, -2 * np.pi / h)
  theta_map = np.array([theta for _ in range(w)]).astype(np.float32).T
  phi = np.arange(0.5 * np.pi - 0.5 * np.pi / w, -0.5 * np.pi, -np.pi / w)
  phi_map = np.array([phi for _ in range(h)]).astype(np.float32)
  r1 = view_1
  X1 = np.expand_dims(np.dstack((r1 * np.sin(phi_map),
                                 r1 * np.cos(phi_map) * np.sin(theta_map),
                                 r1 * np.cos(phi_map) * np.cos(theta_map))),
                      -1).astype(dtype)
  X2 = np.matmul(R, X1 - t)
  r2 = np.sqrt(X2[:, :, 0, 0]**2 + X2[:, :, 1, 0]**2 + X2[:, :, 2, 0]**2)
  theta2 = np.arctan2(X2[:, :, 1, 0], X2[:, :, 2, 0])
  phi2 = np.arcsin(np.clip(X2[:, :, 0, 0] / np.where(r2 > 0, r2, 1), -1, 1))
  view_2 = np.ones((h, w), np.float32) * 100000
  conf_2 = np.zeros((h, w), np.float32)
  I2 = np.clip(np.rint(h / 2 - h * theta2 / (2 * np.pi)), 0, h - 1).astype(int)
  J2 = np.clip(np.rint(w / 2 - w * phi2 / np.pi), 0, w - 1).astype(int)
  for i in range(h):
    for j in range(w):
      if r1[i, j] > 0:
        if r2[i, j] < view_2[I2[i, j], J2[i, j]]:
          view_2[I2[i, j], J2[i, j]] = r2[i, j]
          conf_2[I2[i, j], J2[i, j]] = conf_1[i, j]
  view_2[view_2 == 100000] = 0
  view_2[view_2 > 1000] = 1000
  return view_2, conf_2


def _oracle_disp2depth(disp, w_baseline):
  h, w = disp.shape
  phi = np.arange(0.5 * math.pi - 0.5 * math.pi / w, -0.5 * math.pi,
                  -math.pi / w)
  phi_l = np.array([phi for _ in range(h)]).astype(np.float32)
  disp_m = np.ma.array(disp, mask=disp == 0)
  phi_r = disp_m * math.pi / w + phi_l
  depth = w_baseline * np.sin(math.pi / 2 - phi_r) / np.sin(phi_r - phi_l)
  depth = depth.filled(1000)
  depth[depth > 1000] = 1000
  depth[depth < 0] = 0
  return depth


# ------------------------------------------------------------------ tests
def test_cassini_to_erp(rng):
  img = rng.normal(size=(16, 8, 3)).astype(np.float32)
  ours = np.asarray(cassini_to_erp(img[None]))[0]
  ref = _oracle_cassini2erp(img)
  assert ours.shape == (8, 16, 3)
  np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("angles", [(0.5 * math.pi, 0, 0),
                                    (0.25 * math.pi, 0, 0),
                                    (0.3, -0.7, 1.1)])
def test_rotate_cassini(rng, angles):
  img = rng.normal(size=(20, 10, 2)).astype(np.float32)
  ours = np.asarray(rotate_cassini(img[None], *angles))[0]
  ref = _oracle_rotate_cassini(img, *angles)
  np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_erp_to_rect_cassini(rng):
  erp = rng.normal(size=(12, 24, 3)).astype(np.float32)
  R = rodrigues(np.array([0, 0, -np.pi / 2]))
  ours = np.asarray(erp_to_rect_cassini(erp[None], R, 16, 8))[0]
  ref = _oracle_erp2rect(erp, R, 16, 8)
  np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_rodrigues_matches_cv2():
  cv2 = pytest.importorskip("cv2")
  for vec in ([0, 0, -np.pi / 2], [0, 0, -np.pi / 4], [0.3, -0.2, 0.9]):
    ref = cv2.Rodrigues(np.array(vec, np.float32))[0]
    np.testing.assert_allclose(rodrigues(np.array(vec)), ref, atol=1e-6)


def test_disp_to_depth(rng):
  disp = (rng.uniform(0, 40, size=(20, 10)) *
          rng.integers(0, 2, size=(20, 10))).astype(np.float32)
  ours = np.asarray(cassini_disp_to_depth(disp, math.sqrt(2.0)))
  ref = _oracle_disp2depth(disp.copy(), math.sqrt(2.0))
  np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_depth_view_transform_with_conf(rng):
  h, w = 24, 12
  depth = rng.uniform(0, 30, size=(h, w)).astype(np.float32)
  depth[rng.random(size=(h, w)) < 0.2] = 0.0
  conf = rng.uniform(0, 1, size=(h, w)).astype(np.float32)
  args = (0.0, -1.0, 0.0, 0.5 * math.pi, 0.0, 0.0)
  ours_v, ours_c = depth_view_transform_with_conf(depth, conf, *args)

  # exact parity against a float32 serial oracle (same arithmetic precision)
  ref_v, ref_c = _oracle_view_trans(depth, conf, *args, dtype=np.float32)
  np.testing.assert_allclose(np.asarray(ours_v), ref_v, rtol=1e-4, atol=1e-4)
  np.testing.assert_allclose(np.asarray(ours_c), ref_c, rtol=1e-4, atol=1e-4)

  # against the reference's float64 arithmetic, allow rare rint-boundary
  # cell flips (pure precision artifacts) but require global agreement
  ref64_v, _ = _oracle_view_trans(depth, conf, *args, dtype=np.float64)
  close = np.isclose(np.asarray(ours_v), ref64_v, rtol=1e-3, atol=1e-3)
  assert close.mean() > 0.95


def test_zbuffer_sort_impl_bit_exact(rng):
  """The scatter-free sort z-buffer is bit-identical to the scatter one,
  including tie-breaks, invalid pixels, and beyond-sentinel radii."""
  from mode_tpu.geometry import reprojection as rp
  h, w = 48, 64
  depth = np.abs(rng.normal(2.0, 3.0, size=(h, w))).astype(np.float32)
  depth[rng.random(size=(h, w)) < 0.15] = 0.0          # invalid
  depth[rng.random(size=(h, w)) < 0.05] = 150000.0     # beyond sentinel
  conf = rng.uniform(0, 1, size=(h, w)).astype(np.float32)
  args = (0.0, -1.0, 0.0, 0.5 * math.pi, 0.0, 0.0)
  try:
    rp.set_zbuffer_impl("scatter")
    v0, c0 = (np.asarray(t)
              for t in depth_view_transform_with_conf(depth, conf, *args))
    rp.set_zbuffer_impl("sort")
    v1, c1 = (np.asarray(t)
              for t in depth_view_transform_with_conf(depth, conf, *args))
    rp.set_zbuffer_impl("sort2x")
    v2, c2 = (np.asarray(t)
              for t in depth_view_transform_with_conf(depth, conf, *args))
  finally:
    rp.set_zbuffer_impl("sort")
  assert np.array_equal(v0, v1)
  assert np.array_equal(c0, c1)
  assert np.array_equal(v0, v2)
  assert np.array_equal(c0, c2)


def test_batched_view_transforms_bit_exact(rng):
  """One-sort batched re-projection == K per-pair calls, bit for bit.
  (The pipeline ships the per-pair form — the fused sort measured slower
  on-chip; see docs/PROFILES.md round-4 note.)"""
  from mode_tpu.geometry.reprojection import (DEEP360_PAIR_TRANSFORMS,
                                              depth_view_transforms_batched)
  h, w = 40, 20
  params = tuple(DEEP360_PAIR_TRANSFORMS[p][1] for p in ("23", "24", "34"))
  depths = np.abs(rng.normal(3.0, 4.0, size=(3, h, w))).astype(np.float32)
  depths[rng.random(size=(3, h, w)) < 0.15] = 0.0
  depths[rng.random(size=(3, h, w)) < 0.05] = 150000.0
  confs = rng.uniform(0, 1, size=(3, h, w)).astype(np.float32)
  bd, bc = depth_view_transforms_batched(depths, confs, params)
  for k in range(3):
    v, c = depth_view_transform_with_conf(depths[k], confs[k], *params[k])
    assert np.array_equal(np.asarray(bd[k]), np.asarray(v)), f"pair {k}"
    assert np.array_equal(np.asarray(bc[k]), np.asarray(c)), f"pair {k}"


@pytest.mark.parametrize("pair", ["12", "13", "14", "23", "24", "34"])
def test_bridge_all_pairs_run(rng, pair):
  disp = rng.uniform(0, 30, size=(32, 16)).astype(np.float32)
  conf = rng.uniform(0, 1, size=(32, 16)).astype(np.float32)
  d, c = disp_to_depth_at_cam1(disp, conf, pair)
  assert d.shape == (32, 16) and c.shape == (32, 16)
  assert np.isfinite(np.asarray(d)).all()


def test_depth_to_disp_roundtrip(rng):
  # 3D60 closed form: depth -> disp must invert disp -> depth (baseline b)
  b = 0.26
  h, w = 32, 16
  disp = rng.uniform(1.0, 8.0, size=(h, w)).astype(np.float32)
  depth = np.asarray(cassini_disp_to_depth(disp, b))
  ok = (depth > 0) & (depth < 999)
  disp_rt = np.asarray(depth_to_cassini_disp(depth, b, 1000.0))
  np.testing.assert_allclose(disp_rt[ok], disp[ok], rtol=1e-2, atol=5e-2)
