"""3D60 dataset tests on a synthetic trinocular tree."""

import numpy as np
import pytest

from mode_tpu.data.three_d60 import (Dataset3D60Disparity, Dataset3D60Fusion,
                                     depth_to_disp_np, erp_to_rect_cassini_np)
from mode_tpu.geometry.projection import erp_to_rect_cassini, rodrigues
from tests.synth_data import make_3d60_tree

CA_H, CA_W = 32, 16


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
  root = tmp_path_factory.mktemp("d60")
  list_file = make_3d60_tree(root, n_frames=2, with_fusion_inputs=True,
                             ca_shape=(CA_H, CA_W))
  return str(root), list_file


def test_numpy_rectification_matches_jax(rng):
  erp = rng.normal(size=(24, 48, 3)).astype(np.float32)
  r = rodrigues(np.array([0, 0, -np.pi / 2]))
  ours = erp_to_rect_cassini_np(erp, r, 32, 16)
  ref = np.asarray(erp_to_rect_cassini(erp[None], r, 32, 16))[0]
  np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pair", ["lr", "ud", "ur", "all"])
def test_disparity_items(tree, pair):
  root, list_file = tree
  ds = Dataset3D60Disparity(list_file, root, shape=(CA_H, CA_W), pair=pair)
  assert len(ds) == 2
  item = ds[0]
  assert item["leftImg"].shape == (CA_H, CA_W, 3)
  assert item["dispMap"].shape == (CA_H, CA_W)
  assert item["leftImg_flip"].shape == (CA_H, CA_W, 3)
  d = item["dispMap"]
  valid = ~np.isnan(d)
  assert valid.any() and (d[valid] >= 0).all()


def test_disparity_crop(tree):
  root, list_file = tree
  ds = Dataset3D60Disparity(list_file, root, shape=(CA_H, CA_W), crop=True)
  item = ds[0]
  assert item["leftImg"].shape == (CA_H // 2, CA_W // 2, 3)


def test_depth_disp_roundtrip_invalids():
  depth = np.array([[0.0, 25.0, 5.0]], np.float32).repeat(4, 0)
  disp = depth_to_disp_np(np.tile(depth, (1, 2)), 0.26, 20.0)
  assert np.isnan(disp[0, 0]) and np.isnan(disp[0, 1])  # 0 and >max invalid
  assert np.isfinite(disp[0, 2])


@pytest.mark.parametrize("n_views", [2, 3])
def test_fusion_items(tree, n_views):
  import os
  root, list_file = tree
  ds = Dataset3D60Fusion(list_file, root, os.path.join(root, "pred"),
                         shape=(CA_H, CA_W), n_views=n_views)
  item = ds[0]
  assert item["depths"].shape == (6 if n_views == 3 else 2, CA_H, CA_W, 1)
  assert item["rgbs"].shape == (n_views, CA_H, CA_W, 3)
  assert item["gt"].shape == (CA_H, CA_W)
