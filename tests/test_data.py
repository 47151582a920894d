"""Data-pipeline tests over a synthetic Deep360 tree."""

import numpy as np
import pytest

from mode_tpu.data.deep360 import Deep360DatasetDisparity, Deep360DatasetFusion
from mode_tpu.data.file_lists import (
    list_deep360_disparity_test,
    list_deep360_disparity_train,
    list_deep360_fusion_test,
    list_deep360_fusion_train,
)
from mode_tpu.data.loader import DataLoader
from mode_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
from tests.synth_data import make_deep360_tree, make_fusion_inputs


@pytest.fixture(scope="module")
def deep360_root(tmp_path_factory):
  root = tmp_path_factory.mktemp("deep360")
  return str(make_deep360_tree(root, frames_per_subset=2, h=64, w=32))


@pytest.fixture(scope="module")
def fusion_root(tmp_path_factory, deep360_root):
  root = tmp_path_factory.mktemp("pred")
  return str(make_fusion_inputs(root, deep360_root))


def test_disparity_lists(deep360_root):
  tl, tr, td, vl, vr, vd = list_deep360_disparity_train(deep360_root)
  assert len(tl) == len(tr) == len(td) == 12      # 2 frames x 6 pairs
  assert len(vl) == 12
  sl, sr, sd = list_deep360_disparity_test(deep360_root)
  assert len(sl) == 12
  # left/right pairing: same frame+pair prefix
  for l, r, d in zip(tl, tr, td):
    assert l.split("_rgb")[0].split("/")[-1] == \
        r.split("_rgb")[0].split("/")[-1]
    assert d.endswith("_disp.npz")
    assert d[-11:-9] in ("12", "13", "14", "23", "24", "34")


def test_disparity_dataset_and_loader(deep360_root):
  tl, tr, td, *_ = list_deep360_disparity_train(deep360_root)
  ds = Deep360DatasetDisparity(tl, tr, td, shape=(64, 32))
  item = ds[0]
  assert item["leftImg"].shape == (64, 32, 3)
  assert item["dispMap"].shape == (64, 32)
  # normalization: uint8 255 would map to (1-mean)/std
  assert item["leftImg"].max() <= ((1 - IMAGENET_MEAN) / IMAGENET_STD).max() + 1e-5

  loader = DataLoader(ds, batch_size=5, shuffle=True, num_workers=2)
  batches = list(loader)
  assert len(batches) == 3                        # 12 items, bs 5
  assert batches[0]["leftImg"].shape == (5, 64, 32, 3)
  assert batches[-1]["leftImg"].shape == (2, 64, 32, 3)
  assert isinstance(batches[0]["dispNames"], list)
  # shuffling is epoch-deterministic
  again = list(DataLoader(ds, batch_size=5, shuffle=True, num_workers=2))
  np.testing.assert_allclose(batches[0]["dispMap"], again[0]["dispMap"])


def test_disparity_dataset_resize(deep360_root):
  tl, tr, td, *_ = list_deep360_disparity_train(deep360_root)
  ds = Deep360DatasetDisparity(tl, tr, td, shape=(32, 16))
  item = ds[0]
  assert item["leftImg"].shape == (32, 16, 3)
  # disparity rescaled by width ratio 16/32
  raw = np.load(td[0])["arr_0"]
  assert np.nanmax(item["dispMap"]) <= np.nanmax(raw) * 0.5 + 1e-3


def test_fusion_lists_and_dataset(deep360_root, fusion_root):
  (td, tc, tr, tg, vd, vc, vr, vg) = list_deep360_fusion_train(
      fusion_root, deep360_root)
  assert len(td) == 6 and len(tc) == 6 and len(tr) == 4
  assert len(tg) == 2 and len(vg) == 2
  # rgb cameras: pair-12 left/right and pair-34 left/right
  assert "_12_rgb_l" in tr[0][0] and "_12_rgb_r" in tr[1][0]
  assert "_34_rgb_l" in tr[2][0] and "_34_rgb_r" in tr[3][0]

  ds = Deep360DatasetFusion(td, tc, tr, tg, resize=False, training=True)
  item = ds[0]
  assert item["depths"].shape == (6, 64, 32, 1)
  assert item["confs"].shape == (6, 64, 32, 1)
  assert item["rgbs"].shape == (4, 64, 32, 3)
  assert item["gt"].shape == (64, 32)
  assert 0 <= item["confs"].min() and item["confs"].max() <= 1

  ds_half = Deep360DatasetFusion(td, tc, tr, tg, resize=True, training=True)
  item = ds_half[0]
  assert item["depths"].shape == (6, 32, 16, 1)
  assert item["gt"].shape == (32, 16)

  sd, sc, sr, sg = list_deep360_fusion_test(fusion_root, deep360_root)
  assert len(sg) == 2


def test_soiled_lists(tmp_path):
  from tests.synth_data import make_deep360_tree
  root = str(tmp_path / "soiled")
  make_deep360_tree(root, frames_per_subset=1, h=32, w=16, soiled=True)
  # soiled trees also need the clean disp/depth dirs (same generator run
  # writes them); listers must pick rgb_soiled
  tl, tr, td, *_ = list_deep360_disparity_train(root, soiled=True)
  assert len(tl) == 6
  assert all("rgb_soiled" in p for p in tl + tr)
  assert all("/disp/" in p for p in td)
