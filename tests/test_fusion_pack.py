"""Packed fusion dataset (data/fusion_pack.py): roundtrip fidelity vs the
19-file ingest, and the raw-inputs train step vs the decoded-f32 step.

Reference anchor: the fusion ingest unit being replaced is
``deep360_loader.py:118-168`` (6 depth npz + 6 conf png + 4 rgb png + gt)."""

import numpy as np
import pytest

from mode_tpu.data.deep360 import Deep360DatasetFusion
from mode_tpu.data.file_lists import list_deep360_fusion_train
from mode_tpu.data.fusion_pack import (PackedFusionDataset, pack_dataset,
                                       read_pack, write_pack)
from tests.synth_data import make_deep360_tree, make_fusion_inputs


@pytest.fixture(scope="module")
def fusion_lists(tmp_path_factory):
  root = tmp_path_factory.mktemp("packroot")
  ds_root = str(root / "dataset")
  in_root = str(root / "inputs")
  make_deep360_tree(ds_root, episodes=("ep1_x",), frames_per_subset=2,
                    h=64, w=32, subsets=("training", "validation"))
  make_fusion_inputs(in_root, ds_root)
  return list_deep360_fusion_train(in_root, ds_root, soiled=False)


def test_write_read_roundtrip(tmp_path):
  rng = np.random.default_rng(0)
  depths = rng.uniform(0, 1000, (6, 16, 8)).astype(np.float32)
  confs = rng.integers(0, 256, (6, 16, 8)).astype(np.uint8)
  rgbs = rng.integers(0, 256, (4, 16, 8, 3)).astype(np.uint8)
  gt = rng.uniform(0, 1000, (16, 8)).astype(np.float32)
  path = str(tmp_path / "f.mfp")
  write_pack(path, depths, confs, rgbs, gt)
  d2, c2, r2, g2 = read_pack(path)
  np.testing.assert_array_equal(c2, confs)
  np.testing.assert_array_equal(r2, rgbs)
  np.testing.assert_array_equal(g2, gt)
  # f16 wire dtype: <=0.05% relative error at depth scale
  np.testing.assert_allclose(d2.astype(np.float32), depths, rtol=5e-4,
                             atol=1e-3)


def test_pack_matches_file_ingest(fusion_lists, tmp_path):
  td, tc, tr, tg, *_ = fusion_lists
  ref_ds = Deep360DatasetFusion(td, tc, tr, tg, resize=False, training=True)
  paths = pack_dataset(td, tc, tr, tg, str(tmp_path / "packs"))
  pk_ds = PackedFusionDataset(paths, gt_names=tg)
  assert len(pk_ds) == len(ref_ds)

  from mode_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
  for i in range(len(pk_ds)):
    a, b = pk_ds[i], ref_ds[i]
    assert a["gtNames"] == b["gtNames"]
    np.testing.assert_array_equal(a["gt"], b["gt"])
    np.testing.assert_allclose(a["depths"].astype(np.float32), b["depths"],
                               rtol=5e-4, atol=1e-3)
    # conf: u8 wire vs the reference's png->f32/255 (identical quantization)
    np.testing.assert_allclose(a["confs"].astype(np.float32) / 255.0,
                               b["confs"], atol=1 / 255.0 / 2)
    # rgb: on-device normalize of the u8 wire == host rgb_to_tensor
    norm = (a["rgbs"].astype(np.float32) / 255.0 - IMAGENET_MEAN) \
        / IMAGENET_STD
    np.testing.assert_allclose(norm, b["rgbs"], rtol=1e-5, atol=1e-5)


def test_raw_inputs_train_step(fusion_lists, tmp_path):
  import jax
  import jax.numpy as jnp

  from mode_tpu import training
  from mode_tpu.data.loader import DataLoader
  from mode_tpu.models.fusion import ModeFusion

  td, tc, tr, tg, *_ = fusion_lists
  paths = pack_dataset(td, tc, tr, tg, str(tmp_path / "packs"))
  ds = PackedFusionDataset(paths, gt_names=tg)
  loader = DataLoader(ds, batch_size=2, num_workers=2)
  batch = next(iter(loader))
  assert batch["depths"].dtype == np.float16
  assert batch["rgbs"].dtype == np.uint8

  model = ModeFusion(max_depth=1000.0)
  opt = training.make_optimizer()
  mk1 = lambda: np.zeros((2, 64, 32, 1), np.float32)
  mk3 = lambda: np.zeros((2, 64, 32, 3), np.float32)
  def fresh_state():
    return training.init_state(model, opt, jax.random.PRNGKey(0),
                               [mk1() for _ in range(6)],
                               [mk1() for _ in range(6)],
                               [mk3() for _ in range(4)], train=False)

  raw_step = training.make_fusion_train_step(model, opt, 1000.0,
                                             raw_inputs=True)
  f32_step = training.make_fusion_train_step(model, opt, 1000.0)

  def unpack(b, raw):
    if raw:
      return ([b["depths"][:, k] for k in range(6)],
              [b["confs"][:, k] for k in range(6)],
              [b["rgbs"][:, k] for k in range(4)], b["gt"])
    from mode_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
    return ([b["depths"][:, k].astype(np.float32) for k in range(6)],
            [b["confs"][:, k].astype(np.float32) / 255.0 for k in range(6)],
            [((b["rgbs"][:, k].astype(np.float32) / 255.0 - IMAGENET_MEAN)
              / IMAGENET_STD).astype(np.float32) for k in range(4)],
            b["gt"])

  # the steps donate their state arg — give each its own (identically
  # seeded) copy
  _, loss_raw = raw_step(fresh_state(), *unpack(batch, True))
  _, loss_f32 = f32_step(fresh_state(), *unpack(batch, False))
  assert np.isfinite(float(loss_raw))
  # identical math modulo the f16 depth wire dtype
  np.testing.assert_allclose(float(loss_raw), float(loss_f32), rtol=1e-3)
