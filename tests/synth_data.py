"""Synthetic Deep360 dataset trees for tests and CLI verification.

Reproduces the directory layout and file-naming conventions the reference's
file listers depend on (``/root/reference/dataloader/list_file.py``): per
episode/subset, 12 sorted rgb PNGs per frame (2 per camera pair, pair order
12,13,14,23,24,34), 6 ``*_disp.npz`` maps whose names end with
``<pair>_disp.npz`` (the save CLI slices the pair from ``name[-11:-9]``),
and one gt ``*_depth.npz`` per frame.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

PAIRS = ("12", "13", "14", "23", "24", "34")


def make_deep360_tree(root: str, episodes=("ep1_500frames",),
                      frames_per_subset=2, h: int = 64, w: int = 32,
                      subsets=("training", "validation", "testing"),
                      soiled: bool = False, seed: int = 0) -> str:
  rng = np.random.default_rng(seed)
  rgb_dir = "rgb_soiled" if soiled else "rgb"
  for ep in episodes:
    for subset in subsets:
      rgb_path = os.path.join(root, ep, subset, rgb_dir)
      disp_path = os.path.join(root, ep, subset, "disp")
      depth_path = os.path.join(root, ep, subset, "depth")
      for p in (rgb_path, disp_path, depth_path):
        os.makedirs(p, exist_ok=True)
      for f in range(frames_per_subset):
        for pair in PAIRS:
          for side in ("l", "r"):
            img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(rgb_path, f"{f:06d}_{pair}_rgb_{side}.png"))
          disp = rng.uniform(0.5, 24.0, size=(h, w)).astype(np.float32)
          disp[rng.random((h, w)) < 0.05] = np.nan  # invalid px like Deep360
          np.savez(os.path.join(disp_path, f"{f:06d}_{pair}_disp.npz"), disp)
        depth = rng.uniform(0.5, 900.0, size=(h, w)).astype(np.float32)
        np.savez(os.path.join(depth_path, f"{f:06d}_depth.npz"), depth)
  return root


def make_fusion_inputs(input_root: str, dataset_root: str,
                       soiled: bool = False, seed: int = 1) -> str:
  """Write the stage-1 output tree (disp_pred2depth + conf_map) that the
  fusion stage consumes, mirroring the dataset tree's frames."""
  rng = np.random.default_rng(seed)
  sfx = "_soiled" if soiled else ""
  for ep in sorted(os.listdir(dataset_root)):
    if not ep.startswith("ep"):
      continue
    for subset in os.listdir(os.path.join(dataset_root, ep)):
      depth_dir = os.path.join(dataset_root, ep, subset, "depth")
      if not os.path.isdir(depth_dir):
        continue
      pred_path = os.path.join(input_root, ep, subset,
                               "disp_pred2depth" + sfx)
      conf_path = os.path.join(input_root, ep, subset, "conf_map" + sfx)
      os.makedirs(pred_path, exist_ok=True)
      os.makedirs(conf_path, exist_ok=True)
      for gt_name in sorted(os.listdir(depth_dir)):
        frame = gt_name.split("_")[0]
        gt = np.load(os.path.join(depth_dir, gt_name))["arr_0"]
        h, w = gt.shape
        for pair in PAIRS:
          d = rng.uniform(0.5, 900.0, size=(h, w)).astype(np.float32)
          np.savez(os.path.join(
              pred_path, f"{frame}_{pair}_disp_pred2depth.npz"), d)
          conf = rng.integers(0, 255, size=(h, w), dtype=np.uint8)
          Image.fromarray(conf).save(
              os.path.join(conf_path, f"{frame}_{pair}_conf_map.png"))
  return input_root


def make_3d60_tree(root: str, n_frames: int = 2, erp_h: int = 32,
                   erp_w: int = 64, seed: int = 3,
                   with_fusion_inputs: bool = False,
                   ca_shape=(32, 16)) -> str:
  """Synthetic 3D60 trinocular tree + filenames txt (depth as .npz)."""
  rng = np.random.default_rng(seed)
  root = str(root)
  lines = []
  for view in ("Center_Left_Down", "Right", "Up"):
    os.makedirs(os.path.join(root, view, "Matterport3D"), exist_ok=True)
  for f in range(n_frames):
    entry = []
    for view in ("Center_Left_Down", "Right", "Up"):
      img = rng.integers(0, 255, size=(erp_h, erp_w, 3), dtype=np.uint8)
      rel = f"./Matterport3D/{f}_color_0.png"
      Image.fromarray(img).save(os.path.join(root, view, rel[2:]))
      entry.append(rel)
    for view in ("Center_Left_Down", "Right", "Up"):
      depth = rng.uniform(0.5, 15.0, size=(erp_h, erp_w)).astype(np.float32)
      rel = f"./Matterport3D/{f}_depth_0.npz"
      np.savez(os.path.join(root, view, rel[2:]), depth)
      entry.append(rel)
    lines.append(" ".join(entry))
  list_file = os.path.join(root, "files.txt")
  with open(list_file, "w") as fh:
    fh.write("\n".join(lines) + "\n")

  if with_fusion_inputs:
    ca_h, ca_w = ca_shape
    pred_dir = os.path.join(root, "pred", "Center_Left_Down",
                            "disp_pred2depth", "Matterport3D")
    conf_dir = os.path.join(root, "pred", "Center_Left_Down",
                            "conf_map", "Matterport3D")
    os.makedirs(pred_dir, exist_ok=True)
    os.makedirs(conf_dir, exist_ok=True)
    for f in range(n_frames):
      for fid in ("lr_l", "lr_r", "ud_u", "ud_d", "ur_u", "ur_r"):
        d = rng.uniform(0.5, 15.0, size=(ca_h, ca_w)).astype(np.float32)
        np.savez(os.path.join(pred_dir, f"{f}_{fid}_disp_pred2depth.npz"), d)
        conf = rng.integers(0, 255, size=(ca_h, ca_w), dtype=np.uint8)
        Image.fromarray(conf).save(
            os.path.join(conf_dir, f"{f}_{fid}_conf_map.png"))
  return list_file
