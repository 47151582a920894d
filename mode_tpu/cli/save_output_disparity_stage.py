"""Stage-1 → stage-2 bridge CLI: run disparity+confidence over the whole
dataset and write camera-1-frame depth/confidence trees for fusion.

Parity target: ``/root/reference/save_output_disparity_stage.py``. The
reference's bridge runs rotate on GPU but the SE(3) z-buffer in a serial
numba CPU loop per image; here model + bridge execute as one jitted TPU
program per batch (the scatter-min z-buffer runs on-device).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from mode_tpu.cli.common import count_params, load_model_checkpoint
from mode_tpu.data.deep360 import Deep360DatasetDisparity
from mode_tpu.data.file_lists import list_deep360_disparity_all
from mode_tpu.data.loader import DataLoader
from mode_tpu.geometry.reprojection import (
    DEEP360_BASELINES,
    FISHEYE_BASELINES,
    disp_to_depth_at_cam1,
)
from mode_tpu.models.disparity import ModeDisparity
from mode_tpu.utils.colormap import save_gray_png

CAM_PAIRS = ("12", "13", "14", "23", "24", "34")


def build_parser():
  p = argparse.ArgumentParser(
      description="MODE - save disparity and confidence outputs (TPU)")
  p.add_argument("--max_disp", type=int, default=192)
  p.add_argument("--dbname", default="Deep360")
  p.add_argument("--datapath", default="../../datasets/Deep360/")
  p.add_argument("--soiled", action="store_true")
  p.add_argument("--outpath", default="./outputs/Deep360PredDepth/")
  p.add_argument("--batch_size", type=int, default=6)
  p.add_argument("--checkpoint_disp", default=None)
  p.add_argument("--width", default=512, type=int)
  p.add_argument("--height", default=1024, type=int)
  p.add_argument("--seed", type=int, default=1)
  p.add_argument("--max_batches", type=int, default=None)
  return p


def baselines_for_dbname(dbname: str) -> dict:
  """Stereo-baseline table selection by dataset name
  (save_output_disparity_stage.py:108-113): 'Deep360' uses the simulated
  rig's 1/1/sqrt2 baselines; any other rig name selects the real fisheye
  rig's 0.6*sqrt2/1.2 table. The reference leaves '3D60' undefined (it
  never reaches disp2depth); we reject it explicitly."""
  if dbname == "Deep360":
    return DEEP360_BASELINES
  if dbname == "3D60":
    raise ValueError("3D60 has no camera rig: the bridge is Deep360/fisheye "
                     "only (3D60 fusion inputs come from the 3D60 loaders)")
  return FISHEYE_BASELINES


def output_paths(disp_name: str, datapath: str, outpath: str, outdir: str,
                 outdir_conf: str) -> tuple[str, str]:
  """Map a dataset disparity path to (depth_npz, conf_png) output paths by
  path components (the reference's string ``.replace('disp', ...)`` breaks
  when 'disp' appears in the datapath or episode name)."""
  rel = os.path.relpath(disp_name, datapath)
  parts = rel.split(os.sep)
  # .../<ep>/<subset>/disp/<frame>_<pair>_disp.npz
  stem = parts[-1][:-len("disp.npz")]
  subdir = parts[:-2]
  depth_out = os.path.join(outpath, *subdir, outdir,
                           stem + "disp_pred2depth.npz")
  conf_out = os.path.join(outpath, *subdir, outdir_conf, stem + "conf_map.png")
  return depth_out, conf_out


def pad16(x: np.ndarray) -> tuple[np.ndarray, int, int]:
  """Pad H (top) and W (right) to multiples of 16
  (save_output_disparity_stage.py:77-90)."""
  h, w = x.shape[1:3]
  top = (-h) % 16
  right = (-w) % 16
  if top or right:
    x = np.pad(x, ((0, 0), (top, 0), (0, right), (0, 0)))
  return x, top, right


def main(argv=None):
  args = build_parser().parse_args(argv)

  left, right, disp = list_deep360_disparity_all(args.datapath, args.soiled)
  ds = Deep360DatasetDisparity(left, right, disp,
                               shape=(args.height, args.width))
  loader = DataLoader(ds, batch_size=args.batch_size,
                      num_workers=args.batch_size)

  model = ModeDisparity(maxdisp=args.max_disp, conv="Sphere",
                        sphere_type="Cassini", out_conf=True)
  dummy = np.zeros((1, args.height, args.width, 3), np.float32)
  variables = model.init(jax.random.PRNGKey(0), dummy, dummy, train=False)
  if args.checkpoint_disp:
    print("Load pretrained model")
    variables, _ = load_model_checkpoint(args.checkpoint_disp, variables)
  print(f"Number of model parameters: {count_params(variables['params'])}")

  outdir = "disp_pred2depth" if not args.soiled else "disp_pred2depth_soiled"
  outdir_conf = "conf_map" if not args.soiled else "conf_map_soiled"
  eps = sorted(d for d in os.listdir(args.datapath) if d.startswith("ep"))
  for ep in eps:
    for subset in ("training", "validation", "testing"):
      if not os.path.isdir(os.path.join(args.datapath, ep, subset)):
        continue
      os.makedirs(os.path.join(args.outpath, ep, subset, outdir),
                  exist_ok=True)
      os.makedirs(os.path.join(args.outpath, ep, subset, outdir_conf),
                  exist_ok=True)

  fwd = jax.jit(lambda v, l, r: model.apply(v, l, r, train=False))
  baselines = baselines_for_dbname(args.dbname)
  bridges = {
      pair: jax.jit(lambda d, c, p=pair: disp_to_depth_at_cam1(
          d, c, p, baselines=baselines))
      for pair in CAM_PAIRS
  }

  n = len(loader)
  for bi, batch in enumerate(loader):
    print(f"\rDisparity output progress: {100 * (bi + 1) / n:.2f}%", end="")
    if args.max_batches and bi >= args.max_batches:
      break
    imgl, top, rgt = pad16(batch["leftImg"])
    imgr, _, _ = pad16(batch["rightImg"])
    pred, conf = fwd(variables, imgl, imgr)
    pred = pred[:, top:, :pred.shape[2] - rgt or None]
    conf = conf[:, top:, :conf.shape[2] - rgt or None]
    for i in range(pred.shape[0]):
      disp_name = batch["dispNames"][i]
      pair = disp_name[-11:-9]
      depth1, conf1 = bridges[pair](pred[i], conf[i])
      depth_out, conf_out = output_paths(disp_name, args.datapath,
                                         args.outpath, outdir, outdir_conf)
      np.savez(depth_out, np.asarray(depth1))
      save_gray_png(conf_out, np.asarray(conf1))
  print()


if __name__ == "__main__":
  main()
