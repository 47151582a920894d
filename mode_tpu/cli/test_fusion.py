"""MODE fusion-stage testing CLI (ERP-domain evaluation).

Parity target: ``/root/reference/test_fusion.py`` — fuse, optionally
bicubic-×2 (``--resize``), convert prediction AND ground truth to the ERP
domain, compute the 8 depth metrics on gt<=maxdepth, dump npy +
log-colormapped PNGs.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import re

import jax
import numpy as np

from mode_tpu.cli.common import (count_params, format_table,
                                 load_model_checkpoint)
from mode_tpu.data.deep360 import Deep360DatasetFusion
from mode_tpu.data.file_lists import list_deep360_fusion_test
from mode_tpu.data.loader import DataLoader
from mode_tpu.geometry import cassini_to_erp
from mode_tpu.models.fusion import Baseline, ModeFusion
from mode_tpu.ops.resize import upsample_bicubic
from mode_tpu.utils import metrics
from mode_tpu.utils.colormap import jet_colormap
from PIL import Image

METRIC_NAMES = ["MAE", "RMSE", "AbsRel", "SqRel", "SILog", "δ1 (%)",
                "δ2 (%)", "δ3 (%)"]


def build_parser():
  p = argparse.ArgumentParser(description="MODE Fusion testing (TPU)")
  p.add_argument("--maxdepth", type=float, default=1000.0)
  p.add_argument("--model", default="ModeFusion",
                 choices=["ModeFusion", "Baseline"])
  p.add_argument("--dbname", default="Deep360")
  p.add_argument("--soiled", action="store_true")
  p.add_argument("--resize", action="store_true")
  p.add_argument("--datapath-input", default="./outputs/Deep360PredDepth/")
  p.add_argument("--datapath-dataset", default="./datasets/Deep360/")
  p.add_argument("--outpath", default="./MODE_Fusion_output/")
  p.add_argument("--batch-size", type=int, default=1)
  p.add_argument("--loadmodel", default=None, required=True)
  p.add_argument("--seed", type=int, default=1)
  p.add_argument("--max_batches", type=int, default=None)
  return p


def _save_log_png(path, arr):
  v = np.log(arr - np.min(arr) + 1)
  v = np.clip(255 * v / max(np.max(v), 1e-9), 0, 255).astype(np.uint8)
  Image.fromarray(jet_colormap(v)).save(path)


def main(argv=None):
  args = build_parser().parse_args(argv)
  sd, sc, sr, sg = list_deep360_fusion_test(args.datapath_input,
                                            args.datapath_dataset,
                                            args.soiled)
  ds = Deep360DatasetFusion(sd, sc, sr, sg, resize=args.resize,
                            training=False)
  loader = DataLoader(ds, batch_size=args.batch_size,
                      num_workers=args.batch_size)

  if args.model == "ModeFusion":
    model = ModeFusion(max_depth=args.maxdepth)
  else:
    model = Baseline(max_depth=args.maxdepth)
  sample = ds[0]
  mk = lambda a: np.zeros((1,) + a.shape, a.dtype)
  d0 = [mk(sample["depths"][k]) for k in range(6)]
  c0 = [mk(sample["confs"][k]) for k in range(6)]
  r0 = [mk(sample["rgbs"][k]) for k in range(4)]
  if args.model == "ModeFusion":
    variables = model.init(jax.random.PRNGKey(0), d0, c0, r0, train=False)
    fwd = jax.jit(lambda v, d, c, r: model.apply(v, d, c, r, train=False))
  else:
    variables = model.init(jax.random.PRNGKey(0), d0, train=False)
    fwd = jax.jit(lambda v, d, c, r: model.apply(v, d, train=False))
  print("Load pretrained model")
  variables, _ = load_model_checkpoint(args.loadmodel, variables)
  print(f"Number of model parameters: {count_params(variables['params'])}")

  @jax.jit
  def postprocess(pred_hw1, gt_hw):
    pred = pred_hw1
    if args.resize:
      pred = upsample_bicubic(pred, pred.shape[1] * 2, pred.shape[2] * 2)
    pred_erp = cassini_to_erp(pred)[..., 0]
    gt_erp = cassini_to_erp(gt_hw[..., None])[..., 0]
    return pred_erp, gt_erp

  snapshot = osp.splitext(osp.basename(args.loadmodel.rstrip("/")))[0]
  result_dir = osp.join(args.outpath, args.dbname, snapshot)
  depth_pred_path = osp.join(result_dir, "depth_pred")
  gt_png_path = osp.join(result_dir, "gt_png")
  os.makedirs(depth_pred_path, exist_ok=True)
  os.makedirs(gt_png_path, exist_ok=True)

  totals = np.zeros(8)
  nb = 0
  for bi, batch in enumerate(loader):
    if args.max_batches and bi >= args.max_batches:
      break
    print(f"\rStage2 Test: {100 * (bi + 1) / len(loader):.2f}%", end="")
    depths = [batch["depths"][:, k] for k in range(6)]
    confs = [batch["confs"][:, k] for k in range(6)]
    rgbs = [batch["rgbs"][:, k] for k in range(4)]
    out = fwd(variables, depths, confs, rgbs)
    pred_erp, gt_erp = postprocess(out, batch["gt"])
    pred_erp = np.asarray(pred_erp)
    gt_erp = np.asarray(gt_erp)
    mask = gt_erp <= args.maxdepth
    m = metrics.depth_metrics(pred_erp, gt_erp, mask)
    totals += np.array([float(m[k]) for k in METRIC_NAMES])
    nb += 1
    for i in range(pred_erp.shape[0]):
      name = osp.splitext(osp.basename(batch["gtNames"][i]))[0]
      ep = re.findall(r"ep[0-9]_", batch["gtNames"][i])
      if ep:
        name = ep[0] + name
      _save_log_png(osp.join(gt_png_path, name + "_gt.png"), gt_erp[i])
      np.save(osp.join(depth_pred_path, name + "_pred.npy"), pred_erp[i])
      _save_log_png(osp.join(depth_pred_path, name + "_pred.png"),
                    pred_erp[i])
  mean = totals / max(nb, 1)
  print("\nTest Results:\n")
  print(format_table(METRIC_NAMES, [list(mean)]))
  return dict(zip(METRIC_NAMES, mean))


if __name__ == "__main__":
  main()
