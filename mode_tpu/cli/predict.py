"""Single-frame prediction CLI (real-scene inference).

Parity target: ``/root/reference/predict.py`` — which is bit-rotted
(undefined ``args.height/width``, nonexistent ``preprocess.get_transform``;
``predict.py:67,79``). This implements the intended behavior and extends it:
``--stage disp`` runs one stereo pair → disparity + confidence PNGs;
``--stage all`` runs the fused whole-frame pipeline (6 pairs → bridge →
fusion) in a single XLA program and writes the final 360° depth map.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np
from PIL import Image

from mode_tpu.cli.common import load_model_checkpoint
from mode_tpu.data.preprocess import rgb_to_tensor
from mode_tpu.models.disparity import ModeDisparity
from mode_tpu.models.fusion import ModeFusion
from mode_tpu.pipeline import CAM_PAIRS, TwoStagePipeline
from mode_tpu.utils.colormap import jet_colormap, normalize_to_u8, \
    save_gray_png


def build_parser():
  p = argparse.ArgumentParser(
      description="Multi View Omnidirectional Depth Estimation (TPU)")
  p.add_argument("--stage", default="disp", choices=["disp", "all"])
  p.add_argument("--data_root", default="./",
                 help="directory holding the multi-view inputs")
  p.add_argument("--save_root", default="./")
  p.add_argument("--img_name_prefix", default="ca",
                 help="multi-view input prefix: <prefix>_<pair>_<l|r>.png")
  p.add_argument("--img_type", default=".png")
  p.add_argument("--left_name", default="")
  p.add_argument("--right_name", default="")
  p.add_argument("--widthC", default=512, type=int)
  p.add_argument("--heightC", default=1024, type=int)
  p.add_argument("--max_disp", type=int, default=192)
  p.add_argument("--max_depth", default=1000, type=float)
  p.add_argument("--checkpoint_disp", required=True)
  p.add_argument("--checkpoint_fusion", default=None)
  return p


def _load(path, h, w):
  img = Image.open(path).convert("RGB")
  if img.size != (w, h):
    img = img.resize((w, h))
  return rgb_to_tensor(img)


def main(argv=None):
  args = build_parser().parse_args(argv)
  h, w = args.heightC, args.widthC

  disp_model = ModeDisparity(maxdisp=args.max_disp, out_conf=True)
  dummy = np.zeros((1, h, w, 3), np.float32)
  disp_vars = disp_model.init(jax.random.PRNGKey(0), dummy, dummy,
                              train=False)
  disp_vars, _ = load_model_checkpoint(args.checkpoint_disp, disp_vars)

  os.makedirs(args.save_root, exist_ok=True)

  if args.stage == "disp":
    left = _load(args.left_name, h, w)[None]
    right = _load(args.right_name, h, w)[None]
    fwd = jax.jit(lambda v, l, r: disp_model.apply(v, l, r, train=False))
    pred, conf = fwd(disp_vars, left, right)
    pred = np.maximum(np.asarray(pred)[0], 0)
    conf = np.asarray(conf)[0]
    log_disp = np.log(pred + 1.0)
    Image.fromarray(jet_colormap(normalize_to_u8(log_disp))).save(
        os.path.join(args.save_root, "output_disp.png"))
    save_gray_png(os.path.join(args.save_root, "output_conf.png"),
                  np.clip(conf, 0, 1))
    print(f"wrote output_disp.png / output_conf.png to {args.save_root}")
    return

  # --stage all: whole-frame two-stage pipeline
  assert args.checkpoint_fusion, "--stage all needs --checkpoint_fusion"
  fusion_model = ModeFusion(max_depth=args.max_depth)
  zeros1 = [np.zeros((1, h, w, 1), np.float32)] * 6
  rgb0 = [np.zeros((1, h, w, 3), np.float32)] * 4
  fusion_vars = fusion_model.init(jax.random.PRNGKey(0), zeros1, zeros1,
                                  rgb0, train=False)
  fusion_vars, _ = load_model_checkpoint(args.checkpoint_fusion, fusion_vars)

  lefts, rights = [], []
  for pair in CAM_PAIRS:
    base = os.path.join(args.data_root,
                        f"{args.img_name_prefix}_{pair}")
    lefts.append(_load(base + "_l" + args.img_type, h, w))
    rights.append(_load(base + "_r" + args.img_type, h, w))
  lefts = np.stack(lefts)
  rights = np.stack(rights)
  # camera views 1,2,3,4 = pair-12 left/right and pair-34 left/right
  rgbs = np.stack([lefts[0], rights[0], lefts[5], rights[5]])

  pipe = TwoStagePipeline(disp_vars, fusion_vars, args.max_disp,
                          args.max_depth)
  depth, disp, conf = pipe(lefts, rights, rgbs)
  depth = np.asarray(depth)
  np.savez(os.path.join(args.save_root, "output_depth.npz"), depth)
  log_depth = np.log(depth + 1.0)
  Image.fromarray(jet_colormap(normalize_to_u8(log_depth))).save(
      os.path.join(args.save_root, "output_depth.png"))
  print(f"wrote output_depth.npz / output_depth.png to {args.save_root}")


if __name__ == "__main__":
  main()
