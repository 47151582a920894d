"""End-to-end CLI tests over a synthetic Deep360 tree (tiny shapes, CPU).

Exercises the full reference workflow (README.md:58-103): train disparity →
save stage-1 outputs → train fusion → test both stages — each through the
real CLI entry points.
"""

import os

import numpy as np
import pytest

from tests.synth_data import make_deep360_tree

H, W = 64, 32
MAXDISP = 16


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
  data = str(make_deep360_tree(tmp_path_factory.mktemp("deep360"),
                               frames_per_subset=2, h=H, w=W))
  work = str(tmp_path_factory.mktemp("work"))
  return data, work


def test_full_two_stage_workflow(roots):
  data_root, work = roots
  ckpt_root = os.path.join(work, "ckpt")
  pred_root = os.path.join(work, "pred")
  fusion_ckpt_root = os.path.join(work, "fusion_ckpt")

  # --- stage 1 training (1 epoch, 2 steps)
  from mode_tpu.cli.train_disparity import main as train_disp
  train_disp(["--dataset_root", data_root, "--height", str(H),
              "--width", str(W), "--max_disp", str(MAXDISP),
              "--epochs", "1", "--batch_size", "2", "--steps_per_epoch", "2",
              "--save_checkpoint_path", ckpt_root, "--dp", "2", "--sp", "2"])
  disp_ckpt = os.path.join(ckpt_root, "ModeDisparity", "Deep360",
                           "ckpt_disp_ModeDisparity_Deep360_1")
  assert os.path.isdir(disp_ckpt)
  logs = os.path.join(ckpt_root, "ModeDisparity", "Deep360", "logs")
  assert any(f.startswith("events.out.tfevents") for f in os.listdir(logs))

  # --- stage 1 testing
  from mode_tpu.cli.test_disparity import main as test_disp
  out = test_disp(["--dataset_root", data_root, "--height", str(H),
                   "--width", str(W), "--max_disp", str(MAXDISP),
                   "--checkpoint_disp", disp_ckpt, "--batch_size", "2",
                   "--max_batches", "2",
                   "--save_output_path", os.path.join(work, "disp_out"),
                   "--save_ori"])
  assert np.isfinite(out["MAE"])
  saved = os.listdir(os.path.join(work, "disp_out"))
  assert any(f.endswith("_pred.npz") for f in saved)
  assert any(f.endswith("_pred.png") for f in saved)

  # --- stage 1 → 2 bridge (full dataset: 36 pairs)
  from mode_tpu.cli.save_output_disparity_stage import main as save_stage
  save_stage(["--datapath", data_root, "--outpath", pred_root,
              "--height", str(H), "--width", str(W),
              "--max_disp", str(MAXDISP), "--checkpoint_disp", disp_ckpt,
              "--batch_size", "6"])
  pd = os.path.join(pred_root, "ep1_500frames", "training",
                    "disp_pred2depth")
  assert len(os.listdir(pd)) == 12      # 2 frames x 6 pairs
  cm = os.path.join(pred_root, "ep1_500frames", "training", "conf_map")
  assert len(os.listdir(cm)) == 12
  # bridge outputs load as valid depth maps
  d = np.load(os.path.join(pd, sorted(os.listdir(pd))[0]))["arr_0"]
  assert d.shape == (H, W) and np.isfinite(d).all() and d.max() <= 1000.0

  # --- stage 2 training
  from mode_tpu.cli.train_fusion import main as train_fus
  train_fus(["--datapath-input", pred_root, "--datapath-dataset", data_root,
             "--epochs", "1", "--batch-size", "2", "--steps_per_epoch", "2",
             "--savemodel", fusion_ckpt_root, "--dp", "2"])
  fusion_ckpt = os.path.join(fusion_ckpt_root, "ModeFusion", "Deep360",
                             "ckpt_fusion_epoch0")
  assert os.path.isdir(fusion_ckpt)

  # --- stage 2 testing (ERP-domain metrics + dumps)
  from mode_tpu.cli.test_fusion import main as test_fus
  out = test_fus(["--datapath-input", pred_root,
                  "--datapath-dataset", data_root,
                  "--loadmodel", fusion_ckpt, "--batch-size", "1",
                  "--max_batches", "2",
                  "--outpath", os.path.join(work, "fusion_out")])
  assert np.isfinite(out["MAE"])


def test_predict_two_stage(roots, tmp_path):
  data_root, work = roots
  disp_ckpt = os.path.join(work, "ckpt", "ModeDisparity", "Deep360",
                           "ckpt_disp_ModeDisparity_Deep360_1")
  fusion_ckpt = os.path.join(work, "fusion_ckpt", "ModeFusion", "Deep360",
                             "ckpt_fusion_epoch0")
  if not (os.path.isdir(disp_ckpt) and os.path.isdir(fusion_ckpt)):
    pytest.skip("needs test_full_two_stage_workflow first")

  # stage 'disp': single pair
  rgb = os.path.join(data_root, "ep1_500frames", "testing", "rgb")
  files = sorted(os.listdir(rgb))
  from mode_tpu.cli.predict import main as predict
  outdir = str(tmp_path / "pred1")
  predict(["--stage", "disp", "--left_name", os.path.join(rgb, files[0]),
           "--right_name", os.path.join(rgb, files[1]),
           "--heightC", str(H), "--widthC", str(W),
           "--max_disp", str(MAXDISP),
           "--checkpoint_disp", disp_ckpt, "--save_root", outdir])
  assert os.path.exists(os.path.join(outdir, "output_disp.png"))
  assert os.path.exists(os.path.join(outdir, "output_conf.png"))

  # stage 'all': 12 inputs named ca_<pair>_<l|r>.png
  frame_dir = str(tmp_path / "frame")
  os.makedirs(frame_dir)
  import shutil
  for f in files[:12]:
    pair, side = f.split("_")[1], f.split("_")[-1].split(".")[0]
    shutil.copy(os.path.join(rgb, f),
                os.path.join(frame_dir, f"ca_{pair}_{side}.png"))
  outdir = str(tmp_path / "pred2")
  predict(["--stage", "all", "--data_root", frame_dir,
           "--heightC", str(H), "--widthC", str(W),
           "--max_disp", str(MAXDISP),
           "--checkpoint_disp", disp_ckpt,
           "--checkpoint_fusion", fusion_ckpt, "--save_root", outdir])
  depth = np.load(os.path.join(outdir, "output_depth.npz"))["arr_0"]
  assert depth.shape == (H, W) and np.isfinite(depth).all()
