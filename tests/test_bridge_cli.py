"""Unit tests for the stage-1→2 bridge CLI's rig selection and path logic.

Parity targets: baseline-by-dbname selection
(``/root/reference/save_output_disparity_stage.py:108-113``) and the output
tree layout its main loop produces.
"""

import os

import numpy as np
import pytest

from mode_tpu.cli.save_output_disparity_stage import (
    baselines_for_dbname,
    output_paths,
)
from mode_tpu.geometry.reprojection import (
    DEEP360_BASELINES,
    FISHEYE_BASELINES,
    disp_to_depth_at_cam1,
)


def test_baselines_for_dbname():
  assert baselines_for_dbname("Deep360") is DEEP360_BASELINES
  assert baselines_for_dbname("Fisheye") is FISHEYE_BASELINES
  # the reference leaves '3D60' undefined (NameError at use); we refuse it
  with pytest.raises(ValueError):
    baselines_for_dbname("3D60")


def test_pair_depth_changes_with_dbname():
  rng = np.random.default_rng(0)
  disp = rng.uniform(1.0, 12.0, size=(32, 16)).astype(np.float32)
  conf = rng.uniform(0.0, 1.0, size=(32, 16)).astype(np.float32)
  d_deep, _ = disp_to_depth_at_cam1(disp, conf, "12",
                                    baselines=DEEP360_BASELINES)
  d_fish, _ = disp_to_depth_at_cam1(disp, conf, "12",
                                    baselines=FISHEYE_BASELINES)
  d_deep, d_fish = np.asarray(d_deep), np.asarray(d_fish)
  # sine-law depth scales linearly with the baseline where unclipped
  unclipped = (d_deep > 0) & (d_deep < 1000) & (d_fish < 1000)
  assert unclipped.mean() > 0.5
  ratio = d_fish[unclipped] / d_deep[unclipped]
  np.testing.assert_allclose(
      ratio, FISHEYE_BASELINES["12"] / DEEP360_BASELINES["12"], rtol=1e-5)


def test_output_paths_by_components():
  depth_out, conf_out = output_paths(
      "/data/Deep360/ep1_500frames/training/disp/003000_12_disp.npz",
      "/data/Deep360", "/out/pred", "disp_pred2depth", "conf_map")
  assert depth_out == ("/out/pred/ep1_500frames/training/disp_pred2depth/"
                       "003000_12_disp_pred2depth.npz")
  assert conf_out == ("/out/pred/ep1_500frames/training/conf_map/"
                      "003000_12_conf_map.png")


def test_output_paths_datapath_containing_disp():
  # the reference's str.replace('disp', ...) corrupts this case
  depth_out, conf_out = output_paths(
      "/mnt/dispatch/deep360/ep2_500frames/testing/disp/000010_34_disp.npz",
      "/mnt/dispatch/deep360", "/mnt/dispatch/outputs",
      "disp_pred2depth_soiled", "conf_map_soiled")
  assert depth_out == ("/mnt/dispatch/outputs/ep2_500frames/testing/"
                       "disp_pred2depth_soiled/000010_34_disp_pred2depth.npz")
  assert conf_out == ("/mnt/dispatch/outputs/ep2_500frames/testing/"
                      "conf_map_soiled/000010_34_conf_map.png")
