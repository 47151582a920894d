"""Model zoo: stage-1 disparity estimation and stage-2 fusion."""

from mode_tpu.models.disparity import ModeDisparity, set_fused_regression
from mode_tpu.models.fusion import Baseline, ModeFusion
from mode_tpu.models.initialize import init_model_params

__all__ = ["ModeDisparity", "ModeFusion", "Baseline", "init_model_params",
           "set_fused_regression"]
