"""Spherical-projection geometry for 360° multi-view depth.

Pure-JAX, jit-able replacements for the reference's torch/numpy/numba
geometry library (``/root/reference/utils/geometry.py``) and the
disparity→depth bridge (``/root/reference/save_output_disparity_stage.py``).
"""

from mode_tpu.geometry.projection import (
    cassini_to_erp,
    erp_to_rect_cassini,
    rotate_cassini,
    rotation_matrix,
    rodrigues,
)
from mode_tpu.geometry.reprojection import (
    cassini_disp_to_depth,
    depth_view_transform_with_conf,
    depth_to_cassini_disp,
)

__all__ = [
    "cassini_to_erp",
    "erp_to_rect_cassini",
    "rotate_cassini",
    "rotation_matrix",
    "rodrigues",
    "cassini_disp_to_depth",
    "depth_view_transform_with_conf",
    "depth_to_cassini_disp",
]
