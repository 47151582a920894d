"""TPU-native operators: spherical convolution, resampling, cost volume,
interpolation, and the Pallas fast-path kernels."""

from mode_tpu.ops.cost_volume import build_cost_volume
from mode_tpu.ops.grid_sample import grid_sample, sample_bilinear, \
    sample_nearest
from mode_tpu.ops.resize import (
    interpolate,
    upsample_bicubic,
    upsample_bilinear,
    upsample_trilinear,
)
from mode_tpu.ops.sphere_conv import (
    gen_sphere_positions,
    set_pallas_mode,
    sphere_conv,
    sphere_conv_xla,
)

__all__ = [
    "build_cost_volume", "grid_sample", "sample_bilinear", "sample_nearest",
    "interpolate", "upsample_bicubic", "upsample_bilinear",
    "upsample_trilinear", "gen_sphere_positions", "set_pallas_mode",
    "sphere_conv", "sphere_conv_xla",
]
