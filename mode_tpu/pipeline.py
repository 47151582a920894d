"""Fused end-to-end two-stage inference pipeline.

The reference pipelines its two stages *through the filesystem*: stage 1
writes per-pair depth/confidence trees (``save_output_disparity_stage.py``)
that stage 2 reads back. On TPU the whole frame — 6 stereo pairs through the
disparity net, the disparity→depth bridge with its 6 per-pair SE(3)
re-projections, and the fusion net — compiles into ONE XLA program with zero
host round-trips. This is the benchmark path and the ``predict --stage all``
path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mode_tpu.geometry.reprojection import (
    DEEP360_BASELINES,
    DEEP360_PAIR_TRANSFORMS,
    cassini_disp_to_depth,
    depth_view_transform_with_conf,
)
from mode_tpu.geometry.projection import rotate_cassini
from mode_tpu.models.disparity import ModeDisparity
from mode_tpu.models.fusion import ModeFusion

CAM_PAIRS = ("12", "13", "14", "23", "24", "34")

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


from mode_tpu.training import cast_conv_params  # noqa: E402  (re-export)


def normalize_uint8(imgs: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
  """On-device ImageNet normalization of uint8 HWC images — the host sends
  4x fewer bytes than pre-normalized float32."""
  x = imgs.astype(jnp.float32) / 255.0
  x = (x - IMAGENET_MEAN) / IMAGENET_STD
  return x.astype(dtype)


def bridge_all_pairs(disps: jnp.ndarray, confs: jnp.ndarray
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Map 6 per-pair disparities+confidences to camera-1-frame depth maps.

  Args: ``disps``/``confs`` of shape (6, H, W), pair order 12..34.
  Returns: (6, H, W) depths and confidences at camera 1.
  (Parity: ``save_output_disparity_stage.py:105-160``.)
  """
  # The three "trans" pairs run separate z-buffer sorts ON PURPOSE: fusing
  # them into one offset-keyed sort is bit-exact but measured SLOWER on-chip
  # (32.1 vs 27.8 ms/frame — TPU sort cost scales with n·log²n, there is no
  # per-sort launch latency to amortize; scripts/bench_zbuffer.py,
  # docs/PROFILES.md round-4 note, depth_view_transforms_batched keeps the
  # measured form).
  out_d, out_c = [], []
  for k, pair in enumerate(CAM_PAIRS):
    depth_l = cassini_disp_to_depth(disps[k], DEEP360_BASELINES[pair])
    kind, params = DEEP360_PAIR_TRANSFORMS[pair]
    if kind == "identity":
      d, c = depth_l, confs[k]
    elif kind == "rot":
      both = jnp.stack([depth_l, confs[k]], axis=-1)[None]
      rot = rotate_cassini(both, *params)[0]
      d, c = rot[..., 0], rot[..., 1]
    else:
      y0, z0, x0, pitch, yaw, roll = params
      d, c = depth_view_transform_with_conf(depth_l, confs[k], y0, z0, x0,
                                            pitch, yaw, roll)
    out_d.append(d)
    out_c.append(c)
  return jnp.stack(out_d), jnp.stack(out_c)


class TwoStagePipeline:
  """Whole-frame 360° depth: 12 RGB inputs → fused depth map, one XLA program.

  Args:
    disp_variables / fusion_variables: flax variable trees.
    maxdisp / max_depth: model constants (192 / 1000 for Deep360).
    dtype: activation dtype for the disparity net (bfloat16 for speed).
  """

  def __init__(self, disp_variables: Any, fusion_variables: Any,
               maxdisp: int = 192, max_depth: float = 1000.0,
               dtype=jnp.float32, stage1_chunk: int = 6,
               uint8_inputs: bool = False, fusion_dtype=None):
    self.disp_model = ModeDisparity(maxdisp=maxdisp, out_conf=True)
    self.fusion_model = ModeFusion(max_depth=max_depth)
    if dtype == jnp.bfloat16:
      disp_variables = cast_conv_params(disp_variables, dtype)
    # fusion_dtype: activation/param dtype for the fusion net (default =
    # ``dtype``). The sigmoid x max_depth head stays f32 either way
    # (models/fusion.py); the bridge z-buffer always runs f32.
    self.fusion_dtype = fusion_dtype or dtype
    if self.fusion_dtype == jnp.bfloat16:
      fusion_variables = cast_conv_params(fusion_variables, jnp.bfloat16)
    self.disp_variables = disp_variables
    self.fusion_variables = fusion_variables
    self.dtype = dtype
    self.stage1_chunk = stage1_chunk
    self.uint8_inputs = uint8_inputs

    @jax.jit
    def run_frame(disp_vars, fusion_vars, lefts, rights, rgbs):
      # lefts/rights: (6, H, W, 3) pairs; rgbs: (4, H, W, 3). With
      # uint8_inputs, raw uint8 images normalized on-device.
      if self.uint8_inputs:
        lefts = normalize_uint8(lefts, self.dtype)
        rights = normalize_uint8(rights, self.dtype)
        rgbs = normalize_uint8(rgbs, jnp.float32)
      preds, confs = [], []
      for i in range(0, 6, self.stage1_chunk):
        p, c = self.disp_model.apply(
            disp_vars, lefts[i:i + self.stage1_chunk].astype(self.dtype),
            rights[i:i + self.stage1_chunk].astype(self.dtype), train=False)
        preds.append(p.astype(jnp.float32))
        confs.append(c.astype(jnp.float32))
      disp = jnp.concatenate(preds, 0)
      conf = jnp.concatenate(confs, 0)
      depths, confs1 = bridge_all_pairs(disp, conf)
      fdt = self.fusion_dtype
      out = self.fusion_model.apply(
          fusion_vars,
          [depths[k][None, :, :, None].astype(fdt) for k in range(6)],
          [confs1[k][None, :, :, None].astype(fdt) for k in range(6)],
          [rgbs[k][None].astype(fdt) for k in range(4)],
          train=False)
      return out[0, :, :, 0], disp, conf

    self._run = run_frame
    self._compiled = {}          # (shapes key) -> jax.stages.Compiled

  def _executable(self, args):
    """AOT-compile once per shape signature; the SAME executable then serves
    every frame AND cost_analysis (re-lowering the whole-frame graph costs
    minutes at this size)."""
    key = tuple((tuple(a.shape), jnp.asarray(a).dtype.name)
                for a in args[2:])
    if key not in self._compiled:
      self._compiled[key] = self._run.lower(*args).compile()
    return self._compiled[key]

  def __call__(self, lefts: np.ndarray, rights: np.ndarray,
               rgbs: np.ndarray):
    """Returns (fused_depth (H, W), disparities (6, H, W), confs (6, H, W))."""
    args = (self.disp_variables, self.fusion_variables,
            jnp.asarray(lefts), jnp.asarray(rights), jnp.asarray(rgbs))
    return self._executable(args)(*args)

  def cost_analysis_flops(self, h: int = 1024, w: int = 512):
    """Analytic model FLOPs of one frame, from XLA's cost analysis."""
    if self._compiled:
      compiled = next(iter(self._compiled.values()))
    else:
      in_dtype = jnp.uint8 if self.uint8_inputs else jnp.float32
      args = (self.disp_variables, self.fusion_variables,
              jax.ShapeDtypeStruct((6, h, w, 3), in_dtype),
              jax.ShapeDtypeStruct((6, h, w, 3), in_dtype),
              jax.ShapeDtypeStruct((4, h, w, 3), in_dtype))
      compiled = self._run.lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
      cost = cost[0]
    return float(cost["flops"])
