"""4-D stereo cost-volume construction.

The reference materializes the volume by in-place slice assignment into a
zero tensor (``/root/reference/models/mode_disparity.py:104-113``):
``cost[:, :C, i, :, i:] = ref[..., i:]`` / ``cost[:, C:, i, :, i:] =
target[..., :-i]``. On TPU that becomes a functional stack of masked/shifted
concatenations which XLA fuses — no scatter, no in-place aliasing.
"""

from __future__ import annotations

import jax.numpy as jnp


def build_cost_volume(ref: jnp.ndarray, target: jnp.ndarray,
                      num_disp: int) -> jnp.ndarray:
  """Concat-shift cost volume.

  Args:
    ref/target: ``(B, H, W, C)`` left/right feature maps (the disparity axis
      shifts along W — Cassini panoramas are vertically-stacked stereo, and
      in the reference's NCHW the shifted axis is the last one, W).
    num_disp: number of disparity levels (maxdisp // 4).
  Returns:
    ``(B, D, H, W, 2C)`` NDHWC cost volume; level ``i`` holds ``ref`` and
    ``target`` shifted right by ``i`` pixels, zero-filled for ``w < i``.
  """
  b, h, w, c = ref.shape
  cols = jnp.arange(w)

  levels = []
  for i in range(num_disp):
    if i == 0:
      levels.append(jnp.concatenate([ref, target], axis=-1))
      continue
    mask = (cols >= i)[None, None, :, None].astype(ref.dtype)
    shifted = jnp.pad(target, ((0, 0), (0, 0), (i, 0), (0, 0)))[:, :, :w, :]
    levels.append(jnp.concatenate([ref * mask, shifted], axis=-1))
  return jnp.stack(levels, axis=1)
