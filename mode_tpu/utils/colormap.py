"""Visualization helpers: JET colormapping + log-scaled depth/disparity PNGs.

Replaces the reference's ``cv2.applyColorMap(..., cv2.COLORMAP_JET)`` dumps
(``/root/reference/test_disparity.py:82-117``, ``test_fusion.py:139-156``,
``train_disparity.py:112-131``) with a numpy implementation (BGR byte order
kept so outputs are comparable with the reference's files).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def jet_colormap(gray: np.ndarray) -> np.ndarray:
  """uint8 (H, W) → uint8 (H, W, 3) RGB, OpenCV-JET style ramp."""
  x = gray.astype(np.float32) / 255.0

  def ramp(v):
    return np.clip(np.minimum(4 * v, -4 * v + 4.0), 0, 1)

  r = ramp(x - 0.25)
  g = ramp(x)
  b = ramp(x + 0.25)
  return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def normalize_to_u8(img: np.ndarray) -> np.ndarray:
  lo, hi = np.min(img), np.max(img)
  scale = (hi - lo) if hi > lo else 1.0
  return ((img - lo) / scale * 255).astype(np.uint8)


def save_colormapped(path: str, value: np.ndarray, mask=None,
                     log_scale: bool = True):
  """Log-normalize, JET-map, zero masked-out pixels, write a PNG
  (test_disparity.py:82-117 semantics)."""
  v = value.astype(np.float32).copy()
  if log_scale:
    v = np.log10(np.maximum(v, 0) + 1.0)
  if mask is not None:
    v[~mask] = 0
  u8 = normalize_to_u8(v)
  rgb = jet_colormap(u8)
  if mask is not None:
    rgb[~mask] = 0
  Image.fromarray(rgb).save(path)


def save_gray_png(path: str, value01: np.ndarray):
  """Save a [0,1] map as 8-bit grayscale (confidence maps,
  save_output_disparity_stage.py:199)."""
  Image.fromarray((np.clip(value01, 0, 1) * 255).astype(np.uint8)).save(path)
