"""Separable interpolation (linear / cubic) with torch ``F.interpolate``
semantics, as dense matrix contractions.

The reference upsamples the 5-D cost volume trilinearly with
``align_corners=True`` (``/root/reference/models/mode_disparity.py:132-143``),
the PSMNet SPP branches bilinearly (``submodule.py:254-263``) and the
half-res fusion output bicubically (``test_fusion.py:81-82``). XLA has no
interpolate op; on TPU the natural formulation is a per-axis contraction with
a static (out, in) interpolation matrix — each axis becomes one MXU matmul
and the matrices are constant-folded.

All matrices are built in float64 numpy and cast, so coefficients match
torch's to float32 round-off.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def linear_matrix(n_out: int, n_in: int, align_corners: bool = True) -> np.ndarray:
  """(n_out, n_in) linear-interpolation matrix."""
  m = np.zeros((n_out, n_in), np.float64)
  if n_in == 1:
    m[:, 0] = 1.0
    return m.astype(np.float32)
  o = np.arange(n_out, dtype=np.float64)
  if align_corners:
    src = o * (n_in - 1) / max(n_out - 1, 1)
  else:
    src = np.clip((o + 0.5) * n_in / n_out - 0.5, 0, n_in - 1)
  i0 = np.floor(src).astype(np.int64)
  i0 = np.clip(i0, 0, n_in - 2)
  frac = src - i0
  m[np.arange(n_out), i0] += 1.0 - frac
  m[np.arange(n_out), i0 + 1] += frac
  return m.astype(np.float32)


def _cubic_weight(t: np.ndarray, a: float = -0.75) -> np.ndarray:
  """Cubic convolution kernel (torch/cv2 use a = -0.75)."""
  t = np.abs(t)
  w = np.where(t <= 1,
               (a + 2) * t**3 - (a + 3) * t**2 + 1,
               np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a,
                        0.0))
  return w


@functools.lru_cache(maxsize=32)
def cubic_matrix(n_out: int, n_in: int, align_corners: bool = True) -> np.ndarray:
  """(n_out, n_in) bicubic interpolation matrix (border-replicate taps)."""
  m = np.zeros((n_out, n_in), np.float64)
  if n_in == 1:
    m[:, 0] = 1.0
    return m.astype(np.float32)
  o = np.arange(n_out, dtype=np.float64)
  if align_corners:
    src = o * (n_in - 1) / max(n_out - 1, 1)
  else:
    src = (o + 0.5) * n_in / n_out - 0.5
  i0 = np.floor(src).astype(np.int64)
  frac = src - i0
  for k in range(-1, 3):
    w = _cubic_weight(k - frac)
    idx = np.clip(i0 + k, 0, n_in - 1)
    np.add.at(m, (np.arange(n_out), idx), w)
  return m.astype(np.float32)


def _apply_axis(x: jnp.ndarray, mat: np.ndarray, axis: int) -> jnp.ndarray:
  """Contract interpolation matrix into one axis of ``x``."""
  m = jnp.asarray(mat, x.dtype)
  x = jnp.moveaxis(x, axis, -1)
  y = jnp.einsum("...i,oi->...o", x, m, preferred_element_type=jnp.float32,
                 ).astype(x.dtype)
  return jnp.moveaxis(y, -1, axis)


def interpolate(x: jnp.ndarray, sizes: dict[int, int], mode: str = "linear",
                align_corners: bool = True) -> jnp.ndarray:
  """Resize the axes of ``x`` given by ``sizes`` (axis -> new length).

  ``mode='linear'`` covers torch's linear/bilinear/trilinear (separable);
  ``mode='cubic'`` covers bicubic.
  """
  builder = linear_matrix if mode == "linear" else cubic_matrix
  for axis, n_out in sizes.items():
    n_in = x.shape[axis]
    if n_in == n_out:
      continue
    x = _apply_axis(x, builder(n_out, n_in, align_corners), axis)
  return x


def upsample_trilinear(x: jnp.ndarray, d: int, h: int, w: int) -> jnp.ndarray:
  """NDHWC trilinear resize, align_corners=True (parity:
  ``F.upsample(..., mode='trilinear', align_corners=True)``)."""
  return interpolate(x, {1: d, 2: h, 3: w}, "linear", True)


def upsample_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
  """NHWC bilinear resize, align_corners=True."""
  return interpolate(x, {1: h, 2: w}, "linear", True)


def upsample_bicubic(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
  """NHWC bicubic resize, align_corners=True (parity:
  ``F.interpolate(..., mode='bicubic', align_corners=True)``)."""
  return interpolate(x, {1: h, 2: w}, "cubic", True)
