"""Bilinear / nearest 2-D resampling with PyTorch ``grid_sample`` semantics.

The reference relies on ``torch.nn.functional.grid_sample`` for every
projection-domain change (``/root/reference/utils/geometry.py:38,88,194``) and
for the confidence-map probe (``/root/reference/models/mode_disparity.py:168``).
XLA has no built-in equivalent, so we implement it once here with exact
semantics and reuse it everywhere.

Conventions (matching torch, ``align_corners=True``):
  - ``grid[..., 0]`` is x and samples the *width* (last spatial) axis,
    ``grid[..., 1]`` is y and samples the *height* axis;
  - normalized coordinate ``v in [-1, 1]`` maps to pixel ``(v + 1) / 2 * (n - 1)``;
  - ``padding_mode='border'`` clamps pixel coordinates into ``[0, n - 1]``;
  - ``padding_mode='zeros'`` lets out-of-range corners contribute 0.

Images here are channel-minor ``(..., H, W, C)`` (TPU-native layout), unlike
torch's NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_hw(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
  """Gather pixels from ``img (H, W, C)`` at integer index maps ``iy/ix (*S)``.

  Returns ``(*S, C)``. Indices must already be in-range.
  """
  h, w, _ = img.shape
  flat = img.reshape(h * w, -1)
  idx = iy * w + ix
  return jnp.take(flat, idx.reshape(-1), axis=0).reshape(*iy.shape, img.shape[-1])


def sample_bilinear(img: jnp.ndarray,
                    y: jnp.ndarray,
                    x: jnp.ndarray,
                    padding_mode: str = "border") -> jnp.ndarray:
  """Bilinearly sample ``img (H, W, C)`` at fractional pixel coords ``y, x``.

  ``y``/``x`` are float arrays of any (matching) shape, in pixel units.
  Returns an array of shape ``y.shape + (C,)``.
  """
  h, w, _ = img.shape
  y = y.astype(jnp.float32)
  x = x.astype(jnp.float32)

  if padding_mode == "border":
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)

  y0 = jnp.floor(y)
  x0 = jnp.floor(x)
  wy = y - y0
  wx = x - x0
  y0i = y0.astype(jnp.int32)
  x0i = x0.astype(jnp.int32)
  y1i = y0i + 1
  x1i = x0i + 1

  if padding_mode == "zeros":
    def corner(iy, ix):
      valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
      v = _gather_hw(img, jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1))
      return jnp.where(valid[..., None], v, 0.0)

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x1i)
    v10 = corner(y1i, x0i)
    v11 = corner(y1i, x1i)
  else:
    # ONE gather of edge-padded 2x2 patches instead of four corner gathers:
    # a TPU gather moves whole (lane-dim) rows per index, so a (HW, 4C) row
    # costs about what a (HW, C) row does — ~4x fewer gather rows total.
    c = img.shape[-1]
    imgp = jnp.pad(img, ((0, 1), (0, 1), (0, 0)), mode="edge")
    patches = jnp.concatenate(
        [imgp[:-1, :-1], imgp[:-1, 1:], imgp[1:, :-1], imgp[1:, 1:]],
        axis=-1).reshape(h * w, 4 * c)
    y0c = jnp.clip(y0i, 0, h - 1)
    x0c = jnp.clip(x0i, 0, w - 1)
    v = jnp.take(patches, (y0c * w + x0c).reshape(-1), axis=0)
    v = v.reshape(*y0i.shape, 4, c)
    v00, v01, v10, v11 = v[..., 0, :], v[..., 1, :], v[..., 2, :], v[..., 3, :]

  wy = wy[..., None]
  wx = wx[..., None]
  top = v00 * (1.0 - wx) + v01 * wx
  bot = v10 * (1.0 - wx) + v11 * wx
  return top * (1.0 - wy) + bot * wy


def sample_nearest(img: jnp.ndarray,
                   y: jnp.ndarray,
                   x: jnp.ndarray,
                   padding_mode: str = "border") -> jnp.ndarray:
  """Nearest-neighbour sampling, torch ``mode='nearest'`` semantics:
  torch rounds with ``std::nearbyint`` (half-to-even), which ``jnp.round``
  matches exactly."""
  h, w, _ = img.shape
  if padding_mode == "border":
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
  iy = jnp.round(y).astype(jnp.int32)
  ix = jnp.round(x).astype(jnp.int32)
  if padding_mode == "zeros":
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    v = _gather_hw(img, jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1))
    return jnp.where(valid[..., None], v, 0.0)
  return _gather_hw(img, jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1))


def grid_sample(img: jnp.ndarray,
                grid: jnp.ndarray,
                mode: str = "bilinear",
                padding_mode: str = "border",
                align_corners: bool = True) -> jnp.ndarray:
  """Torch-compatible grid_sample for a batch.

  Args:
    img: ``(B, H, W, C)`` source image (channel-minor).
    grid: ``(B, Ho, Wo, 2)`` normalized sampling grid; last dim is (x, y)
      in ``[-1, 1]``.
  Returns:
    ``(B, Ho, Wo, C)`` resampled image.
  """
  if not align_corners:
    raise NotImplementedError("only align_corners=True is used by MODE")
  _, h, w, _ = img.shape
  x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
  y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
  fn = sample_bilinear if mode == "bilinear" else sample_nearest
  return jax.vmap(lambda im, yy, xx: fn(im, yy, xx, padding_mode))(img, y, x)
