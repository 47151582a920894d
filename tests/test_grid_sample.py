"""Golden tests: mode_tpu.ops.grid_sample vs torch.nn.functional.grid_sample."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mode_tpu.ops.grid_sample import grid_sample


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_grid_sample_matches_torch(rng, mode, padding_mode):
  b, h, w, c = 2, 9, 13, 3
  ho, wo = 7, 11
  img = rng.normal(size=(b, h, w, c)).astype(np.float32)
  # grid beyond [-1, 1] to exercise padding behaviour
  grid = rng.uniform(-1.4, 1.4, size=(b, ho, wo, 2)).astype(np.float32)

  ours = np.asarray(grid_sample(img, grid, mode=mode,
                                padding_mode=padding_mode))

  t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
  t_grid = torch.from_numpy(grid)
  ref = F.grid_sample(t_img, t_grid, mode=mode, padding_mode=padding_mode,
                      align_corners=True)
  ref = ref.permute(0, 2, 3, 1).numpy()
  np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_exact_integer_coords(rng):
  # sampling exactly at pixel centers must reproduce the image
  b, h, w, c = 1, 6, 8, 2
  img = rng.normal(size=(b, h, w, c)).astype(np.float32)
  ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
  gx = xs / (w - 1) * 2 - 1
  gy = ys / (h - 1) * 2 - 1
  grid = np.stack([gx, gy], -1)[None].astype(np.float32)
  out = np.asarray(grid_sample(img, grid))
  np.testing.assert_allclose(out, img, rtol=1e-6, atol=1e-6)
