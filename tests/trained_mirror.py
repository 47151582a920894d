"""Trained-ish mirror weights for end-to-end parity/drift gates.

Random-weight ModeDisparity outputs are softmax-chaotic (the soft-argmin
regresses over 16-192 near-uniform probabilities, so f32 reduction-order
noise swings the prediction by pixels) — useless for pinning end-to-end
parity. Training the torch mirror a few hundred steps on a synthetic
stereo task collapses the softmax onto a stable operating point and makes
the stage-1 output a meaningful end-to-end pin (JAX-vs-mirror MAE ~1e-6 at
these weights vs whole pixels at random init). The parameter tree is
input-shape-independent (the sphere-conv sampling tables are buffers, not
parameters), so weights trained at 64x32 also drive the full 1024x512
production pipeline in the bf16-drift gate (``scripts/tpu_kernel_check.py``).

The trained weights are committed as ``tests/data/trained_mirror.npz``
(float16, ~10 MB) so the suite never retrains; regenerate with
``python -m tests.trained_mirror`` (~7 min CPU, deterministic torch seeds).
"""

from __future__ import annotations

import os

import numpy as np
import torch
import torch.nn.functional as F

CACHE_VERSION = 2
MAXDISP, H, W = 16, 64, 32
STEPS = 400


def _root() -> str:
  return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cache_path() -> str:
  return os.path.join(_root(), ".cache",
                      f"trained_mirror_v{CACHE_VERSION}.pt")


def _artifact_path() -> str:
  return os.path.join(_root(), "tests", "data", "trained_mirror.npz")


def _make_batch(rng: np.random.Generator, batch: int, disps=(4, 8, 12)):
  """Random textures; right = left circularly shifted by d along W, gt = d.
  Disparities are multiples of 4 so they land exactly on the
  quarter-resolution cost levels (``ops/cost_volume.py``). The texture must
  carry detail AT the quarter-res feature scale (the cost volume matches
  16x8 feature maps): half-res noise upsampled x2 decorrelates adjacent
  feature columns so the matching signal is unambiguous; the added coarse
  layer gives the net low-frequency context."""
  lefts, rights, gts = [], [], []
  for i in range(batch):
    d = int(disps[i % len(disps)])
    fine = rng.normal(size=(3, H // 2, W // 2)).astype(np.float32)
    coarse = rng.normal(size=(3, H // 8, W // 8)).astype(np.float32)
    up = lambda a: F.interpolate(torch.from_numpy(a)[None], size=(H, W),
                                 mode="bilinear", align_corners=False)[0]
    left = up(fine) + 0.5 * up(coarse)
    # cost level i pairs ref[w] with target[w-i] (ops/cost_volume.py), so
    # disparity d means the right view is the left rolled LEFT by d
    right = torch.roll(left, -d, dims=2)
    lefts.append(left)
    rights.append(right)
    gts.append(torch.full((H, W), float(d)))
  return (torch.stack(lefts), torch.stack(rights), torch.stack(gts))


def train_mirror(steps: int = STEPS, log_every: int = 0):
  """Train the torch mirror on the synthetic stereo task; returns
  (model, final_loss)."""
  from tests.torch_mirror import ModeDisparityT

  torch.manual_seed(7)
  model = ModeDisparityT(MAXDISP, H, W, out_conf=False)
  model.train()
  opt = torch.optim.Adam(model.parameters(), lr=1e-3)
  rng = np.random.default_rng(7)
  loss = None
  for step in range(steps):
    left, right, gt = _make_batch(rng, batch=3)
    o1, o2, o3 = model(left, right)
    loss = (0.5 * F.smooth_l1_loss(o1, gt) + 0.7 * F.smooth_l1_loss(o2, gt)
            + F.smooth_l1_loss(o3, gt))
    opt.zero_grad()
    loss.backward()
    opt.step()
    if log_every and step % log_every == 0:
      print(f"step {step}: loss {float(loss):.4f}", flush=True)
  return model, float(loss)


def get_trained_state_dict():
  """Trained-ish mirror state_dict (CPU f32 tensors). Loads the committed
  float16 artifact when present; otherwise trains (and caches) locally."""
  art = _artifact_path()
  if os.path.exists(art):
    with np.load(art) as z:
      return {k: torch.from_numpy(np.asarray(z[k], dtype=np.float32)
                                  if z[k].dtype == np.float16 else z[k])
              for k in z.files}
  path = _cache_path()
  if os.path.exists(path):
    return torch.load(path, map_location="cpu", weights_only=True)
  model, _ = train_mirror()
  os.makedirs(os.path.dirname(path), exist_ok=True)
  sd = {k: v for k, v in model.state_dict().items()}
  torch.save(sd, path)
  return sd


def load_trained_mirror(maxdisp: int = MAXDISP, h: int = H, w: int = W,
                        out_conf: bool = False):
  """A mirror model (at any panorama size) loaded with the trained-ish
  weights — the sampling tables rebuild for (h, w), the params transfer."""
  from tests.torch_mirror import ModeDisparityT
  model = ModeDisparityT(maxdisp, h, w, out_conf=out_conf)
  model.load_state_dict(get_trained_state_dict(), strict=True)
  model.eval()
  return model


if __name__ == "__main__":
  model, loss = train_mirror(log_every=20)
  print("final loss:", loss)
  path = _cache_path()
  os.makedirs(os.path.dirname(path), exist_ok=True)
  torch.save(dict(model.state_dict()), path)
  print("cached:", path)
  sd = model.state_dict()
  out = {}
  for k, v in sd.items():
    a = v.numpy()
    out[k] = a.astype(np.float16) if a.dtype == np.float32 else a
  np.savez_compressed(_artifact_path(), **out)
  print("artifact:", _artifact_path())
