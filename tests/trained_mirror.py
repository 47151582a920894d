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


def _make_batch(rng: np.random.Generator, batch: int, disps=(4, 8, 12),
                h: int = H, w: int = W):
  """Random textures; right = left circularly shifted by d along W, gt = d.
  Disparities are multiples of 4 so they land exactly on the
  quarter-resolution cost levels (``ops/cost_volume.py``). The texture must
  carry detail AT the quarter-res feature scale (the cost volume matches
  quarter-res feature maps): half-res noise upsampled x2 decorrelates
  adjacent feature columns so the matching signal is unambiguous; the added
  coarse layer gives the net low-frequency context."""
  lefts, rights, gts = [], [], []
  for i in range(batch):
    d = int(disps[i % len(disps)])
    fine = rng.normal(size=(3, h // 2, w // 2)).astype(np.float32)
    coarse = rng.normal(size=(3, h // 8, w // 8)).astype(np.float32)
    up = lambda a: F.interpolate(torch.from_numpy(a)[None], size=(h, w),
                                 mode="bilinear", align_corners=False)[0]
    left = up(fine) + 0.5 * up(coarse)
    # cost level i pairs ref[w] with target[w-i] (ops/cost_volume.py), so
    # disparity d means the right view is the left rolled LEFT by d
    right = torch.roll(left, -d, dims=2)
    lefts.append(left)
    rights.append(right)
    gts.append(torch.full((h, w), float(d)))
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


# ---- mid-resolution operating point (512x256, maxdisp 48) -----------------
# The 64x32 pin above can't exercise the production dispatch shapes: every
# Pallas eligibility gate fails there (Cassini lanes = H < 128,
# ops/sphere_conv.py). 512x256 / maxdisp 48 is the smallest production-family
# shape (3D60's, mode_disparity.py:50) where the sphere-kernel gate is live
# (1/4-res lanes = 128); the full-res path-parity check at these same
# weights runs on-chip (scripts/tpu_kernel_check.py). Weights are fine-tuned
# FROM the 64x32 artifact for a few steps at the mid shape — enough to keep
# the softmax collapsed at 12 cost levels.

MID_MAXDISP, MID_H, MID_W = 48, 512, 256
# Fine-tune dynamics (measured): batch=1 with a cycling disparity level
# oscillates (each step pulls the cost-volume alignment toward a different
# level — loss still ~20 after 20 steps), and a literal batch=4 torch step
# is ~5 min on this 1-core box (cache thrash). Gradient ACCUMULATION over
# four single-level batches gives the same clean joint gradient at batch=1
# memory behavior (~100 s/step).
MID_STEPS = 48


def _artifact_path_mid() -> str:
  return os.path.join(_root(), "tests", "data", "trained_mirror_mid.npz")


def train_mirror_mid(steps: int = MID_STEPS, log_every: int = 0,
                     resume: bool = False):
  """Fine-tune the committed 64x32 weights at 512x256 / maxdisp 48.
  ``resume=True`` continues from an existing mid artifact instead (steps
  are slow on this box — ~110 s each — so convergence is incremental).
  Saves a checkpoint artifact every 8 steps."""
  from tests.torch_mirror import ModeDisparityT

  torch.manual_seed(11)
  model = ModeDisparityT(MID_MAXDISP, MID_H, MID_W, out_conf=False)
  model.load_state_dict(
      get_trained_state_dict_mid() if resume and
      os.path.exists(_artifact_path_mid()) else get_trained_state_dict(),
      strict=True)
  model.train()
  opt = torch.optim.Adam(model.parameters(), lr=2e-4)
  rng = np.random.default_rng(11)
  loss = None
  for step in range(steps):
    # every opt step accumulates all four levels (see MID_STEPS note):
    # batch=1 with disps=(8,20,36,44) would always draw disps[0] and
    # collapse the softmax onto d=8 (measured ~12 px off-task at d=20)
    opt.zero_grad()
    acc = 0.0
    for d in (8, 20, 36, 44):
      left, right, gt = _make_batch(rng, batch=1, disps=(d,),
                                    h=MID_H, w=MID_W)
      o1, o2, o3 = model(left, right)
      loss = (0.5 * F.smooth_l1_loss(o1, gt)
              + 0.7 * F.smooth_l1_loss(o2, gt)
              + F.smooth_l1_loss(o3, gt)) / 4.0
      loss.backward()
      acc += float(loss)
    opt.step()
    if log_every and step % log_every == 0:
      print(f"mid step {step}: loss {acc:.4f}", flush=True)
    if step % 8 == 7:
      _save_artifact(dict(model.state_dict()), _artifact_path_mid())
  return model, float(acc)


def get_trained_state_dict_mid():
  art = _artifact_path_mid()
  if not os.path.exists(art):
    raise FileNotFoundError(
        f"{art} missing — regenerate with `python -m tests.trained_mirror mid`")
  with np.load(art) as z:
    return {k: torch.from_numpy(np.asarray(z[k], dtype=np.float32)
                                if z[k].dtype == np.float16 else z[k])
            for k in z.files}


def load_trained_mirror_mid(maxdisp: int = MID_MAXDISP, h: int = MID_H,
                            w: int = MID_W, out_conf: bool = False):
  from tests.torch_mirror import ModeDisparityT
  model = ModeDisparityT(maxdisp, h, w, out_conf=out_conf)
  model.load_state_dict(get_trained_state_dict_mid(), strict=True)
  model.eval()
  return model


def _save_artifact(sd, path):
  out = {}
  for k, v in sd.items():
    a = v.numpy()
    out[k] = a.astype(np.float16) if a.dtype == np.float32 else a
  np.savez_compressed(path, **out)
  print("artifact:", path)


if __name__ == "__main__" and "mid" in os.sys.argv[1:]:
  model, loss = train_mirror_mid(log_every=2,
                                 resume="resume" in os.sys.argv[1:])
  print("mid final loss:", loss)
  _save_artifact(dict(model.state_dict()), _artifact_path_mid())
elif __name__ == "__main__":
  model, loss = train_mirror(log_every=20)
  print("final loss:", loss)
  path = _cache_path()
  os.makedirs(os.path.dirname(path), exist_ok=True)
  torch.save(dict(model.state_dict()), path)
  print("cached:", path)
  _save_artifact(dict(model.state_dict()), _artifact_path())
