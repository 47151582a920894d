#!/usr/bin/env python
"""Golden parity vs the RELEASED reference checkpoints, end to end.

Protocol (BASELINE.md north star: ≤1e-3 disparity-MAE delta vs the released
ModeDisparity / ModeFusion weights):

  1. obtain the released ``.tar`` checkpoints (Drive links at
     ``/root/reference/README.md:107-111``) — pass local paths, or this
     script downloads them when the environment has egress;
  2. load them through ``mode_tpu.utils.torch_convert`` into the JAX models;
  3. load the SAME weights into the torch mirrors (``tests/torch_mirror.py``
     — key-for-key reconstructions of the reference architectures that run
     on CPU, since the reference itself hard-requires CUDA);
  4. run both on identical inputs (random panoramas by default, or real
     Deep360 frames via --datapath) and report output MAE + the metric
     tables.

BLOCKER (documented once, here): the build environment has NO egress — the
Drive links are unreachable and no ``.tar`` exists on disk, so the numbers
cannot be materialized in-repo yet. Everything below is runnable the moment
a checkpoint file is available:

  python scripts/golden_parity.py --disp_ckpt ModeDisparity.tar \
      [--fusion_ckpt ModeFusion.tar] [--datapath .../Deep360] [--height 1024]

Prints one JSON line per comparison; exit 0 iff every MAE delta ≤ 1e-3.

NOTE: the ≤1e-3 gate is meaningful only with TRAINED weights. On random
weights the disparity softmax runs over 192 near-uniform logits and tiny
(legitimate) numeric differences produce multi-pixel output deltas — the
protocol smoke-test with a freshly initialized mirror therefore shows a
large disparity MAE by construction (fusion, which has no softmax, passes
at ~1e-5 even with random weights).
"""

import argparse
import json
import os
import sys
import urllib.request

DRIVE_IDS = {
    # /root/reference/README.md:107-111
    "ModeDisparity": "1ltQ4A-XoMNLXANt7sITYxD4Jx_TGBXiW",
    "ModeFusion": "1qGDD4kVx6KwVsxEqxfQu_BREVN9Ha2DC",
    "ModeFusion_soiled": "1hUzMTl61ODUr7Dg5u58AdtW0A9ZPGcKn",
}


def download(name: str, dest: str) -> str:
  url = ("https://drive.usercontent.google.com/download?export=download"
         f"&confirm=t&id={DRIVE_IDS[name]}")
  path = os.path.join(dest, f"{name}.tar")
  if not os.path.exists(path):
    print(f"downloading {name} ...", file=sys.stderr)
    urllib.request.urlretrieve(url, path)
  return path


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--disp_ckpt", default=None,
                 help=".tar checkpoint (downloads if omitted and egress "
                      "exists)")
  p.add_argument("--fusion_ckpt", default=None)
  p.add_argument("--datapath", default=None,
                 help="Deep360 root for real-frame comparison; random "
                      "panoramas otherwise")
  p.add_argument("--height", type=int, default=1024)
  p.add_argument("--width", type=int, default=512)
  p.add_argument("--max_disp", type=int, default=192)
  p.add_argument("--download_dir", default="/tmp/mode_ckpts")
  p.add_argument("--n_frames", type=int, default=2)
  args = p.parse_args(argv)

  import numpy as np
  import torch

  import jax
  import jax.numpy as jnp

  sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__)))))
  from tests.torch_mirror import ModeDisparityT, ModeFusionT
  from mode_tpu.models.disparity import ModeDisparity
  from mode_tpu.models.fusion import ModeFusion
  from mode_tpu.utils.torch_convert import (
      convert_state_dict,
      strip_module_prefix,
      unwrap_checkpoint,
  )

  if args.disp_ckpt is None:
    os.makedirs(args.download_dir, exist_ok=True)
    try:
      args.disp_ckpt = download("ModeDisparity", args.download_dir)
    except Exception as e:
      print(json.dumps({"blocked": f"no egress and no --disp_ckpt: {e}"}))
      return 2

  h, w = args.height, args.width
  ok = True

  # ---- stage 1: released ModeDisparity weights ---------------------------
  raw = torch.load(args.disp_ckpt, map_location="cpu", weights_only=False)
  state = strip_module_prefix(unwrap_checkpoint(raw))

  tmodel = ModeDisparityT(args.max_disp, h, w, "Cassini", out_conf=True)
  tmodel.load_state_dict(state)
  tmodel.eval()

  jmodel = ModeDisparity(maxdisp=args.max_disp, conv="Sphere",
                         sphere_type="Cassini", out_conf=True)
  dummy = np.zeros((1, h, w, 3), np.float32)
  variables = jmodel.init(jax.random.PRNGKey(0), dummy, dummy, train=False)
  variables = convert_state_dict(state, variables)
  fwd = jax.jit(lambda v, l, r: jmodel.apply(v, l, r, train=False))

  rng = np.random.default_rng(0)
  if args.datapath:
    from mode_tpu.data.deep360 import Deep360DatasetDisparity
    from mode_tpu.data.file_lists import list_deep360_disparity_test
    left, right, disp = list_deep360_disparity_test(args.datapath, False)
    ds = Deep360DatasetDisparity(left[:args.n_frames],
                                 right[:args.n_frames],
                                 disp[:args.n_frames], shape=(h, w))
    frames = [(ds[i]["leftImg"], ds[i]["rightImg"])
              for i in range(min(args.n_frames, len(ds)))]
  else:
    frames = [(rng.normal(size=(h, w, 3)).astype(np.float32),
               rng.normal(size=(h, w, 3)).astype(np.float32))
              for _ in range(args.n_frames)]

  for i, (l, r) in enumerate(frames):
    with torch.no_grad():
      tl = torch.from_numpy(l.transpose(2, 0, 1))[None]
      tr = torch.from_numpy(r.transpose(2, 0, 1))[None]
      tdisp, tconf = tmodel(tl, tr)
    jdisp, jconf = fwd(variables, jnp.asarray(l[None]), jnp.asarray(r[None]))
    mae = float(np.abs(np.asarray(jdisp) - tdisp.numpy()[:, 0]).mean())
    cmae = float(np.abs(np.asarray(jconf) - tconf.numpy()[:, 0]).mean())
    rec = {"check": f"disparity_frame{i}", "mae_px": mae, "conf_mae": cmae,
           "pass": mae <= 1e-3}
    ok = ok and rec["pass"]
    print(json.dumps(rec), flush=True)

  # ---- stage 2: released ModeFusion weights ------------------------------
  if args.fusion_ckpt:
    raw = torch.load(args.fusion_ckpt, map_location="cpu",
                     weights_only=False)
    fstate = strip_module_prefix(unwrap_checkpoint(raw))
    tfus = ModeFusionT(1000.0, [32, 64, 128, 256],
                       {"depth": 12, "rgb": 12})
    tfus.load_state_dict(fstate)
    tfus.eval()

    jfus = ModeFusion(max_depth=1000.0)
    z1 = [np.zeros((1, h, w, 1), np.float32)] * 6
    z3 = [np.zeros((1, h, w, 3), np.float32)] * 4
    fvars = jfus.init(jax.random.PRNGKey(1), z1, z1, z3, train=False)
    fvars = convert_state_dict(fstate, fvars)

    depths = rng.uniform(0, 1000, size=(6, h, w)).astype(np.float32)
    confs = rng.uniform(0, 1, size=(6, h, w)).astype(np.float32)
    rgbs = rng.normal(size=(4, h, w, 3)).astype(np.float32)
    with torch.no_grad():
      tout = tfus([torch.from_numpy(depths[k][None, None]) for k in range(6)],
                  [torch.from_numpy(confs[k][None, None]) for k in range(6)],
                  [torch.from_numpy(rgbs[k].transpose(2, 0, 1)[None])
                   for k in range(4)]).numpy()[0, 0]
    jout = jax.jit(lambda v, d, c, g: jfus.apply(v, d, c, g, train=False))(
        fvars, [depths[k][None, :, :, None] for k in range(6)],
        [confs[k][None, :, :, None] for k in range(6)],
        [rgbs[k][None] for k in range(4)])
    mae = float(np.abs(np.asarray(jout)[0, :, :, 0] - tout).mean())
    rec = {"check": "fusion_depth", "mae_m": mae, "pass": mae <= 1e-3}
    ok = ok and rec["pass"]
    print(json.dumps(rec), flush=True)

  print(json.dumps({"ok": ok}))
  return 0 if ok else 1


if __name__ == "__main__":
  sys.exit(main())
