#!/usr/bin/env python
"""A/B the SCOPED stride-1 custom-VJP training conv on the full train step.

Round 3 measured the all-shapes stride-1 Pallas train path LOSING (0.56 vs
0.51 s at B=1): per-call lane transposes + lost BN/ReLU fusion outweigh the
GEMM win at the small hourglass levels. But the full-volume stride-1 convs
(dres0/dres1 + classif heads, (B, 48, 256, 128, 32|64)) run XLA's
differentiated dfold at ~7-12 TF/s vs the band kernel's ~30, so a
voxel-count-scoped enable (set_conv3d_train_scope) may win where the global
one lost. Runs the exact bench.py configuration (full-res bf16 + remat)
with three scopes x B in {1, 2}; one JSON line per case.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_s1.py [B ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FULL_VOL = 48 * 256 * 128          # dres / classif level
EIGHTH_VOL = 24 * 128 * 64         # hourglass 1/8 level


def measure(jax, jnp, b, pallas_s1, min_voxels):
  from mode_tpu import training
  from mode_tpu.models.disparity import ModeDisparity
  from mode_tpu.ops.pallas import conv3d_kernel as ck

  prev = (ck._TRAIN_PALLAS, ck._TRAIN_PALLAS_MIN_VOXELS,
          ck._TRAIN_PALLAS_MIN_BATCH)
  ck.set_conv3d_train_pallas(pallas_s1)
  ck.set_conv3d_train_scope(min_voxels)
  ck.set_conv3d_train_min_batch(0)     # the A/B sweeps B itself
  try:
    h, w = 1024, 512
    model = ModeDisparity(maxdisp=192, conv="Sphere", sphere_type="Cassini",
                          out_conf=False, remat=True)
    optimizer = training.make_optimizer()
    dummy = np.zeros((b, h, w, 3), np.float32)
    state = training.init_state(model, optimizer, jax.random.PRNGKey(0),
                                dummy, dummy, train=False)
    step = training.make_disparity_train_step(model, optimizer, mesh=None,
                                              compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    batch = [jax.device_put(x) for x in (
        rng.normal(size=(b, h, w, 3)).astype(np.float32),
        rng.normal(size=(b, h, w, 3)).astype(np.float32),
        rng.uniform(1.0, 100.0, size=(b, h, w)).astype(np.float32))]
    state, loss = step(state, *batch)
    l0 = float(loss)
    times = []
    for _i in range(3):
      t0 = time.time()
      state, loss = step(state, *batch)
      _ = float(loss)
      times.append(time.time() - t0)
    return float(np.median(times)), l0
  finally:
    ck.set_conv3d_train_pallas(prev[0])
    ck.set_conv3d_train_scope(prev[1])
    ck.set_conv3d_train_min_batch(prev[2])


def main():
  import jax
  import jax.numpy as jnp
  cache = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), ".jax_cache")
  try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
  except Exception:
    pass

  batches = [int(s) for s in (sys.argv[1:] or ["2", "1"])]
  cases = (("s1_off", False, 0),
           ("s1_full_volume", True, FULL_VOL),
           ("s1_incl_eighth", True, EIGHTH_VOL),
           ("s1_all", True, 0))
  for b in batches:
    for name, on, mv in cases:
      try:
        t, l0 = measure(jax, jnp, b, on, mv)
        print(json.dumps({"b": b, "case": name, "step_s": round(t, 4),
                          "ms_per_example": round(t / b * 1e3, 1),
                          "loss0": round(l0, 4)}), flush=True)
      except Exception as e:  # noqa: BLE001 — OOM at large B is expected
        print(json.dumps({"b": b, "case": name,
                          "error": repr(e)[:160]}), flush=True)


if __name__ == "__main__":
  main()
