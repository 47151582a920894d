#!/usr/bin/env python
"""A/B the folded-lane custom-VJP training conv (conv4's 1/16 level).

Runs the full-res stage-1 train step (the exact bench.py configuration)
with ``set_conv3d_train_fold`` off vs on, at B in {1, 2} (+3 if it fits),
and prints one JSON line per case. The fold path ships enabled only if it
wins here (the full-lane train Pallas path lost its A/B — 0.56 vs 0.51 s —
so evidence first; see docs/PROFILES.md).
"""

import json
import sys
import time

import numpy as np


def measure(jax, jnp, b, fold, strided=False):
  from mode_tpu import training
  from mode_tpu.models.disparity import ModeDisparity
  from mode_tpu.ops.pallas.conv3d_kernel import (set_conv3d_train_fold,
                                                 set_conv3d_train_strided)

  from mode_tpu.ops.pallas import conv3d_kernel as ck
  prev = (ck._TRAIN_FOLD, ck._TRAIN_STRIDED)
  set_conv3d_train_fold(fold)
  set_conv3d_train_strided(strided)
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
    _ = float(loss)
    times = []
    for _i in range(3):
      t0 = time.time()
      state, loss = step(state, *batch)
      _ = float(loss)
      times.append(time.time() - t0)
    return float(np.median(times))
  finally:
    set_conv3d_train_fold(prev[0])
    set_conv3d_train_strided(prev[1])


def main():
  import jax
  import jax.numpy as jnp
  import os
  cache = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), ".jax_cache")
  try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
  except Exception:
    pass

  batches = [int(s) for s in (sys.argv[1:] or ["1", "2"])]
  for b in batches:
    for fold, strided in ((False, False), (True, False), (False, True),
                          (True, True)):
      try:
        t = measure(jax, jnp, b, fold, strided)
        print(json.dumps({"b": b, "train_fold": fold,
                          "train_strided": strided, "step_s": round(t, 4),
                          "ms_per_example": round(t / b * 1e3, 1)}),
              flush=True)
      except Exception as e:  # noqa: BLE001 — OOM at large B is expected
        print(json.dumps({"b": b, "train_fold": fold,
                          "train_strided": strided,
                          "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
  main()
