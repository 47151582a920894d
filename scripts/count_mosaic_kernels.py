#!/usr/bin/env python
"""Compile-time diagnosis: count Pallas/Mosaic custom calls in the big
programs and how many are UNIQUE payloads.

VERDICT r4: the fused pipeline's cold "compile" grew 47 s (r2) → ~3 min
(r3) → 14-20 min (r4/r5). The instrumented bench (bench.py phase marks)
splits lower / XLA-compile / first-execution; this script answers the
complementary static question: how many Mosaic kernel compilations does
each program ask for, and how many would a payload-hash cache dedupe?

Lowering is client-side (no TPU execution), but it IS host-CPU-heavy
(minutes for the pipeline) — don't run concurrently with another compile.

Usage: python scripts/count_mosaic_kernels.py [pipeline|train|eval] ...
"""

import collections
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(name, lowered):
  text = lowered.as_text()
  # StableHLO: Mosaic kernels appear as stablehlo.custom_call @tpu_custom_call
  # with a serialized payload in backend_config
  calls = []
  for line in text.splitlines():
    if "tpu_custom_call" not in line and "custom_call" not in line:
      continue
    if "backend_config" not in line:
      continue
    start = line.find('backend_config = "')
    if start < 0:
      # dict-style config
      start = line.find("backend_config")
      payload = line[start:start + 4096]
    else:
      payload = line[start + len('backend_config = "'):]
      payload = payload.split('"', 1)[0]
    calls.append(hashlib.sha1(payload.encode()).hexdigest()[:12])
  uniq = collections.Counter(calls)
  rec = {
      "program": name,
      "custom_calls": len(calls),
      "unique_payloads": len(uniq),
      "top_duplicates": uniq.most_common(5),
      "hlo_bytes": len(text),
  }
  print(json.dumps(rec), flush=True)
  return rec


def lower_pipeline():
  import jax
  import jax.numpy as jnp
  from mode_tpu.models.disparity import ModeDisparity
  from mode_tpu.models.fusion import ModeFusion
  from mode_tpu.pipeline import TwoStagePipeline

  h, w = 1024, 512
  disp_model = ModeDisparity(maxdisp=192, out_conf=True)
  dummy = jnp.zeros((1, h, w, 3), jnp.float32)
  disp_vars = jax.eval_shape(
      lambda: disp_model.init(jax.random.PRNGKey(0), dummy, dummy,
                              train=False))
  disp_vars = jax.tree_util.tree_map(
      lambda s: np.zeros(s.shape, s.dtype), disp_vars)
  fusion_model = ModeFusion(max_depth=1000.0)
  z1 = [jnp.zeros((1, h, w, 1), jnp.float32)] * 6
  z3 = [jnp.zeros((1, h, w, 3), jnp.float32)] * 4
  fusion_vars = jax.eval_shape(
      lambda: fusion_model.init(jax.random.PRNGKey(1), z1, z1, z3,
                                train=False))
  fusion_vars = jax.tree_util.tree_map(
      lambda s: np.zeros(s.shape, s.dtype), fusion_vars)
  pipe = TwoStagePipeline(disp_vars, fusion_vars, maxdisp=192,
                          max_depth=1000.0, dtype=jnp.bfloat16,
                          stage1_chunk=6, uint8_inputs=True)
  args = (pipe.disp_variables, pipe.fusion_variables,
          jax.ShapeDtypeStruct((6, h, w, 3), jnp.uint8),
          jax.ShapeDtypeStruct((6, h, w, 3), jnp.uint8),
          jax.ShapeDtypeStruct((4, h, w, 3), jnp.uint8))
  return pipe._run.lower(*args)


def lower_train(b=2):
  import jax
  import jax.numpy as jnp
  from mode_tpu import training
  from mode_tpu.models.disparity import ModeDisparity

  h, w = 1024, 512
  model = ModeDisparity(maxdisp=192, conv="Sphere", sphere_type="Cassini",
                        out_conf=False, remat=True)
  optimizer = training.make_optimizer()
  dummy = np.zeros((b, h, w, 3), np.float32)
  state = training.init_state(model, optimizer, jax.random.PRNGKey(0),
                              dummy, dummy, train=False)
  step = training.make_disparity_train_step(model, optimizer, mesh=None,
                                            compute_dtype=jnp.bfloat16)
  batch = (np.zeros((b, h, w, 3), np.float32),
           np.zeros((b, h, w, 3), np.float32),
           np.zeros((b, h, w), np.float32))
  return step.lower(state, *batch)


def main():
  import time
  which = sys.argv[1:] or ["pipeline"]
  for name in which:
    t0 = time.time()
    if name == "pipeline":
      lowered = lower_pipeline()
    elif name == "train":
      lowered = lower_train(b=2)
    else:
      raise SystemExit(f"unknown program {name}")
    print(json.dumps({"program": name,
                      "lower_s": round(time.time() - t0, 1)}), flush=True)
    analyze(name, lowered)


if __name__ == "__main__":
  main()
