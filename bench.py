#!/usr/bin/env python
"""Benchmark: end-to-end two-stage 360° depth pipeline, frames/sec/chip.

One "frame" = the reference's full production unit of work
(``save_output_disparity_stage.py`` + ``test_fusion.py``): 6 stereo pairs
through ModeDisparity (1024×512 Cassini, maxdisp 192, confidence on), the 6
disparity→depth SE(3) re-projections, and ModeFusion — all as one XLA
program on one TPU chip.

Baseline (``vs_baseline`` denominator): the reference publishes no
throughput numbers (BASELINE.md). We use an estimated 0.21 frames/s for the
reference pipeline on a V100-class GPU: ~0.45 s/stereo-pair for the
PSMNet-style stage-1 at 1024×512 (batch-6 amortized), plus ~1.5 s/frame for
the serial numba z-buffer bridge (3 of 6 pairs, CPU), plus fusion —
≈ 4.7 s/frame. The target from BASELINE.json is ≥5× that per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 0.21


def main():
  import jax
  import jax.numpy as jnp
  from mode_tpu.models.disparity import ModeDisparity
  from mode_tpu.models.fusion import ModeFusion
  from mode_tpu.pipeline import TwoStagePipeline

  h, w = 1024, 512
  rng = np.random.default_rng(0)

  disp_model = ModeDisparity(maxdisp=192, out_conf=True)
  dummy = jnp.zeros((1, h, w, 3), jnp.float32)
  disp_vars = jax.jit(
      lambda: disp_model.init(jax.random.PRNGKey(0), dummy, dummy,
                              train=False))()

  fusion_model = ModeFusion(max_depth=1000.0)
  z1 = [jnp.zeros((1, h, w, 1), jnp.float32)] * 6
  z3 = [jnp.zeros((1, h, w, 3), jnp.float32)] * 4
  fusion_vars = jax.jit(
      lambda: fusion_model.init(jax.random.PRNGKey(1), z1, z1, z3,
                                train=False))()

  pipe = TwoStagePipeline(disp_vars, fusion_vars, maxdisp=192,
                          max_depth=1000.0, stage1_chunk=6)

  def frame_inputs():
    lefts = rng.normal(size=(6, h, w, 3)).astype(np.float32)
    rights = rng.normal(size=(6, h, w, 3)).astype(np.float32)
    rgbs = rng.normal(size=(4, h, w, 3)).astype(np.float32)
    return lefts, rights, rgbs

  # warmup (compile)
  depth, _, _ = pipe(*frame_inputs())
  _ = np.asarray(depth)

  # timed: N frames; force host readback per frame (axon's
  # block_until_ready does not block)
  n = 6
  times = []
  for _ in range(n):
    inputs = frame_inputs()
    t0 = time.time()
    depth, _, _ = pipe(*inputs)
    _ = np.asarray(depth)
    times.append(time.time() - t0)
  med = float(np.median(times))
  fps = 1.0 / med
  print(json.dumps({
      "metric": "two_stage_pipeline_frames_per_sec_per_chip",
      "value": round(fps, 4),
      "unit": "frames/s (1024x512, 6 pairs + bridge + fusion)",
      "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 2),
  }))


if __name__ == "__main__":
  main()
