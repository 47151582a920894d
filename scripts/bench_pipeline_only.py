#!/usr/bin/env python
"""Run ONLY the fused-pipeline leg of bench.py (phase-instrumented).

For compile-time diagnosis and quick pipeline A/Bs without paying the
train-step legs. Prints the same pipeline fields as bench.py's second
JSON line. Run it bare (``python scripts/bench_pipeline_only.py``) so the
persistent-cache key matches the driver's ``python bench.py``.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
  bench._T0 = time.time()
  import jax

  cache_dir = os.environ.get(
      "JAX_COMPILATION_CACHE_DIR",
      os.path.join(os.path.dirname(os.path.dirname(
          os.path.abspath(__file__))), ".jax_cache"))
  jax.config.update("jax_compilation_cache_dir", cache_dir)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

  import jax.numpy as jnp
  from mode_tpu.utils.flops import pipeline_flops

  pipe_times, pipe_xla_flops = bench.bench_pipeline(jax, jnp)
  pipe_s = float(np.median(pipe_times))
  fps = 1.0 / pipe_s
  peak = bench.PEAK_BF16_TFLOPS * 1e12
  pipe_flops = pipeline_flops(1024, 512, 192)
  rec = {
      "metric": "two_stage_pipeline_frames_per_sec_per_chip",
      "value": round(fps, 4),
      "pipeline_s_min": round(float(np.min(pipe_times)), 4),
      "pipeline_s_stddev": round(float(np.std(pipe_times)), 4),
      "pipeline_iters": len(pipe_times),
      "pipeline_mfu_pct": round(100.0 * pipe_flops / pipe_s / peak, 2),
  }
  if pipe_xla_flops:
    rec["pipeline_tflops_xla"] = round(pipe_xla_flops / 1e12, 3)
  print(json.dumps(rec), flush=True)


if __name__ == "__main__":
  main()
