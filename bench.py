#!/usr/bin/env python
"""Benchmark: end-to-end two-stage 360° depth pipeline + training step.

One "frame" = the reference's full production unit of work
(``save_output_disparity_stage.py`` + ``test_fusion.py``): 6 stereo pairs
through ModeDisparity (1024×512 Cassini, maxdisp 192, confidence on), the 6
disparity→depth SE(3) re-projections, and ModeFusion — all as one XLA
program on one TPU chip. Also measured: full-resolution B=1/B=2 stage-1
training steps (bf16 + remat), IO-inclusive epoch throughput for both
stages, and model-FLOPs utilization from the closed-form analytic conv-MAC
count (mode_tpu/utils/flops.py) against the chip's bf16 peak.

MFU convention note (round 4): the numerator switched from XLA's
cost_analysis (which mixes kernel-declared CostEstimates — dense-GEMM
convention — with XLA's useful-MAC convention, and misses the strided
custom-VJP train kernels entirely) to the analytic useful-MAC count.
Round-3's 17.32% pipeline MFU at 3.19 fps reads 15.74% in this convention
— same speed, honest single-convention numerator.

Baseline (``vs_baseline`` denominator): the reference publishes no
throughput numbers (BASELINE.md). We use an estimated 0.21 frames/s for the
reference pipeline on a V100-class GPU: ~0.45 s/stereo-pair for the
PSMNet-style stage-1 at 1024×512 (batch-6 amortized), plus ~1.5 s/frame for
the serial numba z-buffer bridge (3 of 6 pairs, CPU), plus fusion —
≈ 4.7 s/frame. The target from BASELINE.json is ≥5× that per chip.

Output protocol (round 5, driver keeps the LAST parseable JSON line):
four progressively-complete JSON lines — B=1 train fields first (shortest
cold compile), then the headline pipeline fields, then the B=2 train
fields (its cold compile is the longest: the batch-gated bpack custom-VJP
kernels only engage at B>=2), then the epoch-IO fields — so a driver
timeout in any later leg can no longer discard the already-measured
numbers (that is exactly what emptied BENCH_r04: one print at the very
end). The epoch-IO legs run under a wall-clock budget
(BENCH_WALL_BUDGET_S, default 1620 s from main() start); past it their
fields are null with a reason.
"""

import json
import sys
import time

import numpy as np

_T0 = None   # set at main() start; _elapsed() measures against it


def _elapsed():
  return 0.0 if _T0 is None else time.time() - _T0


def _mark(msg):
  print(f"[bench {time.strftime('%H:%M:%S')} +{_elapsed():.0f}s] {msg}",
        file=sys.stderr, flush=True)

REFERENCE_FPS_ESTIMATE = 0.21
PEAK_BF16_TFLOPS = 197.0   # TPU v5e per-chip bf16 peak

# MFU numerators are closed-form analytic conv-MAC counts
# (mode_tpu/utils/flops.py, pinned to XLA's cost analysis on the all-XLA
# config by tests/test_flops.py). XLA's own cost_analysis is only a floor
# here: the Pallas custom calls (sphere conv, conv3d band family, fused
# regression) hide their FLOPs from it. The XLA numbers are still reported
# as *_tflops_xla for cross-checking.


def bench_pipeline(jax, jnp):
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

  # production path: bfloat16 stage-1 (f32 softmax/regression heads and f32
  # fusion), raw uint8 inputs normalized on-device (4x less host transfer).
  # Checkpoint-parity (float32) is covered by the test suite; bf16-vs-f32
  # disparity delta at trained weights is 0.12 px MAE at full res (0.06% of
  # the 192 px range), gated per round by scripts/tpu_kernel_check.py.
  pipe = TwoStagePipeline(disp_vars, fusion_vars, maxdisp=192,
                          max_depth=1000.0, dtype=jnp.bfloat16,
                          stage1_chunk=6, uint8_inputs=True)

  def frame_inputs():
    lefts = rng.integers(0, 256, size=(6, h, w, 3), dtype=np.uint8)
    rights = rng.integers(0, 256, size=(6, h, w, 3), dtype=np.uint8)
    rgbs = rng.integers(0, 256, size=(4, h, w, 3), dtype=np.uint8)
    return lefts, rights, rgbs

  # Inputs are pre-staged on device: this dev harness reaches the TPU
  # through a ~17 MB/s HTTP relay (an artifact of the tunnel — production
  # hosts feed TPUs over PCIe/DMA with a prefetching input pipeline). The
  # metric is pipeline compute throughput; the (subsampled) fused-depth
  # readback stays in the timed section as the synchronization point.
  _mark("staging inputs")
  staged = [jax.device_put(frame_inputs()) for _ in range(3)]
  # phase-split marks (VERDICT r4: the 14-20 min "compile" needed a
  # breakdown): lower = jaxpr->StableHLO on the host; compile = backend
  # (under axon: remote XLA:TPU + all Mosaic kernel compiles); warmup
  # dispatch->readback = executable load + first execution.
  args = (pipe.disp_variables, pipe.fusion_variables,
          *(jnp.asarray(a) for a in staged[0]))
  t0 = time.time()
  _mark("pipeline lower start")
  lowered = pipe._run.lower(*args)
  _mark(f"pipeline lower done ({time.time() - t0:.0f}s)")
  t0 = time.time()
  compiled = lowered.compile()
  _mark(f"pipeline XLA-compile done ({time.time() - t0:.0f}s)")
  key = tuple((tuple(a.shape), jnp.asarray(a).dtype.name)
              for a in args[2:])
  pipe._compiled[key] = compiled
  t0 = time.time()
  depth, _, _ = pipe(*staged[0])   # warmup (first execution)
  _mark(f"pipeline warmup dispatched ({time.time() - t0:.0f}s)")
  t0 = time.time()
  _ = np.asarray(depth)
  _mark(f"pipeline warmup readback done ({time.time() - t0:.0f}s)")

  n = 12
  times = []
  for it in range(n):
    t0 = time.time()
    depth, _, _ = pipe(*staged[it % len(staged)])
    _ = np.asarray(depth[::64, ::64])
    times.append(time.time() - t0)

  xla_flops = None
  try:
    xla_flops = pipe.cost_analysis_flops()
  except Exception:
    pass
  return times, xla_flops


def bench_train_step(jax, jnp, b=1):
  """Full-res (1024×512, maxdisp 192) stage-1 train step, bf16 + remat
  (save_convs policy). ``b=2`` is the production operating point: the
  underutilized conv3d mid-section amortizes (docs/PROFILES.md), matching
  the reference's own batched production config
  (``train_disparity.py:264-265``, batch 6 over GPUs)."""
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

  rng = np.random.default_rng(1)
  batch = [jax.device_put(x) for x in (
      rng.normal(size=(b, h, w, 3)).astype(np.float32),
      rng.normal(size=(b, h, w, 3)).astype(np.float32),
      rng.uniform(1.0, 100.0, size=(b, h, w)).astype(np.float32))]

  _mark("train-step compile start")
  # AOT: one lower+compile serves both the timed calls and cost_analysis
  # (training's jit donates the state, so feed the returned state back)
  flops = None
  try:
    compiled = step.lower(state, *batch).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
      cost = cost[0]
    flops = float(cost["flops"])
    run = compiled
  except Exception:
    run = step
  state, loss = run(state, *batch)       # warmup
  _ = float(loss)
  _mark("train-step compile done")
  times = []
  for _i in range(5):
    t0 = time.time()
    state, loss = run(state, *batch)
    _ = float(loss)                       # host readback = sync point
    times.append(time.time() - t0)
  return float(np.median(times)), flops


def bench_epoch_io(budget_s):
  """IO-inclusive epoch throughput (scripts/bench_epoch.py) in a bounded
  subprocess: file lister -> native decode -> prefetch loader -> H2D ->
  train step. The reference's only throughput observable is epoch
  wall-clock (train_disparity.py:234, train_fusion.py:201) — ingest
  included by definition — so the driver-visible JSON regresses it too.

  ``budget_s`` is the absolute wall-clock budget (from main() start): a
  stage is skipped — its fields emitted as null with a reason — rather
  than started without enough remaining time to finish."""
  import os
  import subprocess
  here = os.path.dirname(os.path.abspath(__file__))
  out = {}
  for stage, key, args in (
      ("disparity", "train_epoch_frames_per_sec_io",
       ["--frames", "8", "--batch", "1"]),
      ("fusion", "fusion_epoch_frames_per_sec_io", ["--stage", "fusion",
                                                    "--frames", "8"])):
    remaining = budget_s - _elapsed()
    if remaining < 120:
      _mark(f"epoch bench ({stage}) SKIPPED: {remaining:.0f}s left of "
            f"{budget_s:.0f}s budget")
      out[key] = None
      out[key + "_skip_reason"] = "wall-clock budget exhausted"
      continue
    try:
      _mark(f"epoch bench ({stage}) start ({remaining:.0f}s left)")
      proc = subprocess.run(
          [sys.executable, os.path.join(here, "scripts", "bench_epoch.py")]
          + args, capture_output=True, text=True,
          timeout=min(1500, remaining - 30))
      rec = None
      for line in proc.stdout.strip().splitlines():
        try:
          cand = json.loads(line)
        except ValueError:
          continue
        if "value" in cand:
          rec = cand
      if rec:
        out[key] = rec["value"]
        if "io_overhead_pct" in rec:
          out[key.replace("frames_per_sec_io", "io_overhead_pct")] = (
              rec["io_overhead_pct"])
      _mark(f"epoch bench ({stage}) done: {out.get(key)}")
      if not rec:
        # the subprocess emitted no value — surface why in the driver log
        tail = (proc.stderr or "").strip().splitlines()[-6:]
        _mark(f"epoch bench ({stage}) rc={proc.returncode}, stderr tail: "
              + " | ".join(tail))
    except Exception as e:
      _mark(f"epoch bench ({stage}) failed: {e}")
  return out


def main():
  global _T0
  _T0 = time.time()
  import os
  budget_s = float(os.environ.get("BENCH_WALL_BUDGET_S", "1620"))
  # A wedged TPU tunnel makes jax.devices() hang forever inside plugin
  # init (observed live) — probe the backend in a child process with a hard
  # timeout and fail fast with an explicit error instead of hanging the
  # driver's bench run.
  from __graft_entry__ import _probe_backend_devices
  if _probe_backend_devices(timeout_s=240.0) < 1:
    print(json.dumps({
        "metric": "two_stage_pipeline_frames_per_sec_per_chip",
        "value": None, "unit": "frames/s",
        "error": "TPU backend unreachable (device probe timed out)"}))
    sys.exit(1)

  import jax
  import jax.numpy as jnp

  # Persistent compilation cache: the fused pipeline + train step compile in
  # ~9 min cold; warm runs (e.g. the driver's round-end bench after this
  # script ran during development) reuse the serialized executables.
  cache_dir = os.environ.get(
      "JAX_COMPILATION_CACHE_DIR",
      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
  try:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
  except Exception:
    pass

  from mode_tpu.utils.flops import disparity_flops, pipeline_flops

  peak = PEAK_BF16_TFLOPS * 1e12
  pipe_flops = pipeline_flops(1024, 512, 192)
  train_flops = disparity_flops(1, 1024, 512, 192)["train"]
  train2_flops = disparity_flops(2, 1024, 512, 192)["train"]

  record = {
      "metric": "two_stage_pipeline_frames_per_sec_per_chip",
      "value": None,
      "unit": "frames/s (1024x512, 6 pairs + bridge + fusion)",
      "vs_baseline": None,
  }

  # Progressive-output protocol (the driver keeps the LAST parseable JSON
  # line; each emitted line is a superset of the previous). Legs are
  # ordered by value-per-cold-compile-second: the B=1 train step (shortest
  # cold compile, ~6 min) prints a first line as the floor, the headline
  # pipeline leg upgrades it, THEN the B=2 train leg (whose cold compile is
  # the longest — it engages the batch-gated bpack custom-VJP kernels that
  # B=1 skips) and the epoch-IO legs upgrade it again budget permitting.
  # Round-4's failure was one print after every leg; a cold-cache driver
  # budget must never again produce zero parseable lines.
  train_s, train_xla_flops = bench_train_step(jax, jnp, b=1)
  record.update({
      "train_step_s": round(train_s, 4),
      # analytic-FLOPs MFU (conv MACs; see mode_tpu/utils/flops.py)
      "train_mfu_pct": round(100.0 * train_flops / train_s / peak, 2),
      "train_tflops": round(train_flops / 1e12, 3),
  })
  if train_xla_flops:
    record["train_tflops_xla"] = round(train_xla_flops / 1e12, 3)
  print(json.dumps(record), flush=True)
  _mark("train B=1 JSON emitted")

  pipe_times, pipe_xla_flops = bench_pipeline(jax, jnp)
  pipe_s = float(np.median(pipe_times))
  fps = 1.0 / pipe_s
  record.update({
      "value": round(fps, 4),
      "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 2),
      # run-to-run spread of the pipeline iterations (the builder-session vs
      # driver-run discrepancy in round 3 was inside this spread)
      "pipeline_s_min": round(float(np.min(pipe_times)), 4),
      "pipeline_s_stddev": round(float(np.std(pipe_times)), 4),
      "pipeline_iters": len(pipe_times),
      "pipeline_mfu_pct": round(100.0 * pipe_flops / pipe_s / peak, 2),
      "pipeline_tflops": round(pipe_flops / 1e12, 3),
  })
  if pipe_xla_flops:
    record["pipeline_tflops_xla"] = round(pipe_xla_flops / 1e12, 3)
  print(json.dumps(record), flush=True)
  _mark("pipeline JSON emitted")

  train2_s, train2_xla_flops = bench_train_step(jax, jnp, b=2)
  record.update({
      "train_b2_ms_per_example": round(train2_s / 2 * 1e3, 1),
      "train_b2_mfu_pct": round(100.0 * train2_flops / train2_s / peak, 2),
  })
  print(json.dumps(record), flush=True)
  _mark("train B=2 JSON emitted")

  epoch = bench_epoch_io(budget_s)
  record.update(epoch)
  print(json.dumps(record), flush=True)
  _mark("superset JSON emitted")


if __name__ == "__main__":
  main()
