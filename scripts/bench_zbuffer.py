#!/usr/bin/env python
"""Time the z-buffer re-projection (scatter vs sort impl) on the real chip.

The bridge runs three translation-pair re-projections per frame
(``geometry/reprojection.py``); round-2 profiling put them at ~54 ms/frame
with the scatter-min formulation ("no good TPU formulation found"). The
sort-based resolver is the candidate replacement: TPU scatters serialize,
sorts don't. Prints one JSON line per impl; both are bit-exact equal
(tests/test_geometry.py::test_zbuffer_sort_impl_bit_exact).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_zbuffer.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mode_tpu.geometry import reprojection as rp

ITERS = 10
H, W = 1024, 512


def main():
  rng = np.random.default_rng(0)
  depth = np.abs(rng.normal(5.0, 10.0, (H, W))).astype(np.float32)
  depth[rng.random((H, W)) < 0.05] = 0.0
  conf = rng.random((H, W)).astype(np.float32)
  args = (0.0, -1.0, 0.0, 0.5 * np.pi, 0.0, 0.0)

  d_dev = jax.device_put(jnp.asarray(depth))
  c_dev = jax.device_put(jnp.asarray(conf))

  results = {}
  for impl in ("scatter", "sort"):
    rp.set_zbuffer_impl(impl)

    @jax.jit
    def run(d, c):
      # iterate serialized via a data dependence; reduce to scalars so the
      # readback does not swamp the timing (axon tunnel ~17 MB/s)
      tot_v = 0.0
      tot_c = 0.0
      for i in range(ITERS):
        v, cc = rp.depth_view_transform_with_conf(d + i * 1e-6, c, *args)
        tot_v = tot_v + jnp.sum(v)
        tot_c = tot_c + jnp.sum(cc)
      return tot_v, tot_c

    v, c = run(d_dev, c_dev)
    np.asarray(v), np.asarray(c)
    t0 = time.time()
    v, c = run(d_dev, c_dev)
    sv, sc = float(np.asarray(v)), float(np.asarray(c))
    ms = (time.time() - t0) / ITERS * 1e3
    results[impl] = (ms, sv, sc)
    print(json.dumps({"impl": impl, "ms_per_call": round(ms, 3),
                      "sum_view": sv, "sum_conf": sc}), flush=True)
  rp.set_zbuffer_impl("sort")

  # the two impls are elementwise bit-exact (chip-check entry
  # zbuffer_sort_bit_exact_1024x512); these are f32 SUMS of ~5e5 elements
  # from two differently-fused programs, so compare with reduction-order
  # slack
  agree = all(
      abs(results["scatter"][i] - results["sort"][i])
      <= 1e-6 * abs(results["scatter"][i]) + 1.0 for i in (1, 2))
  print(json.dumps({"speedup_sort_vs_scatter":
                    round(results["scatter"][0] / results["sort"][0], 3),
                    "outputs_agree": bool(agree)}), flush=True)

  # --- batched (one sort for all 3 trans pairs, the round-4 bridge form) ---
  params = tuple(rp.DEEP360_PAIR_TRANSFORMS[p][1] for p in ("23", "24", "34"))
  depths3 = jnp.stack([d_dev, d_dev * 1.1, d_dev * 0.9])
  confs3 = jnp.stack([c_dev, c_dev, c_dev])

  @jax.jit
  def run3(ds, cs):
    tot_v = 0.0
    tot_c = 0.0
    for i in range(ITERS):
      v, cc = rp.depth_view_transforms_batched(ds + i * 1e-6, cs, params)
      tot_v = tot_v + jnp.sum(v)
      tot_c = tot_c + jnp.sum(cc)
    return tot_v, tot_c

  @jax.jit
  def run3_percall(ds, cs):
    tot_v = 0.0
    tot_c = 0.0
    for i in range(ITERS):
      for k in range(3):
        v, cc = rp.depth_view_transform_with_conf(ds[k] + i * 1e-6, cs[k],
                                                  *params[k])
        tot_v = tot_v + jnp.sum(v)
        tot_c = tot_c + jnp.sum(cc)
    return tot_v, tot_c

  outs = {}
  for name, fn in (("batched_3pair", run3), ("percall_3pair", run3_percall)):
    v, c = fn(depths3, confs3)
    np.asarray(v), np.asarray(c)
    t0 = time.time()
    v, c = fn(depths3, confs3)
    sv, sc = float(np.asarray(v)), float(np.asarray(c))
    ms = (time.time() - t0) / ITERS * 1e3
    outs[name] = (ms, sv, sc)
    print(json.dumps({"impl": name, "ms_per_frame": round(ms, 3),
                      "sum_view": sv, "sum_conf": sc}), flush=True)
  agree3 = all(
      abs(outs["batched_3pair"][i] - outs["percall_3pair"][i])
      <= 1e-6 * abs(outs["percall_3pair"][i]) + 1.0 for i in (1, 2))
  print(json.dumps({"speedup_batched_vs_percall":
                    round(outs["percall_3pair"][0] /
                          outs["batched_3pair"][0], 3),
                    "outputs_agree": bool(agree3)}), flush=True)


if __name__ == "__main__":
  main()
