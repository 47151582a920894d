#!/usr/bin/env python
"""Z-buffer resolver variants: can the two 2n-element sorts shrink?

The shipped resolver (geometry/reprojection.py) appends one sentinel per
target (guaranteeing every target a run, so run-starts compact POSITIONALLY
to their target index) and pays two stable sorts of 2n elements. Variants:

  * v1_searchsorted: keep the 2n sentinel sort, replace the second sort
    with searchsorted(s_tgt, arange(n)) + gathers (s_tgt is sorted, and the
    FIRST position of t is exactly the stable winner).
  * v3_half_sort: drop the sentinels — sort only the n real entries, find
    winners by searchsorted + match check (absent targets miss). Also
    carries CONF as the third sort operand instead of the source index, so
    the winner's confidence needs no follow-up gather.

All must be elementwise bit-identical to the baseline on the final
(view, conf) maps. Prints ms/call for the full depth_view_transform-shaped
program (VPU projection + resolve) and a bit-exactness verdict.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_zbuffer_variants.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from mode_tpu.geometry import reprojection as rp

ITERS = 10
H, W = 1024, 512
SENT = rp._SENTINEL


def _project(depth, conf, args):
  """Everything before the resolve: returns (r2f, tgt, conf_flat, n)."""
  h, w = depth.shape
  ray, r, t = rp._view_transform_consts(h, w, *[float(a) for a in args])
  ray, r, t = jnp.asarray(ray), jnp.asarray(r), jnp.asarray(t)
  x1 = depth[..., None] * ray
  d = x1 - t
  x2 = jnp.stack([d[..., 0] * r[0, 0] + d[..., 1] * r[0, 1] + d[..., 2] * r[0, 2],
                  d[..., 0] * r[1, 0] + d[..., 1] * r[1, 1] + d[..., 2] * r[1, 2],
                  d[..., 0] * r[2, 0] + d[..., 1] * r[2, 1] + d[..., 2] * r[2, 2]],
                 axis=-1)
  r2 = jnp.sqrt(jnp.sum(x2 * x2, axis=-1))
  r2_safe = jnp.where(r2 > 0, r2, 1.0)
  theta2 = jnp.arctan2(x2[..., 1], x2[..., 2])
  phi2 = jnp.arcsin(jnp.clip(x2[..., 0] / r2_safe, -1.0, 1.0))
  ti = jnp.clip(jnp.round(h / 2 - h * theta2 / (2 * np.pi)), 0,
                h - 1).astype(jnp.int32)
  tj = jnp.clip(jnp.round(w / 2 - w * phi2 / np.pi), 0, w - 1).astype(jnp.int32)
  tgt = (ti * w + tj).reshape(-1)
  n = h * w
  valid = (depth > 0).reshape(-1)
  r2f = jnp.where(valid, r2.reshape(-1), jnp.inf)
  return r2f, tgt, conf.reshape(-1), n


def _finish(best, conf_out, h, w):
  view = jnp.where(best >= SENT, 0.0, best)
  view = jnp.where(view > rp._MAX_DEPTH_CLIP, rp._MAX_DEPTH_CLIP, view)
  return view.reshape(h, w), conf_out.reshape(h, w)


def baseline(depth, conf, args):
  return rp.depth_view_transform_with_conf(depth, conf, *args)


def v1_searchsorted(depth, conf, args):
  r2f, tgt, conff, n = _project(depth, conf, args)
  src = jnp.arange(n, dtype=jnp.int32)
  r2_cap = jnp.minimum(r2f, jnp.float32(SENT))
  sent_bits = np.array([SENT], np.float32).view(np.uint32)[0]
  all_tgt = jnp.concatenate([tgt, src])
  all_bits = jnp.concatenate([
      lax.bitcast_convert_type(r2_cap, jnp.uint32),
      jnp.full((n,), sent_bits, jnp.uint32)])
  all_conf = jnp.concatenate([conff, jnp.zeros((n,), jnp.float32)])
  s_tgt, s_bits, s_conf = lax.sort((all_tgt, all_bits, all_conf),
                                   dimension=0, is_stable=True, num_keys=2)
  pos = jnp.searchsorted(s_tgt, src)           # first occurrence == winner
  best = lax.bitcast_convert_type(jnp.take(s_bits, pos), jnp.float32)
  conf_out = jnp.where(best < SENT, jnp.take(s_conf, pos), 0.0)
  return _finish(best, conf_out, depth.shape[0], depth.shape[1])


def v3_half_sort(depth, conf, args):
  r2f, tgt, conff, n = _project(depth, conf, args)
  src = jnp.arange(n, dtype=jnp.int32)
  r2_cap = jnp.minimum(r2f, jnp.float32(SENT))
  bits = lax.bitcast_convert_type(r2_cap, jnp.uint32)
  s_tgt, s_bits, s_conf = lax.sort((tgt, bits, conff), dimension=0,
                                   is_stable=True, num_keys=2)
  pos = jnp.searchsorted(s_tgt, src)           # in [0, n]
  pos_c = jnp.minimum(pos, n - 1)
  hit = (jnp.take(s_tgt, pos_c) == src) & (pos < n)
  sent_bits = np.array([SENT], np.float32).view(np.uint32)[0]
  best = lax.bitcast_convert_type(
      jnp.where(hit, jnp.take(s_bits, pos_c), sent_bits), jnp.float32)
  conf_out = jnp.where(hit & (best < SENT), jnp.take(s_conf, pos_c), 0.0)
  return _finish(best, conf_out, depth.shape[0], depth.shape[1])


def v4_half_sort_scatter(depth, conf, args):
  """Half-size sort + unique-index scatter extraction (round 5).

  Drops the sentinel entries (first sort shrinks 2n -> n) and extracts each
  run's first entry — the stable winner — by scattering it to its target
  position with unique indices (run starts are unique targets by
  construction; non-starts are dropped at index n). Carries conf as the
  sort payload like v3, so no winner-index gather is needed."""
  r2f, tgt, conff, n = _project(depth, conf, args)
  r2_cap = jnp.minimum(r2f, jnp.float32(SENT))
  bits = lax.bitcast_convert_type(r2_cap, jnp.uint32)
  s_tgt, s_bits, s_conf = lax.sort((tgt, bits, conff), dimension=0,
                                   is_stable=True, num_keys=2)
  start = jnp.concatenate([jnp.ones((1,), bool), s_tgt[1:] != s_tgt[:-1]])
  idx = jnp.where(start, s_tgt, n)
  sent_bits = np.array([SENT], np.float32).view(np.uint32)[0]
  best_bits = jnp.full((n,), sent_bits, jnp.uint32).at[idx].set(
      s_bits, mode="drop", unique_indices=True)
  conf_out = jnp.zeros((n,), jnp.float32).at[idx].set(
      s_conf, mode="drop", unique_indices=True)
  best = lax.bitcast_convert_type(best_bits, jnp.float32)
  conf_out = jnp.where(best < SENT, conf_out, 0.0)
  return _finish(best, conf_out, depth.shape[0], depth.shape[1])


def v5_half_sort_scatter_packed(depth, conf, args):
  """v4 with the two extraction scatters fused into one (n, 2) u32 scatter."""
  r2f, tgt, conff, n = _project(depth, conf, args)
  r2_cap = jnp.minimum(r2f, jnp.float32(SENT))
  bits = lax.bitcast_convert_type(r2_cap, jnp.uint32)
  s_tgt, s_bits, s_conf = lax.sort((tgt, bits, conff), dimension=0,
                                   is_stable=True, num_keys=2)
  start = jnp.concatenate([jnp.ones((1,), bool), s_tgt[1:] != s_tgt[:-1]])
  idx = jnp.where(start, s_tgt, n)
  sent_bits = np.array([SENT], np.float32).view(np.uint32)[0]
  payload = jnp.stack(
      [s_bits, lax.bitcast_convert_type(s_conf, jnp.uint32)], axis=-1)
  init = jnp.stack([jnp.full((n,), sent_bits, jnp.uint32),
                    jnp.zeros((n,), jnp.uint32)], axis=-1)
  out = init.at[idx].set(payload, mode="drop", unique_indices=True)
  best = lax.bitcast_convert_type(out[:, 0], jnp.float32)
  conf_out = lax.bitcast_convert_type(out[:, 1], jnp.float32)
  conf_out = jnp.where(best < SENT, conf_out, 0.0)
  return _finish(best, conf_out, depth.shape[0], depth.shape[1])


def main():
  rng = np.random.default_rng(0)
  depth = np.abs(rng.normal(5.0, 10.0, (H, W))).astype(np.float32)
  depth[rng.random((H, W)) < 0.05] = 0.0
  depth[rng.random((H, W)) < 0.02] = 150000.0     # beyond-sentinel radii
  conf = rng.random((H, W)).astype(np.float32)
  args = (0.0, -1.0, 0.0, 0.5 * np.pi, 0.0, 0.0)
  d_dev = jax.device_put(jnp.asarray(depth))
  c_dev = jax.device_put(jnp.asarray(conf))

  ref_v = ref_c = None
  only = set(sys.argv[1:])
  for name, fn in (("baseline_2sorts", baseline),
                   ("v1_searchsorted", v1_searchsorted),
                   ("v3_half_sort", v3_half_sort),
                   ("v4_half_sort_scatter", v4_half_sort_scatter),
                   ("v5_half_sort_scatter_packed", v5_half_sort_scatter_packed)):
    if only and name not in only and name != "baseline_2sorts":
      continue
    @jax.jit
    def run(d, c, fn=fn):
      tv, tc = 0.0, 0.0
      for i in range(ITERS):
        v, cc = fn(d + i * 1e-6, c, args)
        tv = tv + jnp.sum(v)
        tc = tc + jnp.sum(cc)
      return tv, tc

    v, c = run(d_dev, c_dev)
    np.asarray(v), np.asarray(c)
    t0 = time.time()
    v, c = run(d_dev, c_dev)
    sv, sc = float(np.asarray(v)), float(np.asarray(c))
    ms = (time.time() - t0) / ITERS * 1e3

    # bit-exactness on the actual maps (single call)
    mv, mc = (np.asarray(t) for t in jax.jit(
        lambda d, c, fn=fn: fn(d, c, args))(d_dev, c_dev))
    if ref_v is None:
      ref_v, ref_c = mv, mc
      exact = True
    else:
      exact = bool(np.array_equal(mv, ref_v) and np.array_equal(mc, ref_c))
    print(json.dumps({"impl": name, "ms_per_call": round(ms, 3),
                      "sum_view": sv, "sum_conf": sc,
                      "bit_exact_vs_baseline": exact}), flush=True)


if __name__ == "__main__":
  main()
