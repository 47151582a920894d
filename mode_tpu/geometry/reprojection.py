"""Disparity↔depth conversion and cross-camera depth re-projection.

TPU-first re-designs of the reference's disparity→depth "bridge"
(``/root/reference/save_output_disparity_stage.py:105-160``), the serial
numba z-buffer loop (``/root/reference/utils/geometry.py:94-156``) and the
3D60 depth→disparity closed form
(``/root/reference/dataloader/dataset3D60Loader.py:258-270``).

The z-buffer is the interesting part: the reference forward-projects every
source pixel into the target panorama and resolves collisions sequentially
("first strictly-smaller radius wins"). Here that becomes a deterministic
two-pass scatter-min (min radius per target, then min source index among the
winners) — fully vectorized, race-free by construction, and exactly
equivalent to the serial loop including its tie-breaking (row-major first
occurrence == smallest flattened source index).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from mode_tpu.geometry.projection import _axis_angles, rotation_matrix

_SENTINEL = 100000.0  # reference's z-buffer init (geometry.py:133)
_MAX_DEPTH_CLIP = 1000.0  # reference's hard clip (geometry.py:143, bridge :132)

# Deep360 camera rig: pair name -> stereo baseline in meters
# (save_output_disparity_stage.py:106-109)
DEEP360_BASELINES = {
    "12": 1.0, "13": 1.0, "14": math.sqrt(2.0),
    "23": math.sqrt(2.0), "24": 1.0, "34": 1.0,
}

# The real fisheye rig's baselines (save_output_disparity_stage.py:113)
FISHEYE_BASELINES = {
    "12": 0.6 * math.sqrt(2.0), "13": 0.6 * math.sqrt(2.0), "14": 1.2,
    "23": 1.2, "24": 0.6 * math.sqrt(2.0), "34": 0.6 * math.sqrt(2.0),
}

# Pair name -> SE(3) that carries the pair's reference view into camera 1's
# frame: either a pure rotation of the panorama ("rot") or a full
# translation+rotation re-projection ("trans") (save_output_disparity_stage.py:135-157).
DEEP360_PAIR_TRANSFORMS = {
    "12": ("identity", None),
    "13": ("rot", (0.5 * math.pi, 0.0, 0.0)),
    "14": ("rot", (0.25 * math.pi, 0.0, 0.0)),
    "23": ("trans", (0.0, -math.sqrt(2.0) / 2, -math.sqrt(2.0) / 2,
                     0.75 * math.pi, 0.0, 0.0)),
    "24": ("trans", (0.0, -1.0, 0.0, 0.5 * math.pi, 0.0, 0.0)),
    "34": ("trans", (0.0, 1.0, 0.0, 0.0, 0.0, 0.0)),
}


@functools.lru_cache(maxsize=16)
def _phi_map(h: int, w: int) -> np.ndarray:
  """Latitude-like angle along Cassini columns, tiled over rows: (h, w)."""
  return np.tile(_axis_angles(w, full=False)[None, :], (h, 1)).astype(np.float32)


def cassini_disp_to_depth(disp: jnp.ndarray, baseline: float) -> jnp.ndarray:
  """Sine-law disparity→depth on a Cassini panorama ``(..., H, W)``.

  ``depth = b * sin(pi/2 - phi_r) / sin(phi_r - phi_l)`` with
  ``phi_r = disp * pi / W + phi_l``; zero-disparity pixels map to the
  1000 m far-clip, negatives to 0 (bridge ``:118-133``).
  """
  h, w = disp.shape[-2], disp.shape[-1]
  phi_l = jnp.asarray(_phi_map(h, w))
  safe = jnp.where(disp == 0, 1.0, disp)
  phi_r = safe * (np.pi / w) + phi_l
  depth = baseline * jnp.sin(0.5 * np.pi - phi_r) / jnp.sin(phi_r - phi_l)
  depth = jnp.where(disp == 0, _MAX_DEPTH_CLIP, depth)
  depth = jnp.where(depth > _MAX_DEPTH_CLIP, _MAX_DEPTH_CLIP, depth)
  depth = jnp.where(depth < 0, 0.0, depth)
  return depth


def depth_to_cassini_disp(depth: jnp.ndarray, baseline: float,
                          max_depth: float) -> jnp.ndarray:
  """Closed-form depth→disparity for a Cassini stereo pair ``(..., H, W)``.

  Parity target: ``Dataset3D60Disparity.__depth2disp``
  (``dataset3D60Loader.py:258-270``): invalid depths (<=0 or >max_depth)
  become NaN, negative disparities clamp to 0.
  """
  h, w = depth.shape[-2], depth.shape[-1]
  phi_l = jnp.asarray(_phi_map(h, w))
  invalid = (depth <= 0) | (depth > max_depth)
  d = jnp.where(invalid, 1.0, depth)
  denom = jnp.sqrt(d * d + baseline * baseline -
                   2.0 * d * baseline * jnp.cos(phi_l + 0.5 * np.pi))
  disp = w * (jnp.arcsin(jnp.clip((d * jnp.sin(phi_l) + baseline) / denom,
                                  -1.0, 1.0)) - phi_l) / np.pi
  disp = jnp.where(invalid, jnp.nan, disp)
  return jnp.where(disp < 0, 0.0, disp)


@functools.lru_cache(maxsize=16)
def _view_transform_consts(h: int, w: int, y0: float, z0: float, x0: float,
                           pitch: float, yaw: float, roll: float):
  """Static per-pixel unit rays + SE(3) for depth_view_transform."""
  theta1 = np.tile(_axis_angles(h, full=True)[:, None], (1, w)).astype(np.float64)
  phi1 = np.tile(_axis_angles(w, full=False)[None, :], (h, 1)).astype(np.float64)
  ray = np.stack([np.sin(phi1),
                  np.cos(phi1) * np.sin(theta1),
                  np.cos(phi1) * np.cos(theta1)], axis=-1)  # (h, w, 3)
  r = rotation_matrix(pitch, yaw, roll)
  t = np.array([x0, y0, z0], dtype=np.float64)
  return ray.astype(np.float32), r.astype(np.float32), t.astype(np.float32)


def depth_view_transform_with_conf(depth: jnp.ndarray, conf: jnp.ndarray,
                                   y0: float, z0: float, x0: float,
                                   pitch: float, yaw: float,
                                   roll: float) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Re-project a Cassini depth+confidence map ``(H, W)`` into another
  camera's frame with z-buffer collision resolution.

  Parity target: ``depthViewTransWithConf`` + ``__iterPixels_with_conf``
  (``geometry.py:94-156``). Argument order (y0, z0, x0) mirrors the
  reference's call signature.
  """
  h, w = depth.shape
  ray, r, t = _view_transform_consts(h, w, float(y0), float(z0), float(x0),
                                     float(pitch), float(yaw), float(roll))
  ray = jnp.asarray(ray)
  r = jnp.asarray(r)
  t = jnp.asarray(t)

  x1 = depth[..., None] * ray                      # (h, w, 3) points in cam A
  d = x1 - t
  # unrolled 3x3 rotation: exact f32 on the VPU (a (..,3)x(3,3) matmul would
  # hit the MXU at bf16 default precision and corrupt the z-buffer indices)
  x2 = jnp.stack([d[..., 0] * r[0, 0] + d[..., 1] * r[0, 1] + d[..., 2] * r[0, 2],
                  d[..., 0] * r[1, 0] + d[..., 1] * r[1, 1] + d[..., 2] * r[1, 2],
                  d[..., 0] * r[2, 0] + d[..., 1] * r[2, 1] + d[..., 2] * r[2, 2]],
                 axis=-1)                          # (h, w, 3) points in cam B
  r2 = jnp.sqrt(jnp.sum(x2 * x2, axis=-1))
  r2_safe = jnp.where(r2 > 0, r2, 1.0)
  theta2 = jnp.arctan2(x2[..., 1], x2[..., 2])
  phi2 = jnp.arcsin(jnp.clip(x2[..., 0] / r2_safe, -1.0, 1.0))

  ti = jnp.clip(jnp.round(h / 2 - h * theta2 / (2 * np.pi)), 0, h - 1).astype(jnp.int32)
  tj = jnp.clip(jnp.round(w / 2 - w * phi2 / np.pi), 0, w - 1).astype(jnp.int32)
  tgt = (ti * w + tj).reshape(-1)

  n = h * w
  valid = (depth > 0).reshape(-1)
  r2f = jnp.where(valid, r2.reshape(-1), jnp.inf)

  best, winner = _zbuffer_resolve(r2f, tgt, n)
  has_winner = (winner < n) & (best < _SENTINEL)
  conf_out = jnp.where(
      has_winner,
      jnp.take(conf.reshape(-1), jnp.clip(winner, 0, n - 1)),
      0.0)

  view_out = jnp.where(best >= _SENTINEL, 0.0, best)
  view_out = jnp.where(view_out > _MAX_DEPTH_CLIP, _MAX_DEPTH_CLIP, view_out)
  return view_out.reshape(h, w), conf_out.reshape(h, w)


_ZBUFFER_IMPL = "sort"   # "sort" | "sort2x" | "scatter" (set_zbuffer_impl).
                         # All elementwise bit-exact; per 1024x512 call on a
                         # v5e chip: sort 10.6 ms (round-5 half-sort +
                         # unique-scatter extraction), sort2x 12.7, scatter
                         # 20.2 (colliding TPU scatters serialize; the
                         # unique-index extraction scatter doesn't).


def set_zbuffer_impl(impl: str):
  """Select the z-buffer collision-resolution algorithm (all are exact,
  including the first-come tie-break; they differ only in speed)."""
  global _ZBUFFER_IMPL
  assert impl in ("scatter", "sort", "sort2x"), impl
  _ZBUFFER_IMPL = impl


def _zbuffer_resolve(r2f: jnp.ndarray, tgt: jnp.ndarray, n: int
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Resolve z-buffer collisions: per target pixel, the min radius and the
  smallest flattened source index among the min-radius hits.

  Returns ``(best (n,) f32 <= _SENTINEL, winner (n,) i32 with n = none)``.

  Three exact implementations (selectable for A/B; elementwise identical):
    * ``scatter``: two global scatter-mins (radius, then tie-break index)
      over colliding indices.
    * ``sort`` (default, round 5): ONE stable sort of the n real entries by
      (target, radius-bits) — non-negative f32 radii compare correctly as
      their u32 bit patterns, and stability keeps source ascending within
      equal keys, reproducing the serial loop's first-come tie-break. The
      first entry of each target's run is its winner; it is placed by a
      unique-index scatter (run starts hit distinct targets by
      construction, non-starts drop at index n). Hitless targets keep the
      (``_SENTINEL``, n) initializers. Measured 10.6 vs 12.7 ms/call at
      1024×512 on a v5e chip (``scripts/bench_zbuffer_variants.py``,
      2026-08-20).
    * ``sort2x``: the round-3 two-sort form — append one sentinel entry per
      target (radius ``_SENTINEL``, source ``n``) so every target has a
      run, stable-sort 2n entries, then compact the n run starts to the
      front in target order with a second stable sort on the run-start
      flag. Kept for A/B; the searchsorted extraction is NOT an alternative
      (measured 8× slower than both, docs/PROFILES.md round 4).
  """
  src = jnp.arange(n, dtype=jnp.int32)
  if _ZBUFFER_IMPL == "scatter":
    best = jnp.full((n,), _SENTINEL, jnp.float32).at[tgt].min(
        r2f, mode="drop", indices_are_sorted=False, unique_indices=False)
    contender = (r2f < _SENTINEL) & (r2f == best[tgt])
    cand = jnp.where(contender, src, n)
    winner = jnp.full((n,), n, jnp.int32).at[tgt].min(cand, mode="drop")
    return best, winner

  r2_cap = jnp.minimum(r2f, jnp.float32(_SENTINEL))   # min vs SENTINEL init
  sent_bits = np.array([_SENTINEL], np.float32).view(np.uint32)[0]
  bits = jax.lax.bitcast_convert_type(r2_cap, jnp.uint32)

  if _ZBUFFER_IMPL == "sort":
    s_tgt, s_bits, s_src = jax.lax.sort(
        (tgt, bits, src), dimension=0, is_stable=True, num_keys=2)
    start = jnp.concatenate([jnp.ones((1,), bool), s_tgt[1:] != s_tgt[:-1]])
    idx = jnp.where(start, s_tgt, n)
    best = jax.lax.bitcast_convert_type(
        jnp.full((n,), sent_bits, jnp.uint32).at[idx].set(
            s_bits, mode="drop", unique_indices=True), jnp.float32)
    winner = jnp.full((n,), n, jnp.int32).at[idx].set(
        s_src, mode="drop", unique_indices=True)
    # a real entry capped at exactly _SENTINEL still scatters, but
    # has_winner (best < _SENTINEL) discards it, matching the scatter
    # path's strict contender test (and the sort2x stability outcome).
    return best, winner

  # --- sort2x ---------------------------------------------------------------
  all_tgt = jnp.concatenate([tgt, src])
  all_bits = jnp.concatenate([
      bits,                                               # r2 >= 0: bit
      jnp.full((n,), sent_bits, jnp.uint32),              # order == value
  ])                                                      # order
  all_src = jnp.concatenate([src, jnp.full((n,), n, jnp.int32)])
  s_tgt, s_bits, s_src = jax.lax.sort(
      (all_tgt, all_bits, all_src), dimension=0, is_stable=True, num_keys=2)
  start = jnp.concatenate([jnp.ones((1,), jnp.int32),
                           (s_tgt[1:] != s_tgt[:-1]).astype(jnp.int32)])
  # every target has >= 1 entry (the sentinels), so there are exactly n run
  # starts and the k-th in order belongs to target k: compact them front.
  _, w_bits, w_src = jax.lax.sort(
      (1 - start, s_bits, s_src), dimension=0, is_stable=True, num_keys=1)
  best = jax.lax.bitcast_convert_type(w_bits[:n], jnp.float32)
  winner = w_src[:n]
  # a real entry at exactly _SENTINEL beats the sentinel by stability, but
  # has_winner (best < _SENTINEL) already discards it, matching the scatter
  # path's strict contender test.
  return best, winner


def depth_view_transforms_batched(depths: jnp.ndarray, confs: jnp.ndarray,
                                  transforms: tuple
                                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Re-project K Cassini depth+confidence maps in ONE z-buffer sort.

  Elementwise bit-exact to K calls of
  :func:`depth_view_transform_with_conf`: each pair's target pixels are
  offset by ``k*h*w`` so the K collision problems occupy disjoint key
  ranges of a single stable sort — runs never mix across pairs and the
  within-pair source order (the serial loop's first-come tie-break) is
  preserved.

  NOT used by the fused pipeline: measured SLOWER than K per-pair sorts on
  a v5e chip (32.1 vs 27.8 ms for the 3-pair 1024×512 bridge,
  ``scripts/bench_zbuffer.py`` 2026-08-19) — TPU sort cost grows
  ~n·log²(n), so one 6n-element sort costs more than three 2n sorts and
  there is no per-sort launch latency to amortize. Kept as the measured
  negative result + for callers whose K problems are each too small to
  fill the chip.

  Args:
    depths / confs: ``(K, H, W)``.
    transforms: K tuples ``(y0, z0, x0, pitch, yaw, roll)`` (the
      reference's argument order, ``geometry.py:94``).
  """
  k_n, h, w = depths.shape
  rays, rots, trs = [], [], []
  for y0, z0, x0, pitch, yaw, roll in transforms:
    ray, r, t = _view_transform_consts(h, w, float(y0), float(z0), float(x0),
                                       float(pitch), float(yaw), float(roll))
    rays.append(ray)
    rots.append(r)
    trs.append(t)
  ray = jnp.asarray(np.stack(rays))               # (K, h, w, 3)
  r = jnp.asarray(np.stack(rots))                 # (K, 3, 3)
  t = jnp.asarray(np.stack(trs))                  # (K, 3)

  x1 = depths[..., None] * ray                    # (K, h, w, 3)
  d = x1 - t[:, None, None, :]
  # unrolled 3x3 rotation, same form as the single-pair version: exact f32
  # on the VPU. A broadcast-multiply-reduce can be pattern-rewritten by XLA
  # into dot_general (MXU, bf16 default precision), which would corrupt the
  # z-buffer indices — keep it as explicit scalar mul/adds.
  rk = r[:, None, None, :, :]                     # (K, 1, 1, 3, 3)
  x2 = jnp.stack(
      [d[..., 0] * rk[..., i, 0] + d[..., 1] * rk[..., i, 1]
       + d[..., 2] * rk[..., i, 2] for i in range(3)], axis=-1)
  r2 = jnp.sqrt(jnp.sum(x2 * x2, axis=-1))
  r2_safe = jnp.where(r2 > 0, r2, 1.0)
  theta2 = jnp.arctan2(x2[..., 1], x2[..., 2])
  phi2 = jnp.arcsin(jnp.clip(x2[..., 0] / r2_safe, -1.0, 1.0))

  ti = jnp.clip(jnp.round(h / 2 - h * theta2 / (2 * np.pi)),
                0, h - 1).astype(jnp.int32)
  tj = jnp.clip(jnp.round(w / 2 - w * phi2 / np.pi), 0, w - 1).astype(jnp.int32)
  n = h * w
  offs = (jnp.arange(k_n, dtype=jnp.int32) * n)[:, None, None]
  tgt = (offs + ti * w + tj).reshape(-1)          # disjoint ranges per pair

  valid = (depths > 0).reshape(-1)
  r2f = jnp.where(valid, r2.reshape(-1), jnp.inf)

  best, winner = _zbuffer_resolve(r2f, tgt, k_n * n)
  has_winner = (winner < k_n * n) & (best < _SENTINEL)
  conf_out = jnp.where(
      has_winner,
      jnp.take(confs.reshape(-1), jnp.clip(winner, 0, k_n * n - 1)),
      0.0)

  view_out = jnp.where(best >= _SENTINEL, 0.0, best)
  view_out = jnp.where(view_out > _MAX_DEPTH_CLIP, _MAX_DEPTH_CLIP, view_out)
  return view_out.reshape(k_n, h, w), conf_out.reshape(k_n, h, w)


def disp_to_depth_at_cam1(disp: jnp.ndarray, conf: jnp.ndarray,
                          cam_pair: str,
                          baselines: dict | None = None
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Full bridge for one Deep360 pair: disparity ``(H, W)`` → depth map in
  camera-1's frame + transported confidence.

  Parity target: ``disp2depth`` (``save_output_disparity_stage.py:105-160``).
  """
  from mode_tpu.geometry.projection import rotate_cassini

  b = (baselines or DEEP360_BASELINES)[cam_pair]
  depth_l = cassini_disp_to_depth(disp, b)
  kind, params = DEEP360_PAIR_TRANSFORMS[cam_pair]
  if kind == "identity":
    return depth_l, conf
  if kind == "rot":
    pitch, yaw, roll = params
    both = jnp.stack([depth_l, conf], axis=-1)[None]  # (1, H, W, 2)
    rot = rotate_cassini(both, pitch, yaw, roll)[0]
    return rot[..., 0], rot[..., 1]
  y0, z0, x0, pitch, yaw, roll = params
  return depth_view_transform_with_conf(depth_l, conf, y0, z0, x0,
                                        pitch, yaw, roll)
