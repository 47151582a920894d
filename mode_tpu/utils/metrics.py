"""Evaluation metrics (disparity + depth), jit-friendly masked versions.

Parity targets: ``/root/reference/utils/evaluation.py`` — the reference
indexes with a boolean mask (``pred[mask]``) which is shape-dynamic; here
every metric takes ``(pred, gt, mask)`` and reduces with masked sums so the
whole evaluation runs inside one compiled graph. Each function returns the
same scalar the reference computes on the masked flat tensors.
"""

from __future__ import annotations

import jax.numpy as jnp


def _count(mask):
  return jnp.maximum(jnp.sum(mask), 1)


def mae(pred, gt, mask):
  """evaluation.py:4"""
  return jnp.sum(jnp.abs(pred - gt) * mask) / _count(mask)


def max_ae(pred, gt, mask):
  """evaluation.py:8"""
  return jnp.max(jnp.abs(pred - gt) * mask)


def rmse(pred, gt, mask):
  """evaluation.py:12"""
  return jnp.sqrt(jnp.sum(jnp.square(pred - gt) * mask) / _count(mask))


def absrel(pred, gt, mask):
  """evaluation.py:16 — extra gt>0 mask is composed in."""
  m = mask & (gt > 0)
  safe_gt = jnp.where(m, gt, 1.0)
  return jnp.sum(jnp.abs(pred - gt) / safe_gt * m) / _count(m)


def sqrel(pred, gt, mask):
  """evaluation.py:21"""
  m = mask & (gt > 0)
  safe_gt = jnp.where(m, gt, 1.0)
  return jnp.sum(jnp.square(pred - gt) / jnp.square(safe_gt) * m) / _count(m)


def silog(pred, gt, mask):
  """evaluation.py:26 — sqrt-of-SILog, KITTI convention."""
  m = mask & (gt > 0) & (pred > 0)
  d = jnp.where(m, jnp.log(jnp.where(m, pred, 1.0)) -
                jnp.log(jnp.where(m, gt, 1.0)), 0.0)
  n = _count(m)
  mean_sq = jnp.sum(jnp.square(d)) / n
  sq_mean = jnp.square(jnp.sum(d) / n)
  return jnp.sqrt(jnp.maximum(mean_sq - sq_mean, 0.0))


def pixel_error_pct(th_pixel, pred, gt, mask):
  """evaluation.py:35 — % of masked pixels with |err| >= th."""
  err = jnp.abs(pred - gt)
  return 100.0 * jnp.sum((err >= th_pixel) & mask) / _count(mask)


def d1(th_pixel, th_pct, pred, gt, mask):
  """evaluation.py:40 — % with err >= th_pixel AND err >= th_pct*gt."""
  err = jnp.abs(pred - gt)
  bad = (err >= th_pixel) & (err >= th_pct * gt) & mask
  return 100.0 * jnp.sum(bad) / _count(mask)


def delta_acc(exp, pred, gt, mask):
  """evaluation.py:45 — % with max(pred/gt, gt/pred) < 1.25**exp."""
  safe_gt = jnp.where(mask & (gt != 0), gt, 1.0)
  safe_pred = jnp.where(mask & (pred != 0), pred, 1.0)
  ratio = jnp.maximum(pred / safe_gt, gt / safe_pred)
  return 100.0 * jnp.sum((ratio < 1.25 ** exp) & mask) / _count(mask)


def threshold_acc(err_pct, pred, gt, mask):
  """evaluation.py:50"""
  safe_gt = jnp.where(mask & (gt != 0), gt, 1.0)
  safe_pred = jnp.where(mask & (pred != 0), pred, 1.0)
  ratio = jnp.maximum(pred / safe_gt, gt / safe_pred)
  return 100.0 * jnp.sum((ratio < 1.0 + err_pct) & mask) / _count(mask)


def disparity_metrics(pred, gt, mask):
  """The stage-1 report row (test_disparity.py:137-143):
  MAE, RMSE, Px1, Px3, Px5, D1."""
  return {
      "MAE": mae(pred, gt, mask),
      "RMSE": rmse(pred, gt, mask),
      "Px1 (%)": pixel_error_pct(1, pred, gt, mask),
      "Px3 (%)": pixel_error_pct(3, pred, gt, mask),
      "Px5 (%)": pixel_error_pct(5, pred, gt, mask),
      "D1 (%)": d1(3, 0.05, pred, gt, mask),
  }


def depth_metrics(pred, gt, mask):
  """The stage-2 report row (test_fusion.py:92-100):
  MAE, RMSE, AbsRel, SqRel, SILog, δ1-3."""
  return {
      "MAE": mae(pred, gt, mask),
      "RMSE": rmse(pred, gt, mask),
      "AbsRel": absrel(pred, gt, mask),
      "SqRel": sqrel(pred, gt, mask),
      "SILog": silog(pred, gt, mask),
      "δ1 (%)": delta_acc(1, pred, gt, mask),
      "δ2 (%)": delta_acc(2, pred, gt, mask),
      "δ3 (%)": delta_acc(3, pred, gt, mask),
  }
