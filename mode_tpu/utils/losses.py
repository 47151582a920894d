"""Training losses.

Parity targets: the stage-1 deep-supervision smooth-L1 loss
(``/root/reference/train_disparity.py:147-163``) and the stage-2 scale-
invariant log loss (``train_fusion.py:82-87``) — expressed with masks so
shapes stay static under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_l1(pred, target, mask):
  """Masked mean smooth-L1 (beta=1), torch ``F.smooth_l1_loss`` semantics."""
  d = jnp.abs(pred - target)
  loss = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
  return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1)


def disparity_deep_supervision(preds, disp_true, mask):
  """``0.5*L(out1) + 0.7*L(out2) + 1.0*L(out3)``
  (train_disparity.py:152-158)."""
  p1, p2, p3 = preds
  return (0.5 * smooth_l1(p1, disp_true, mask) +
          0.7 * smooth_l1(p2, disp_true, mask) +
          smooth_l1(p3, disp_true, mask))


def silog_loss(lamda, pred, gt, mask):
  """Scale-invariant log loss: mean(d^2) - λ·mean(d)^2, d = log pred - log gt,
  over pixels where mask & gt>0 & pred>0 (train_fusion.py:82-87)."""
  m = mask & (gt > 0) & (pred > 0)
  n = jnp.maximum(jnp.sum(m), 1)
  d = jnp.where(m, jnp.log(jnp.where(m, pred, 1.0)) -
                jnp.log(jnp.where(m, gt, 1.0)), 0.0)
  return jnp.sum(jnp.square(d)) / n - lamda * jnp.square(jnp.sum(d) / n)
