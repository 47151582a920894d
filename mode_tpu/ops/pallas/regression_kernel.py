"""Fused disparity-regression head (Pallas TPU kernel).

The reference regresses disparity by trilinearly upsampling the cost volume
to full resolution, softmaxing over 192 disparity levels, soft-argmin, and
probing the probability volume at round(pred)±1 for the confidence map
(``/root/reference/models/mode_disparity.py:132-183``). Done literally, that
materializes a (B, 192, 1024, 512) probability volume (~1.2 GB in bf16) and
streams it through HBM several times — XLA spends ~280 ms on it.

This kernel never materializes the upsampled volume: each grid step DMAs a
small (wy, D, Wq) band of the quarter-resolution cost (~0.1 MB), expands it
in VMEM through three interpolation matmuls (exact align_corners semantics —
the matrices are the same ones the XLA path contracts with; the W expansion
for all TY output rows is ONE large MXU GEMM), and reduces the softmax /
soft-argmin / confidence into (TY, W) output tiles on the spot. HBM
traffic: the quarter-res input once + the full-res outputs once.

Confidence semantics match ``confidence_from_prob`` exactly, including the
double counting at clamped boundaries (round(pred)±1 clipped into range).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mode_tpu.ops.pallas.sphere_conv_kernel import _mxu_precision
from mode_tpu.ops.resize import linear_matrix

TY = 8  # output rows per grid step


@functools.lru_cache(maxsize=16)
def _tables(d_in: int, hq: int, wq: int, d_out: int, h: int, w: int):
  md = linear_matrix(d_out, d_in)                     # (D, d)
  mh = linear_matrix(h, hq)                           # (H, Hq)
  mx = linear_matrix(w, wq)                           # (W, Wq)
  n_ty = h // TY
  scale = (hq - 1) / (h - 1)
  wy = int(np.ceil((TY - 1) * scale)) + 2
  ys = np.empty((n_ty,), np.int32)
  mh_win = np.zeros((n_ty, TY, wy), np.float32)
  for t in range(n_ty):
    y0 = t * TY
    s = min(int(np.floor(y0 * scale)), hq - wy)
    ys[t] = s
    mh_win[t] = mh[y0:y0 + TY, s:s + wy]
  return md, mx.T, ys, mh_win, wy                     # mx.T: (Wq, W)


def _kernel(ys_ref, cost_ref, md_ref, mhw_ref, mxt_ref,
            pred_ref, conf_ref, band_ref, t1_ref, sem,
            *, d_out, wq, w, wy, dtype):
  i = pl.program_id(0)
  ty = pl.program_id(1)

  dma = pltpu.make_async_copy(
      cost_ref.at[i, pl.ds(ys_ref[ty], wy)], band_ref, sem)
  dma.start()
  dma.wait()

  # D-interp per source row: (D, d_in) @ (d_in, Wq) -> (D, Wq), D-major
  for yy in range(wy):
    t1_ref[yy] = jnp.dot(md_ref[:], band_ref[yy],
                         preferred_element_type=jnp.float32,
                         precision=_mxu_precision(dtype)).astype(dtype)

  # H-interp: scalar-weighted blends, stacked over the TY output rows
  rows = []
  for tt in range(TY):
    acc = mhw_ref[ty, tt, 0] * t1_ref[0].astype(jnp.float32)
    for yy in range(1, wy):
      acc = acc + mhw_ref[ty, tt, yy] * t1_ref[yy].astype(jnp.float32)
    rows.append(acc.astype(dtype))
  cat = jnp.concatenate(rows, axis=0)                  # (TY*D, Wq)

  # W-interp: ONE GEMM for the whole tile -> f32 logits (TY, D, W)
  logits = jnp.dot(cat, mxt_ref[:],
                   preferred_element_type=jnp.float32,
                   precision=_mxu_precision(dtype))
  logits = logits.reshape(TY, d_out, w)

  m = jnp.max(logits, axis=1, keepdims=True)
  e = jnp.exp(logits - m)
  s = jnp.sum(e, axis=1, keepdims=True)                # (TY, 1, W)
  dvec = jax.lax.broadcasted_iota(jnp.int32, (1, d_out, 1),
                                  1).astype(jnp.float32)
  pred = jnp.sum(e * dvec, axis=1, keepdims=True) / s  # (TY, 1, W)

  rp = jnp.round(pred)
  didx = jax.lax.broadcasted_iota(jnp.int32, (TY, d_out, w),
                                  1).astype(jnp.float32)
  conf_e = jnp.zeros_like(s)
  for delta in (-1.0, 0.0, 1.0):
    tap = jnp.clip(rp + delta, 0.0, d_out - 1.0)
    conf_e = conf_e + jnp.sum(jnp.where(didx == tap, e, 0.0), axis=1,
                              keepdims=True)
  pred_ref[0] = pred[:, 0, :]
  conf_ref[0] = (conf_e / s)[:, 0, :]


def fused_disparity_regression(cost_q: jnp.ndarray, maxdisp: int,
                               h: int, w: int, *, ys=None, mh_win=None,
                               h_out: int | None = None
                               ) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Fused upsample + softmax + soft-argmin + confidence.

  Args:
    cost_q: (N, D, Hq, Wq) quarter-resolution cost logits (channel
      squeezed), float32 or bfloat16. D must be a multiple of 8 and Wq a
      multiple of 128 (the production 48 / 128).
    maxdisp / h / w: full-resolution target sizes.
    ys, mh_win, h_out: optional shard-local row-window tables (a slice of
      this function's own global tables) — the SPMD wrapper
      (``parallel/shard_ops.py``) passes each device's window so it emits
      only its ``h_out`` rows of the full-``h`` output.
  Returns:
    (pred, conf), each (N, h_out or h, w) float32.
  """
  n, d_in, hq, wq = cost_q.shape
  md, mx_t, ys_g, mh_g, wy = _tables(d_in, hq, wq, maxdisp, h, w)
  if ys is None:
    ys, mh_win = jnp.asarray(ys_g), jnp.asarray(mh_g)
    h_out = h
  assert h_out % TY == 0 and d_in % 8 == 0 and wq % 128 == 0
  dtype = cost_q.dtype

  # layout (N, Hq, D, Wq): dynamic H-window on an untiled major dim,
  # lane-aligned Wq minor dim for the band DMA
  cost_hdw = jnp.swapaxes(cost_q, 1, 2)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(n, h_out // TY),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((maxdisp, d_in), lambda i, t, *_: (0, 0)),
          pl.BlockSpec((h_out // TY, TY, wy), lambda i, t, *_: (0, 0, 0)),
          pl.BlockSpec((wq, w), lambda i, t, *_: (0, 0)),
      ],
      out_specs=[
          pl.BlockSpec((1, TY, w), lambda i, t, *_: (i, t, 0)),
          pl.BlockSpec((1, TY, w), lambda i, t, *_: (i, t, 0)),
      ],
      scratch_shapes=[
          pltpu.VMEM((wy, d_in, wq), dtype),
          pltpu.VMEM((wy, maxdisp, wq), dtype),
          pltpu.SemaphoreType.DMA,
      ],
  )
  kernel = functools.partial(_kernel, d_out=maxdisp, wq=wq, w=w, wy=wy,
                             dtype=dtype)
  pred, conf = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=[jax.ShapeDtypeStruct((n, h_out, w), jnp.float32),
                 jax.ShapeDtypeStruct((n, h_out, w), jnp.float32)],
      cost_estimate=pl.CostEstimate(
          flops=2 * n * h_out * w * maxdisp * (wq // 16),
          bytes_accessed=cost_q.size * 4 + 2 * n * h_out * w * 4,
          transcendentals=n * h_out * w * maxdisp),
  )(ys, cost_hdw,
    jnp.asarray(md).astype(dtype),            # (D, d_in)
    mh_win,
    jnp.asarray(mx_t).astype(dtype))
  return pred, conf
