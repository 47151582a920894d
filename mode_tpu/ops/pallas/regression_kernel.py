"""Fused disparity-regression head (Pallas TPU kernel).

The reference regresses disparity by trilinearly upsampling the cost volume
to full resolution, softmaxing over 192 disparity levels, soft-argmin, and
probing the probability volume at round(pred)±1 for the confidence map
(``/root/reference/models/mode_disparity.py:132-183``). Done literally, that
materializes a (B, 192, 1024, 512) probability volume (~1.2 GB in bf16) and
streams it through HBM several times — XLA spends ~280 ms on it.

This kernel never materializes the upsampled volume: each grid step DMAs a
small (wy, Wq, D) band of the quarter-resolution cost (~0.3 MB), expands it
in VMEM through three interpolation matmuls (exact align_corners semantics —
the matrices are the same ones the XLA path contracts with), and reduces the
softmax / soft-argmin / confidence into two (TY, W) output tiles on the
spot. HBM traffic: the quarter-res input once + the full-res outputs once.

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

from mode_tpu.ops.resize import linear_matrix

TY = 8       # output rows per grid step
DPAD = 128   # cost depth padded so the DMA minor dim is lane-aligned


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
  md_pad = np.zeros((DPAD, d_out), np.float32)
  md_pad[:d_in] = md.T                                # (DPAD, D)
  return md_pad, mx, ys, mh_win, wy                   # mx: (W, Wq)


def _kernel(ys_ref, cost_ref, mdp_ref, mhw_ref, mxw_ref,
            pred_ref, conf_ref, band_ref, t1_ref, sem,
            *, d_out, wq, w, wy, dtype):
  i = pl.program_id(0)
  ty = pl.program_id(1)

  dma = pltpu.make_async_copy(
      cost_ref.at[i, pl.ds(ys_ref[ty], wy)], band_ref, sem)
  dma.start()
  dma.wait()

  # D-interp per source row: (Wq, DPAD) @ (DPAD, D)
  for yy in range(wy):
    t1_ref[yy] = jnp.dot(band_ref[yy], mdp_ref[:],
                         preferred_element_type=jnp.float32).astype(dtype)

  didx = jax.lax.broadcasted_iota(jnp.int32, (w, d_out),
                                  1).astype(jnp.float32)
  for tt in range(TY):                     # one full-res output row each
    # H-interp: scalar-weighted blend of the source rows
    acc = mhw_ref[ty, tt, 0] * t1_ref[0].astype(jnp.float32)
    for yy in range(1, wy):
      acc = acc + mhw_ref[ty, tt, yy] * t1_ref[yy].astype(jnp.float32)
    # W-interp: (W, Wq) @ (Wq, D) -> f32 logits with D on lanes
    logits = jnp.dot(mxw_ref[:], acc.astype(dtype),
                     preferred_element_type=jnp.float32)   # (W, D)

    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    sm = jnp.sum(e, axis=-1, keepdims=True)                # (W, 1)
    pred = jnp.sum(e * didx, axis=-1, keepdims=True) / sm  # (W, 1)

    rp = jnp.round(pred)
    conf_e = jnp.zeros_like(sm)
    for delta in (-1.0, 0.0, 1.0):
      tap = jnp.clip(rp + delta, 0.0, d_out - 1.0)
      conf_e = conf_e + jnp.sum(jnp.where(didx == tap, e, 0.0), axis=-1,
                                keepdims=True)
    pred_ref[0, tt] = pred[:, 0]
    conf_ref[0, tt] = (conf_e / sm)[:, 0]


def fused_disparity_regression(cost_q: jnp.ndarray, maxdisp: int,
                               h: int, w: int
                               ) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Fused upsample + softmax + soft-argmin + confidence.

  Args:
    cost_q: (N, D, Hq, Wq) quarter-resolution cost logits (channel
      squeezed), float32 or bfloat16.
    maxdisp / h / w: full-resolution target sizes.
  Returns:
    (pred, conf), each (N, h, w) float32.
  """
  n, d_in, hq, wq = cost_q.shape
  assert h % TY == 0 and d_in <= DPAD
  md_pad, mx_w, ys, mh_win, wy = _tables(d_in, hq, wq, maxdisp, h, w)
  dtype = cost_q.dtype

  # host layout (N, Hq, Wq, DPAD): dynamic H-window on an untiled major dim,
  # lane-aligned minor dim for the band DMA
  cost_hwd = jnp.transpose(cost_q, (0, 2, 3, 1))
  cost_hwd = jnp.pad(cost_hwd, ((0, 0), (0, 0), (0, 0),
                                (0, DPAD - d_in)))

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(n, h // TY),
      in_specs=[
          pl.BlockSpec(memory_space=pltpu.ANY),
          pl.BlockSpec((DPAD, maxdisp), lambda i, t, *_: (0, 0)),
          pl.BlockSpec((h // TY, TY, wy), lambda i, t, *_: (0, 0, 0)),
          pl.BlockSpec((w, wq), lambda i, t, *_: (0, 0)),
      ],
      out_specs=[
          pl.BlockSpec((1, TY, w), lambda i, t, *_: (i, t, 0)),
          pl.BlockSpec((1, TY, w), lambda i, t, *_: (i, t, 0)),
      ],
      scratch_shapes=[
          pltpu.VMEM((wy, wq, DPAD), dtype),
          pltpu.VMEM((wy, wq, maxdisp), dtype),
          pltpu.SemaphoreType.DMA,
      ],
  )
  kernel = functools.partial(_kernel, d_out=maxdisp, wq=wq, w=w, wy=wy,
                             dtype=dtype)
  pred, conf = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=[jax.ShapeDtypeStruct((n, h, w), jnp.float32),
                 jax.ShapeDtypeStruct((n, h, w), jnp.float32)],
      cost_estimate=pl.CostEstimate(
          flops=2 * n * h * w * maxdisp * (wq // 16),
          bytes_accessed=cost_q.size * 4 + 2 * n * h * w * 4,
          transcendentals=n * h * w * maxdisp),
  )(jnp.asarray(ys), cost_hwd.astype(dtype),
    jnp.asarray(md_pad).astype(dtype),
    jnp.asarray(mh_win),
    jnp.asarray(mx_w).astype(dtype))
  return pred, conf
