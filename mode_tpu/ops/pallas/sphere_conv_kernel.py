"""Pallas TPU kernel for the spherical convolution (Cassini, stride 1).

Structure exploited (provable from the position construction,
``/root/reference/models/basic/spherical_conv/sphere_conv.py:180-237``):
on a Cassini panorama the gnomonic tap position for output pixel (i, j),
tap k is

  * row coordinate  = (i + Δ[j,k]) mod H   — a fractional *circular row
    shift* that depends only on the output column j and the tap;
  * col coordinate  = c[j,k]               — row-independent, within ±2
    columns of j.

So instead of a 4-corner gather per pixel (the XLA path lowers to slow TPU
gathers), the kernel works in a column-major (N, W, H, C) layout where each
input column is an (H, C) tile (H on sublanes, C on lanes):

  1. mix the two integer column neighbours with their bilinear weights
     (one VPU axpy; the dynamic column index is on an untiled major dim);
  2. realize the fractional row shift as two dynamic circular rotates
     (``pltpu.roll``) weighted (1-wr, wr); the CUDA kernel's un-wrapped seam
     corner (continuous position H is dropped, not wrapped —
     ``sphere_conv_cuda_kernel.cu:246``) is reproduced by zeroing the single
     wrapped row of the σ+1 rotate;
  3. accumulate the 9 taps into an (BJ·H, 9·C) im2col tile in VMEM and fire
     ONE MXU GEMM against the flattened weights per column block.

Latitude out-of-range corners carry zero weight in the precomputed tables
(the poles), matching the zero-padding semantics of the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mode_tpu.ops.sphere_conv import gen_sphere_positions


@functools.lru_cache(maxsize=32)
def build_shift_tables(h: int, w: int, k: int
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                  np.ndarray]:
  """Compact per-(column, tap) tables for the Cassini sphere conv.

  Returns (sigma, row_w, col_tab, drop_row):
    sigma    int32 (W, K)    — integer circular row shift ⌊Δ⌋ mod H
    row_w    f32   (W, K)    — fractional row weight wr = frac(Δ)
    col_tab  f32   (W, K, 4) — [c0, c1, w_c0, w_c1] column pair + weights
                               (weights zeroed for out-of-range columns)
    drop_row int32 (W, K)    — output row whose ENTIRE sample is dropped,
                               or -1. The float32 position table can round
                               to exactly H at the wrap row (e.g. 63.99999…
                               → 64.0), and the CUDA bounds gate then
                               rejects the whole sample
                               (sphere_conv_cuda_kernel.cu:246) — a case the
                               shift model cannot represent otherwise.
  """
  pos = gen_sphere_positions(h, w, k, k, "Cassini")   # (K, H, W, 2)
  delta = pos[:, 0, :, 0].astype(np.float64)          # Δ mod H at i=0
  sigma = np.floor(delta).astype(np.int64) % h
  row_w = (delta - np.floor(delta)).astype(np.float32)

  # scan the actual f32 table for rows whose position reaches exactly H
  at_h = pos[:, :, :, 0] >= h                         # (K, H, W)
  drop_row = np.where(at_h.any(axis=1), at_h.argmax(axis=1), -1)  # (K, W)

  cols = pos[:, 0, :, 1].astype(np.float64)           # (K, W)
  c0 = np.floor(cols)
  wc = (cols - c0).astype(np.float32)
  ok0 = (c0 >= 0) & (c0 < w)
  ok1 = (c0 + 1 >= 0) & (c0 + 1 < w)
  col_tab = np.stack([
      np.clip(c0, 0, w - 1),
      np.clip(c0 + 1, 0, w - 1),
      np.where(ok0, 1.0 - wc, 0.0),
      np.where(ok1, wc, 0.0),
  ], axis=-1).astype(np.float32)                      # (K, W, 4)

  return (np.ascontiguousarray(sigma.T.astype(np.int32)),      # (W, K)
          np.ascontiguousarray(row_w.T),                        # (W, K)
          np.ascontiguousarray(col_tab.transpose(1, 0, 2)),     # (W, K, 4)
          np.ascontiguousarray(drop_row.T.astype(np.int32)))    # (W, K)


def _kernel(sigma_ref, colint_ref, wrow_ref, wcol_ref, drop_ref,  # prefetch
            x_ref, w_ref, o_ref,                          # tensors
            col_ref, acc_ref,                             # scratch
            *, h, cin, cout, kk, bj, cslot):
  i = pl.program_id(0)
  jb = pl.program_id(1)

  # zero the im2col scratch once: padded slot lanes are never rewritten
  @pl.when(jnp.logical_and(i == 0, jb == 0))
  def _():
    col_ref[:] = jnp.zeros_like(col_ref)

  rows = jax.lax.broadcasted_iota(jnp.int32, (h, cin), 0)
  for jj in range(bj):                      # unrolled: bj is small
    j = jb * bj + jj
    for k in range(kk):                     # unrolled: 9 taps
      c0 = colint_ref[j, 2 * k]
      c1 = colint_ref[j, 2 * k + 1]
      wc0 = wcol_ref[j, 2 * k]
      wc1 = wcol_ref[j, 2 * k + 1]
      sig = sigma_ref[j, k]
      wr = wrow_ref[j, k]
      drop = drop_ref[j, k]

      colmix = (wc0 * x_ref[0, c0].astype(jnp.float32) +
                wc1 * x_ref[0, c1].astype(jnp.float32))   # (H, C)
      # "premix" trick: blend each source row with its successor ONCE
      # (static roll), then ONE dynamic roll realizes the bilinear row
      # interpolation:  roll(premix, H-σ)[i] =
      #   (1-wr)·colmix[(i+σ) mod H] + wr·colmix[(i+σ+1) mod H].
      # The CUDA seam (position exactly H is dropped, not wrapped —
      # sphere_conv_cuda_kernel.cu:246) is the static source row H-1,
      # whose wrapped successor (row 0) must not contribute.
      nxt = pltpu.roll(colmix, h - 1, axis=0)
      nxt = jnp.where(rows == h - 1, 0.0, nxt)
      premix = (1.0 - wr) * colmix + wr * nxt
      mix = pltpu.roll(premix, h - sig, axis=0)
      # whole-sample drop where the f32 table rounded to exactly H
      mix = jnp.where(rows == drop, 0.0, mix)
      col_ref[pl.ds(jj * h, h), pl.ds(k * cslot, cin)] = mix.astype(
          col_ref.dtype)

  acc_ref[:] = jnp.dot(col_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32)
  o_ref[0] = acc_ref[:].reshape(bj, h, cout).astype(o_ref.dtype)


def sphere_conv_cassini_pallas(x: jnp.ndarray, weight: jnp.ndarray,
                               block_j: int = 8) -> jnp.ndarray:
  """Spherical conv forward, Pallas fast path.

  Args:
    x: (N, H, W, C) Cassini feature map (H = 2W), float32 or bfloat16.
    weight: (Kh, Kw, Cin, Cout), square odd kernel, stride 1, dense output.
  Returns:
    (N, H, W, Cout) in x.dtype.
  """
  n, h, w, cin = x.shape
  kh, kw, wcin, cout = weight.shape
  assert kh == kw and wcin == cin and h == 2 * w
  kk = kh * kw
  assert w % block_j == 0, (w, block_j)

  sigma, row_w, col_tab, drop_row = build_shift_tables(h, w, kh)
  colint = np.stack([col_tab[..., 0], col_tab[..., 1]],
                    -1).reshape(w, 2 * kk).astype(np.int32)
  wcol = np.stack([col_tab[..., 2], col_tab[..., 3]],
                  -1).reshape(w, 2 * kk).astype(np.float32)

  x_whc = jnp.swapaxes(x, 1, 2)             # (N, W, H, C): column-major

  # pad each tap's im2col slot to a lane-aligned width so the per-tap
  # stores are full-tile (misaligned 64-lane stores cost masked RMWs);
  # the weight rows for the padding are zero.
  cslot = max(128, cin) if cin % 128 else cin
  itemsize = jnp.dtype(x.dtype).itemsize
  while (h * w * cin + block_j * h * kk * cslot) * itemsize > 13 * 2**20 \
      and block_j > 4:
    block_j //= 2
  wmat = jnp.zeros((kk, cslot, cout), x.dtype)
  wmat = wmat.at[:, :cin].set(weight.reshape(kk, cin, cout).astype(x.dtype))
  wmat = wmat.reshape(kk * cslot, cout)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=5,
      grid=(n, w // block_j),
      in_specs=[
          pl.BlockSpec((1, w, h, cin), lambda i, j, *_: (i, 0, 0, 0)),
          pl.BlockSpec((kk * cslot, cout), lambda i, j, *_: (0, 0)),
      ],
      out_specs=pl.BlockSpec((1, block_j, h, cout),
                             lambda i, j, *_: (i, j, 0, 0)),
      scratch_shapes=[
          pltpu.VMEM((block_j * h, kk * cslot), x.dtype),
          pltpu.VMEM((block_j * h, cout), jnp.float32),
      ],
  )

  kernel = functools.partial(_kernel, h=h, cin=cin, cout=cout, kk=kk,
                             bj=block_j, cslot=cslot)
  flops = 2 * n * h * w * kk * cin * cout
  out_whc = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((n, w, h, cout), x.dtype),
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=x.size * x.dtype.itemsize * kk,
          transcendentals=0),
  )(jnp.asarray(sigma), jnp.asarray(colint), jnp.asarray(row_w),
    jnp.asarray(wcol), jnp.asarray(drop_row), x_whc, wmat)
  return jnp.swapaxes(out_whc, 1, 2)
