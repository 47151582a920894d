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
gathers), the kernel works in a *lane-major* (N, W, C, H) layout — each
input column is a (C, H) tile with the panorama's H=256 axis on lanes, so
every vreg is fully utilized and the circular shifts are lane rotates:

  1. per grid step, DMA only the block's column band (bj+4 columns,
     ~0.4 MB) from HBM into VMEM — tap columns stay within ±2 of the
     output column, so the image itself never occupies VMEM;
  2. mix the two integer column neighbours with their bilinear weights
     (one VPU axpy; the dynamic column index is on an untiled major dim);
  3. realize the fractional row shift with the "premix" trick — blend each
     source row with its successor once (STATIC lane rotate), then ONE
     dynamic lane rotate (``pltpu.roll``) gives the bilinear row
     interpolation; the CUDA kernel's un-wrapped seam (continuous position
     H is dropped, not wrapped — ``sphere_conv_cuda_kernel.cu:246``) is the
     static source row H-1 whose wrapped successor must not contribute,
     plus per-(j,k) rows where the f32 position table rounds to exactly H
     (whole-sample drop);
  4. accumulate the 9 taps into a (9·C, BJ·H) im2col tile and fire ONE MXU
     GEMM against the flattened weights per column block.
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
                               or -1 (f32 table rounded to exactly H there).
  """
  pos = gen_sphere_positions(h, w, k, k, "Cassini")   # (K, H, W, 2)
  delta = pos[:, 0, :, 0].astype(np.float64)          # Δ mod H at i=0
  sigma = np.floor(delta).astype(np.int64) % h
  row_w = (delta - np.floor(delta)).astype(np.float32)

  at_h = pos[:, :, :, 0] >= h                         # (K, H, W)
  drop_row = np.where(at_h.any(axis=1), at_h.argmax(axis=1), -1)  # (K, W)

  cols = pos[:, 0, :, 1].astype(np.float64)           # (K, W)
  c0 = np.floor(cols)
  wc = (cols - c0).astype(np.float32)
  ok0 = (c0 >= 0) & (c0 < w)
  ok1 = (c0 + 1 >= 0) & (c0 + 1 < w)
  wc0 = np.where(ok0, 1.0 - wc, 0.0)
  wc1 = np.where(ok1, wc, 0.0)
  # fused bilinear coefficients: contribution of (column, rolled-column)
  # pairs — the static successor roll is hoisted out of the tap loop, so
  # mix = roll(q0·B[c0] + q1·BR[c0] + q2·B[c1] + q3·BR[c1], H-σ)
  quad = np.stack([
      wc0 * (1.0 - row_w),
      wc0 * row_w,
      wc1 * (1.0 - row_w),
      wc1 * row_w,
  ], axis=-1).astype(np.float32)                      # (K, W, 4)
  colint = np.stack([np.clip(c0, 0, w - 1),
                     np.clip(c0 + 1, 0, w - 1)],
                    axis=-1).astype(np.float32)       # (K, W, 2)

  return (np.ascontiguousarray(sigma.T.astype(np.int32)),      # (W, K)
          np.ascontiguousarray(colint.transpose(1, 0, 2)),      # (W, K, 2)
          np.ascontiguousarray(quad.transpose(1, 0, 2)),        # (W, K, 4)
          np.ascontiguousarray(drop_row.T.astype(np.int32)))    # (W, K)


def _kernel(sigma_ref, colint_ref, quad_ref, drop_ref,    # prefetch
            x_ref, w_ref, o_ref,                          # tensors
            band_ref, bandr_ref, col_ref, acc_ref, sem,   # scratch
            *, h, cin, cout, kk, bj):
  i = pl.program_id(0)
  jb = pl.program_id(1)

  # DMA this block's column band (bj + 4 columns of the 2-padded image).
  dma = pltpu.make_async_copy(
      x_ref.at[i, pl.ds(jb * bj, bj + 4)], band_ref, sem)
  dma.start()

  lanes = jax.lax.broadcasted_iota(jnp.int32, (cin, h), 1)
  dma.wait()

  # hoist the static successor roll: BR[c][i] = B[c][i+1], with the seam
  # source row H-1 zeroed (its successor wrapped to row 0 must not
  # contribute — CUDA's un-wrapped seam corner)
  for c in range(bj + 4):
    nxt = pltpu.roll(band_ref[c].astype(jnp.float32), h - 1, axis=1)
    bandr_ref[c] = jnp.where(lanes == h - 1, 0.0,
                             nxt).astype(bandr_ref.dtype)

  def column(jj, _):
    j = jb * bj + jj
    col0 = pl.multiple_of(jj * h, h)
    base = jb * bj - 2                      # band-relative column offset
    for k in range(kk):                     # unrolled: 9 taps
      c0 = colint_ref[j, 2 * k] - base
      c1 = colint_ref[j, 2 * k + 1] - base
      q0 = quad_ref[j, 4 * k]
      q1 = quad_ref[j, 4 * k + 1]
      q2 = quad_ref[j, 4 * k + 2]
      q3 = quad_ref[j, 4 * k + 3]
      sig = sigma_ref[j, k]
      drop = drop_ref[j, k]

      premix = (q0 * band_ref[c0].astype(jnp.float32) +
                q1 * bandr_ref[c0].astype(jnp.float32) +
                q2 * band_ref[c1].astype(jnp.float32) +
                q3 * bandr_ref[c1].astype(jnp.float32))   # (C, H)
      mix = pltpu.roll(premix, h - sig, axis=1)           # dynamic rotate
      mix = jnp.where(lanes == drop, 0.0, mix)            # drop-at-H rows
      col_ref[pl.ds(k * cin, cin), pl.ds(col0, h)] = mix.astype(
          col_ref.dtype)
    return 0

  jax.lax.fori_loop(0, bj, column, 0)

  acc_ref[:] = jnp.dot(w_ref[:], col_ref[:],
                       preferred_element_type=jnp.float32)  # (Cout, BJ*H)
  for jj in range(bj):
    o_ref[0, jj] = acc_ref[:, jj * h:(jj + 1) * h].astype(o_ref.dtype)


def sphere_conv_cassini_pallas(x: jnp.ndarray, weight: jnp.ndarray,
                               block_j: int = 8) -> jnp.ndarray:
  """Spherical conv forward, Pallas fast path.

  Args:
    x: (N, H, W, C) Cassini feature map (H = 2W), float32 or bfloat16,
       C a multiple of 8.
    weight: (Kh, Kw, Cin, Cout), square odd kernel, stride 1, dense output.
  Returns:
    (N, H, W, Cout) in x.dtype.
  """
  n, h, w, cin = x.shape
  kh, kw, wcin, cout = weight.shape
  assert kh == kw and wcin == cin and h == 2 * w
  assert cin % 8 == 0, cin
  kk = kh * kw
  assert w % block_j == 0, (w, block_j)

  sigma, colint_t, quad_t, drop_row = build_shift_tables(h, w, kh)
  colint = colint_t.reshape(w, 2 * kk).astype(np.int32)
  wquad = quad_t.reshape(w, 4 * kk).astype(np.float32)

  # lane-major: (N, W+4, C, H), H on lanes; ±2-column pad for the bands
  x_wch = jnp.transpose(x, (0, 2, 3, 1))
  x_wch = jnp.pad(x_wch, ((0, 0), (2, 2), (0, 0), (0, 0)))
  wmat_t = weight.reshape(kk * cin, cout).T.astype(x.dtype)  # (Cout, K*C)

  itemsize = jnp.dtype(x.dtype).itemsize

  def vmem_bytes(bj):
    return (2 * (bj + 4) * cin * h * itemsize +     # column band + rolled
            kk * cin * bj * h * itemsize +          # im2col scratch
            4 * cout * bj * h +                     # f32 accumulator
            3 * bj * cout * h * itemsize +          # output block x3
            2 * cout * kk * cin * itemsize)         # weights x2

  while vmem_bytes(block_j) > 11 * 2**20 and block_j > 2:
    block_j //= 2

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=4,
      grid=(n, w // block_j),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((cout, kk * cin), lambda i, j, *_: (0, 0)),
      ],
      out_specs=pl.BlockSpec((1, block_j, cout, h),
                             lambda i, j, *_: (i, j, 0, 0)),
      scratch_shapes=[
          pltpu.VMEM((block_j + 4, cin, h), x.dtype),
          pltpu.VMEM((block_j + 4, cin, h), x.dtype),
          pltpu.VMEM((kk * cin, block_j * h), x.dtype),
          pltpu.VMEM((cout, block_j * h), jnp.float32),
          pltpu.SemaphoreType.DMA,
      ],
  )

  kernel = functools.partial(_kernel, h=h, cin=cin, cout=cout, kk=kk,
                             bj=block_j)
  flops = 2 * n * h * w * kk * cin * cout
  out_wch = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((n, w, cout, h), x.dtype),
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=x.size * itemsize * 2,
          transcendentals=0),
  )(jnp.asarray(sigma), jnp.asarray(colint), jnp.asarray(wquad),
    jnp.asarray(drop_row), x_wch, wmat_t)
  return jnp.transpose(out_wch, (0, 3, 1, 2))
