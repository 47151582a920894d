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
  4. per output column, accumulate the 9 taps' (Cout, Cin) @ (Cin, H) MXU
     GEMMs in registers — no im2col staging buffer (the forward used to
     stage a (9·C, BJ·H) tile; dropping it removed ~9 MB of VMEM traffic
     per block). The backward-weight kernel still stages the tile (it
     contracts the whole block against the cotangent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mode_tpu.ops.sphere_conv import gen_sphere_positions


def _mxu_precision(dtype):
  """HIGHEST keeps f32 operands exact on the MXU (multi-pass, needed for
  checkpoint parity); Mosaic rejects an fp32 contract precision on bf16
  vectors, so bf16 uses the (natively exact-for-bf16) default."""
  return (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else
          jax.lax.Precision.DEFAULT)


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


def _unpack(packed):
  """Split a 16|16-bit packed scalar (both halves non-negative)."""
  return packed & 0xffff, packed >> 16


def _kernel(sd_ref, cols_ref, quad_ref,                   # prefetch (packed)
            x_ref, w_ref, o_ref,                          # tensors
            band_ref, bandr_ref, sem,                     # scratch
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

  prec = _mxu_precision(w_ref.dtype)

  def column(jj, _):
    j = jb * bj + jj
    base = jb * bj - 2                      # band-relative column offset
    acc = None
    for k in range(kk):                     # unrolled: 9 taps
      c0, c1 = _unpack(cols_ref[j, k])
      c0 = c0 - base
      c1 = c1 - base
      q0 = quad_ref[j, 4 * k]
      q1 = quad_ref[j, 4 * k + 1]
      q2 = quad_ref[j, 4 * k + 2]
      q3 = quad_ref[j, 4 * k + 3]
      sig, dropp = _unpack(sd_ref[j, k])
      drop = dropp - 1                      # stored +1 (SMEM is 16|16 packed)

      premix = (q0 * band_ref[c0].astype(jnp.float32) +
                q1 * bandr_ref[c0].astype(jnp.float32) +
                q2 * band_ref[c1].astype(jnp.float32) +
                q3 * bandr_ref[c1].astype(jnp.float32))   # (C, H)
      mix = pltpu.roll(premix, h - sig, axis=1)           # dynamic rotate
      mix = jnp.where(lanes == drop, 0.0, mix)            # drop-at-H rows
      # accumulate the tap's GEMM in registers — no im2col staging
      z = jnp.dot(w_ref[k], mix.astype(w_ref.dtype),
                  preferred_element_type=jnp.float32,
                  precision=prec)                         # (Cout, H)
      acc = z if acc is None else acc + z
    o_ref[0, jj] = acc.astype(o_ref.dtype)
    return 0

  jax.lax.fori_loop(0, bj, column, 0)


@functools.lru_cache(maxsize=32)
def build_shift_tables_erp(h: int, w: int, k: int
                           ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                      np.ndarray]:
  """ERP mirror of :func:`build_shift_tables` — the roles of the two image
  axes swap: rows form the ±2 band (latitude, non-wrapping: out-of-range
  corners get zero weight), columns are the wrapped lane axis with per-(row,
  tap) circular shifts, and the f32 exact-``w`` rounding case drops the
  whole sample at one output column (the reference pre-wraps longitude mod
  width, so a corner at exactly ``w`` is out of range —
  ``sphere_conv.py:225``, ``sphere_conv_cuda_kernel.cu:246``).

  Returns (sigma, rowint, quad, drop_col), each indexed by output ROW:
    sigma   int32 (H, K), rowint f32 (H, K, 2), quad f32 (H, K, 4),
    drop_col int32 (H, K).
  """
  pos = gen_sphere_positions(h, w, k, k, "ERP")     # (K, H, W, 2)
  delta = pos[:, :, 0, 1].astype(np.float64)        # column shift at j=0
  sigma = np.floor(delta).astype(np.int64) % w
  frac = (delta - np.floor(delta)).astype(np.float32)

  at_w = pos[:, :, :, 1] >= w                       # (K, H, W)
  drop_col = np.where(at_w.any(axis=2), at_w.argmax(axis=2), -1)  # (K, H)

  rows = pos[:, :, 0, 0].astype(np.float64)         # (K, H)
  r0 = np.floor(rows)
  wr = (rows - r0).astype(np.float32)
  ok0 = (r0 >= 0) & (r0 < h)
  ok1 = (r0 + 1 >= 0) & (r0 + 1 < h)
  wr0 = np.where(ok0, 1.0 - wr, 0.0)
  wr1 = np.where(ok1, wr, 0.0)
  quad = np.stack([wr0 * (1.0 - frac), wr0 * frac,
                   wr1 * (1.0 - frac), wr1 * frac],
                  axis=-1).astype(np.float32)        # (K, H, 4)
  rowint = np.stack([np.clip(r0, 0, h - 1), np.clip(r0 + 1, 0, h - 1)],
                    axis=-1).astype(np.float32)      # (K, H, 2)

  return (np.ascontiguousarray(sigma.T.astype(np.int32)),       # (H, K)
          np.ascontiguousarray(rowint.transpose(1, 0, 2)),       # (H, K, 2)
          np.ascontiguousarray(quad.transpose(1, 0, 2)),         # (H, K, 4)
          np.ascontiguousarray(drop_col.T.astype(np.int32)))     # (H, K)


def _pack_tables(sigma, pairint_t, quad_t, drop, band, kk):
  """Pack the per-(band index, tap) scalars into SMEM-lean arrays:
  16|16-bit (c0 | c1<<16) and (sigma | (drop+1)<<16) words — at band=512
  the unpacked tables overflow the 1 MB SMEM budget by ~1 KB."""
  c0 = pairint_t[..., 0].astype(np.int32)
  c1 = pairint_t[..., 1].astype(np.int32)
  cols = (c0 | (c1 << 16)).astype(np.int32)                    # (band, K)
  sd = (sigma.astype(np.int32) |
        ((drop.astype(np.int32) + 1) << 16)).astype(np.int32)  # (band, K)
  quad = quad_t.reshape(band, 4 * kk).astype(np.float32)
  return (jnp.asarray(sd), jnp.asarray(cols), jnp.asarray(quad))


def _run_lane_major(x_bcl, wmat_t, tables, *, n, band, lanes, cin, cout, kk,
                    block_j, dtype):
  """Launch :func:`_kernel` on a lane-major image ``(N, band+4, C, lanes)``
  with per-(band index, tap) ``tables``; returns ``(N, band, Cout, lanes)``.
  Cassini maps (band, lanes) = (W, H); ERP maps (band, lanes) = (H, W).
  ``wmat_t`` is (kk, Cout, Cin)."""
  itemsize = jnp.dtype(dtype).itemsize

  def vmem_bytes(bj):
    return (2 * (bj + 4) * cin * lanes * itemsize +  # band + rolled band
            4 * cout * lanes +                       # f32 accumulator
            3 * bj * cout * lanes * itemsize +       # output block x3
            2 * cout * kk * cin * itemsize)          # weights x2

  while vmem_bytes(block_j) > 11 * 2**20 and block_j > 2:
    block_j //= 2
  assert band % block_j == 0, (band, block_j)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=3,
      grid=(n, band // block_j),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((kk, cout, cin), lambda i, j, *_: (0, 0, 0)),
      ],
      out_specs=pl.BlockSpec((1, block_j, cout, lanes),
                             lambda i, j, *_: (i, j, 0, 0)),
      scratch_shapes=[
          pltpu.VMEM((block_j + 4, cin, lanes), dtype),
          pltpu.VMEM((block_j + 4, cin, lanes), dtype),
          pltpu.SemaphoreType.DMA,
      ],
  )

  kernel = functools.partial(_kernel, h=lanes, cin=cin, cout=cout, kk=kk,
                             bj=block_j)
  flops = 2 * n * band * lanes * kk * cin * cout
  return pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((n, band, cout, lanes), dtype),
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=x_bcl.size * itemsize * 2,
          transcendentals=0),
  )(*tables, x_bcl, wmat_t)


def sphere_conv_cassini_pallas(x: jnp.ndarray, weight: jnp.ndarray,
                               block_j: int = 8) -> jnp.ndarray:
  """Spherical conv forward, Pallas fast path (Cassini layout).

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

  sigma, colint_t, quad_t, drop_row = build_shift_tables(h, w, kh)
  tables = _pack_tables(sigma, colint_t, quad_t, drop_row, w, kk)

  # lane-major: (N, W+4, C, H), H on lanes; ±2-column pad for the bands
  x_wch = jnp.transpose(x, (0, 2, 3, 1))
  x_wch = jnp.pad(x_wch, ((0, 0), (2, 2), (0, 0), (0, 0)))
  wmat_t = jnp.transpose(weight.reshape(kk, cin, cout),
                         (0, 2, 1)).astype(x.dtype)      # (K, Cout, Cin)

  out_wch = _run_lane_major(x_wch, wmat_t, tables, n=n, band=w, lanes=h,
                            cin=cin, cout=cout, kk=kk, block_j=block_j,
                            dtype=x.dtype)
  return jnp.transpose(out_wch, (0, 3, 1, 2))


def sphere_conv_erp_pallas(x: jnp.ndarray, weight: jnp.ndarray,
                           block_j: int = 8) -> jnp.ndarray:
  """Spherical conv forward, Pallas fast path (ERP layout).

  The transpose of the Cassini kernel: rows are the ±2 band, the panorama's
  W axis rides the lanes with per-(row, tap) circular shifts.

  Args:
    x: (N, H, W, C) ERP feature map (W = 2H), float32 or bfloat16,
       C a multiple of 8.
  Returns:
    (N, H, W, Cout) in x.dtype.
  """
  n, h, w, cin = x.shape
  kh, kw, wcin, cout = weight.shape
  assert kh == kw and wcin == cin and w == 2 * h
  assert cin % 8 == 0, cin
  kk = kh * kw

  sigma, rowint_t, quad_t, drop_col = build_shift_tables_erp(h, w, kh)
  tables = _pack_tables(sigma, rowint_t, quad_t, drop_col, h, kk)

  # lane-major: (N, H+4, C, W), W on lanes; ±2-row pad for the bands
  x_hcw = jnp.transpose(x, (0, 1, 3, 2))
  x_hcw = jnp.pad(x_hcw, ((0, 0), (2, 2), (0, 0), (0, 0)))
  wmat_t = jnp.transpose(weight.reshape(kk, cin, cout),
                         (0, 2, 1)).astype(x.dtype)

  out_hcw = _run_lane_major(x_hcw, wmat_t, tables, n=n, band=h, lanes=w,
                            cin=cin, cout=cout, kk=kk, block_j=block_j,
                            dtype=x.dtype)
  return jnp.transpose(out_hcw, (0, 1, 3, 2))


# ---------------------------------------------------------------------------
# Backward kernels. The forward's structure transposes exactly (the CUDA
# counterpart is the col2im scatter, ``sphere_conv_cuda_kernel.cu:294-356``,
# which needs atomicAdd; here every contribution has a static home, so the
# transpose is deterministic by construction):
#
#   * grad wrt input: dcol = W^T @ g per column block; the dynamic lane
#     rotate runs with the opposite shift (roll by +sigma); the bilinear
#     column mix scatters into a (bj+4)-column halo block that XLA
#     overlap-adds between neighbouring blocks; the hoisted successor roll
#     transposes to a single +1 lane roll with the seam row zeroed.
#   * grad wrt weight: recompute the forward's im2col tile and accumulate
#     one (Cout, K*Cin) GEMM per block into a VMEM-resident output.
# ---------------------------------------------------------------------------


def _bwd_input_kernel(sd_ref, cols_ref, quad_ref,                # prefetch
                      g_ref, w_ref, o_ref,                        # tensors
                      gflat_ref, dcol_ref, dband_ref, dbandr_ref,  # scratch
                      *, h, cin, cout, kk, bj):
  jb = pl.program_id(1)
  lanes = jax.lax.broadcasted_iota(jnp.int32, (cin, h), 1)

  for jj in range(bj):
    gflat_ref[:, jj * h:(jj + 1) * h] = g_ref[0, jj]
  dcol_ref[:] = jnp.dot(w_ref[:], gflat_ref[:].astype(w_ref.dtype),
                        preferred_element_type=jnp.float32,
                        precision=_mxu_precision(w_ref.dtype))  # (K*C, BJ*H)

  dband_ref[:] = jnp.zeros_like(dband_ref)
  dbandr_ref[:] = jnp.zeros_like(dbandr_ref)

  def column(jj, _):
    j = jb * bj + jj
    col0 = pl.multiple_of(jj * h, h)
    base = jb * bj - 2
    for k in range(kk):
      c0, c1 = _unpack(cols_ref[j, k])
      c0 = c0 - base
      c1 = c1 - base
      q0 = quad_ref[j, 4 * k]
      q1 = quad_ref[j, 4 * k + 1]
      q2 = quad_ref[j, 4 * k + 2]
      q3 = quad_ref[j, 4 * k + 3]
      sig, dropp = _unpack(sd_ref[j, k])
      drop = dropp - 1

      dmix = dcol_ref[pl.ds(k * cin, cin), pl.ds(col0, h)]
      dmix = jnp.where(lanes == drop, 0.0, dmix)
      dpre = pltpu.roll(dmix, sig, axis=1)     # inverse of roll(_, h-sig)
      dband_ref[c0] = dband_ref[c0] + q0 * dpre
      dbandr_ref[c0] = dbandr_ref[c0] + q1 * dpre
      dband_ref[c1] = dband_ref[c1] + q2 * dpre
      dbandr_ref[c1] = dbandr_ref[c1] + q3 * dpre
    return 0

  jax.lax.fori_loop(0, bj, column, 0)

  # transpose of the hoisted successor roll: dB += roll(dBR|seam→0, +1)
  for c in range(bj + 4):
    dbr = jnp.where(lanes == h - 1, 0.0, dbandr_ref[c])
    o_ref[0, 0, c] = (dband_ref[c] +
                      pltpu.roll(dbr, 1, axis=1)).astype(o_ref.dtype)


def _bwd_weight_kernel(sd_ref, cols_ref, quad_ref,               # prefetch
                       x_ref, g_ref, dw_ref,                       # tensors
                       band_ref, bandr_ref, col_ref, gflat_ref, sem,
                       *, h, cin, cout, kk, bj):
  i = pl.program_id(0)
  jb = pl.program_id(1)

  dma = pltpu.make_async_copy(
      x_ref.at[i, pl.ds(jb * bj, bj + 4)], band_ref, sem)
  dma.start()

  lanes = jax.lax.broadcasted_iota(jnp.int32, (cin, h), 1)
  for jj in range(bj):
    gflat_ref[:, jj * h:(jj + 1) * h] = g_ref[0, jj]
  dma.wait()

  for c in range(bj + 4):
    nxt = pltpu.roll(band_ref[c].astype(jnp.float32), h - 1, axis=1)
    bandr_ref[c] = jnp.where(lanes == h - 1, 0.0,
                             nxt).astype(bandr_ref.dtype)

  def column(jj, _):
    j = jb * bj + jj
    col0 = pl.multiple_of(jj * h, h)
    base = jb * bj - 2
    for k in range(kk):
      c0, c1 = _unpack(cols_ref[j, k])
      c0 = c0 - base
      c1 = c1 - base
      q0 = quad_ref[j, 4 * k]
      q1 = quad_ref[j, 4 * k + 1]
      q2 = quad_ref[j, 4 * k + 2]
      q3 = quad_ref[j, 4 * k + 3]
      sig, dropp = _unpack(sd_ref[j, k])
      drop = dropp - 1

      premix = (q0 * band_ref[c0].astype(jnp.float32) +
                q1 * bandr_ref[c0].astype(jnp.float32) +
                q2 * band_ref[c1].astype(jnp.float32) +
                q3 * bandr_ref[c1].astype(jnp.float32))
      mix = pltpu.roll(premix, h - sig, axis=1)
      mix = jnp.where(lanes == drop, 0.0, mix)
      col_ref[pl.ds(k * cin, cin), pl.ds(col0, h)] = mix.astype(col_ref.dtype)
    return 0

  jax.lax.fori_loop(0, bj, column, 0)

  update = jax.lax.dot_general(
      gflat_ref[:], col_ref[:],
      dimension_numbers=(((1,), (1,)), ((), ())),   # g @ col^T
      preferred_element_type=jnp.float32,
      precision=_mxu_precision(gflat_ref.dtype))    # (Cout, K*C)

  @pl.when(jnp.logical_and(i == 0, jb == 0))
  def _init():
    dw_ref[:] = update

  @pl.when(jnp.logical_or(i != 0, jb != 0))
  def _acc():
    dw_ref[:] = dw_ref[:] + update


def _run_bwd(x_bcl, g_bcl, weight, tables, *, n, band, lanes, cin, cout, kk,
             block_j, dtype):
  """Layout-generic backward launcher on band-major operands.

  Args:
    x_bcl: (N, band+4, Cin, lanes) ±2-band-padded forward input;
    g_bcl: (N, band, Cout, lanes) cotangent;
    weight: (Kh, Kw, Cin, Cout); tables: packed per-(band index, tap) scalars.
  Returns:
    (dx_bcl (N, band, Cin, lanes) in ``dtype``, dw_t (Cout, K*Cin) f32).
  Cassini maps (band, lanes) = (W, H); ERP maps (band, lanes) = (H, W) —
  the kernels themselves are layout-blind (same abstract semantics as the
  shared forward ``_kernel``).
  """
  itemsize = jnp.dtype(dtype).itemsize
  h = lanes

  # --- grad wrt input ------------------------------------------------------
  w_kc = weight.reshape(kk * cin, cout).astype(dtype)

  def dx_vmem(bj):
    return (3 * cout * bj * h * itemsize +          # g block x2 + gflat
            kk * cin * bj * h * 4 +                 # dcol (f32)
            2 * (bj + 4) * cin * h * 4 +            # dband + dbandr (f32)
            3 * (bj + 4) * cin * h * itemsize +     # halo output block x3
            2 * kk * cin * cout * itemsize)         # weights x2

  bj = block_j
  while dx_vmem(bj) > 11 * 2**20 and bj > 2:
    bj //= 2
  assert band % bj == 0, (band, bj)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=3,
      grid=(n, band // bj),
      in_specs=[
          pl.BlockSpec((1, bj, cout, h), lambda i, j, *_: (i, j, 0, 0)),
          pl.BlockSpec((kk * cin, cout), lambda i, j, *_: (0, 0)),
      ],
      out_specs=pl.BlockSpec((1, 1, bj + 4, cin, h),
                             lambda i, j, *_: (i, j, 0, 0, 0)),
      scratch_shapes=[
          pltpu.VMEM((cout, bj * h), dtype),
          pltpu.VMEM((kk * cin, bj * h), jnp.float32),
          pltpu.VMEM((bj + 4, cin, h), jnp.float32),
          pltpu.VMEM((bj + 4, cin, h), jnp.float32),
      ],
  )
  nb = band // bj
  halo = pl.pallas_call(
      functools.partial(_bwd_input_kernel, h=h, cin=cin, cout=cout, kk=kk,
                        bj=bj),
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((n, nb, bj + 4, cin, h), jnp.float32),
      cost_estimate=pl.CostEstimate(
          flops=2 * n * band * lanes * kk * cin * cout,
          bytes_accessed=2 * g_bcl.size * itemsize, transcendentals=0),
  )(*tables, g_bcl, w_kc)

  # overlap-add the ±2-band halos between neighbouring blocks
  dx_bcl = halo[:, :, 2:2 + bj].reshape(n, band, cin, h)
  dx_bcl = dx_bcl.reshape(n, nb, bj, cin, h)
  dx_bcl = dx_bcl.at[:, :-1, bj - 2:].add(halo[:, 1:, :2])
  dx_bcl = dx_bcl.at[:, 1:, :2].add(halo[:, :-1, bj + 2:])
  dx_bcl = dx_bcl.reshape(n, band, cin, h).astype(dtype)

  # --- grad wrt weight -----------------------------------------------------
  def dw_vmem(bj):
    return (2 * (bj + 4) * cin * h * itemsize +     # band + rolled band
            kk * cin * bj * h * itemsize +          # im2col scratch
            3 * cout * bj * h * itemsize +          # g block x2 + gflat
            cout * kk * cin * 4)                    # f32 dw accumulator

  bjw = block_j
  while dw_vmem(bjw) > 11 * 2**20 and bjw > 2:
    bjw //= 2
  assert band % bjw == 0, (band, bjw)

  grid_spec_w = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=3,
      grid=(n, band // bjw),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((1, bjw, cout, h), lambda i, j, *_: (i, j, 0, 0)),
      ],
      out_specs=pl.BlockSpec((cout, kk * cin), lambda i, j, *_: (0, 0)),
      scratch_shapes=[
          pltpu.VMEM((bjw + 4, cin, h), dtype),
          pltpu.VMEM((bjw + 4, cin, h), dtype),
          pltpu.VMEM((kk * cin, bjw * h), dtype),
          pltpu.VMEM((cout, bjw * h), dtype),
          pltpu.SemaphoreType.DMA,
      ],
  )
  dw_t = pl.pallas_call(
      functools.partial(_bwd_weight_kernel, h=h, cin=cin, cout=cout, kk=kk,
                        bj=bjw),
      grid_spec=grid_spec_w,
      out_shape=jax.ShapeDtypeStruct((cout, kk * cin), jnp.float32),
      cost_estimate=pl.CostEstimate(
          flops=2 * n * band * lanes * kk * cin * cout,
          bytes_accessed=(x_bcl.size + g_bcl.size) * itemsize,
          transcendentals=0),
  )(*tables, x_bcl, g_bcl)
  return dx_bcl, dw_t


def sphere_conv_cassini_pallas_bwd(x: jnp.ndarray, weight: jnp.ndarray,
                                   g: jnp.ndarray, block_j: int = 8
                                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Backward pass of :func:`sphere_conv_cassini_pallas`.

  Args:
    x: (N, H, W, Cin) forward input; weight: (Kh, Kw, Cin, Cout);
    g: (N, H, W, Cout) cotangent of the forward output.
  Returns:
    (dx, dweight) with the shapes/dtypes of (x, weight). Exact transpose of
    the Pallas forward (shared shift tables), so gradients are consistent
    with the activations actually computed.
  """
  n, h, w, cin = x.shape
  kh, kw, wcin, cout = weight.shape
  kk = kh * kw
  assert g.shape == (n, h, w, cout), g.shape

  sigma, colint_t, quad_t, drop_row = build_shift_tables(h, w, kh)
  tables = _pack_tables(sigma, colint_t, quad_t, drop_row, w, kk)

  g_wch = jnp.transpose(g, (0, 2, 3, 1))            # (N, W, Cout, H)
  x_wch = jnp.transpose(x, (0, 2, 3, 1))
  x_wch = jnp.pad(x_wch, ((0, 0), (2, 2), (0, 0), (0, 0)))

  dx_wch, dw_t = _run_bwd(x_wch, g_wch, weight, tables, n=n, band=w, lanes=h,
                          cin=cin, cout=cout, kk=kk, block_j=block_j,
                          dtype=x.dtype)
  dx = jnp.transpose(dx_wch, (0, 3, 1, 2))
  dweight = dw_t.T.reshape(kh, kw, cin, cout).astype(weight.dtype)
  return dx, dweight


def sphere_conv_erp_pallas_bwd(x: jnp.ndarray, weight: jnp.ndarray,
                               g: jnp.ndarray, block_j: int = 8
                               ) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Backward pass of :func:`sphere_conv_erp_pallas` (the CUDA counterpart
  covers every layout in one col2im kernel,
  ``sphere_conv_cuda_kernel.cu:294-356``).

  The ERP forward runs the *same* abstract kernel as Cassini with
  (band, lanes) = (H, W) and ERP shift tables, so its transpose is the same
  backward pair under the same substitution — only the host-side transposes
  differ.
  """
  n, h, w, cin = x.shape
  kh, kw, wcin, cout = weight.shape
  kk = kh * kw
  assert g.shape == (n, h, w, cout), g.shape

  sigma, rowint_t, quad_t, drop_col = build_shift_tables_erp(h, w, kh)
  tables = _pack_tables(sigma, rowint_t, quad_t, drop_col, h, kk)

  g_hcw = jnp.transpose(g, (0, 1, 3, 2))            # (N, H, Cout, W)
  x_hcw = jnp.transpose(x, (0, 1, 3, 2))
  x_hcw = jnp.pad(x_hcw, ((0, 0), (2, 2), (0, 0), (0, 0)))

  dx_hcw, dw_t = _run_bwd(x_hcw, g_hcw, weight, tables, n=n, band=h, lanes=w,
                          cin=cin, cout=cout, kk=kk, block_j=block_j,
                          dtype=x.dtype)
  dx = jnp.transpose(dx_hcw, (0, 1, 3, 2))
  dweight = dw_t.T.reshape(kh, kw, cin, cout).astype(weight.dtype)
  return dx, dweight
