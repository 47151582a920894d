"""Pallas TPU kernel for full-resolution 2-D 3x3 convolutions.

The fusion net (``/root/reference/models/mode_fusion.py:17-32`` BasicBlocks
under ``:91-247``) and the stem layers run stride-1 3x3 2-D convs with C in
{32..256} on 1024x512 panoramas. XLA's NHWC conv keeps channels on the 128
TPU lanes, so C=32 uses 1/4 of the MXU columns (~10-15 ms/frame across the
fusion net, ``scripts/profile_rest.py``). Same cure as the cost-volume
conv3d (``conv3d_kernel.py``), one dimension lower:

  * layout is lane-major ``(B, M, C, L)`` — the panorama axis with size a
    multiple of 128 rides the lanes; the other spatial axis M forms DMA'd
    halo bands;
  * the k_band (kh) taps fold into the GEMM's contraction — a
    ``band[m:m+3]`` slice IS the (3C, L) contraction operand, contiguous in
    VMEM, no im2col copy;
  * the k_lane (kw) taps fold into the GEMM's output rows — one
    ``(3Cout, 3C) @ (3C, L)`` dot per output row, the three Cout row groups
    combined by ±1 lane shifts on the VPU;
  * the VPU recombination for row m is emitted between the dots for rows
    m+1 and m+2, so Mosaic can overlap the MXU and VPU issue streams;
  * an optional (scale, bias) + residual + ReLU epilogue runs while the
    tile is in VMEM (the reference runs eager torch conv→BN→ReLU).

Used by the eval/serving fast path only; training keeps XLA convs (which
fuse BN statistics into the differentiated graph).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mode_tpu.ops.pallas.sphere_conv_kernel import _mxu_precision


def _kernel(x_ref, w_ref, sb_ref, res_ref, o_ref, bands_ref, z_ref, sem,
            *, mb, cin, cout, lanes, relu, has_res):
  b = pl.program_id(0)
  m = pl.program_id(1)
  nm = pl.num_programs(1)
  lin = b * nm + m
  total = pl.num_programs(0) * nm
  slot = lax.rem(lin, 2)

  def band_dma(slot_idx, b_, m_):
    return pltpu.make_async_copy(
        x_ref.at[b_, pl.ds(m_ * mb * cin, (mb + 2) * cin)],
        bands_ref.at[slot_idx], sem.at[slot_idx])

  @pl.when(lin == 0)
  def _first():
    band_dma(slot, b, m).start()

  @pl.when(lin + 1 < total)
  def _prefetch():
    nxt = lin + 1
    band_dma(1 - slot, nxt // nm, lax.rem(nxt, nm)).start()

  band_dma(slot, b, m).wait()

  prec = _mxu_precision(w_ref.dtype)
  wmat = w_ref[:]                                  # (3Cout, 3Cin)
  lanes_i = jax.lax.broadcasted_iota(jnp.int32, (cout, lanes), 1)

  def recombine(mm):
    z = z_ref[mm]                                  # (3Cout, L) f32
    left = z[0:cout]
    mid = z[cout:2 * cout]
    right = z[2 * cout:3 * cout]
    acc = (mid +
           jnp.where(lanes_i == 0, 0.0, pltpu.roll(left, 1, axis=1)) +
           jnp.where(lanes_i == lanes - 1, 0.0,
                     pltpu.roll(right, lanes - 1, axis=1)))
    acc = acc * sb_ref[0] + sb_ref[1]
    if has_res:
      acc = acc + res_ref[0, mm].astype(jnp.float32)
    if relu:
      acc = jnp.maximum(acc, 0.0)
    o_ref[0, mm] = acc.astype(o_ref.dtype)

  for mm in range(mb):
    z_ref[mm] = jnp.dot(
        wmat, bands_ref[slot, mm * cin:(mm + 3) * cin],
        preferred_element_type=jnp.float32, precision=prec)
    if mm >= 1:
      recombine(mm - 1)
  recombine(mb - 1)


def _kernel_batch(x_ref, w_ref, sb_ref, res_ref, o_ref, bands_ref, z_ref,
                  sem, *, mb, cin, cout, lanes, relu, has_res):
  """Batch-recombination variant of :func:`_kernel`: all dots first, then
  one whole-block VPU pass (the conv3d kernel's measured-winning structure
  — per-row VPU chunks vectorize worse than they overlap)."""
  b = pl.program_id(0)
  m = pl.program_id(1)
  nm = pl.num_programs(1)
  lin = b * nm + m
  total = pl.num_programs(0) * nm
  slot = lax.rem(lin, 2)

  def band_dma(slot_idx, b_, m_):
    return pltpu.make_async_copy(
        x_ref.at[b_, pl.ds(m_ * mb * cin, (mb + 2) * cin)],
        bands_ref.at[slot_idx], sem.at[slot_idx])

  @pl.when(lin == 0)
  def _first():
    band_dma(slot, b, m).start()

  @pl.when(lin + 1 < total)
  def _prefetch():
    nxt = lin + 1
    band_dma(1 - slot, nxt // nm, lax.rem(nxt, nm)).start()

  band_dma(slot, b, m).wait()

  prec = _mxu_precision(w_ref.dtype)
  wmat = w_ref[:]
  for mm in range(mb):
    z_ref[mm] = jnp.dot(
        wmat, bands_ref[slot, mm * cin:(mm + 3) * cin],
        preferred_element_type=jnp.float32, precision=prec)

  z = z_ref[:]                                     # (mb, 3Cout, L) f32
  left = z[:, 0:cout]
  mid = z[:, cout:2 * cout]
  right = z[:, 2 * cout:3 * cout]
  lanes_i = jax.lax.broadcasted_iota(jnp.int32, (mb, cout, lanes), 2)
  acc = (mid +
         jnp.where(lanes_i == 0, 0.0, pltpu.roll(left, 1, axis=2)) +
         jnp.where(lanes_i == lanes - 1, 0.0,
                   pltpu.roll(right, lanes - 1, axis=2)))
  acc = acc * sb_ref[0][None] + sb_ref[1][None]
  if has_res:
    acc = acc + res_ref[0].astype(jnp.float32)
  if relu:
    acc = jnp.maximum(acc, 0.0)
  o_ref[0] = acc.astype(o_ref.dtype)


def _pick_mb(m, cin, cout, lanes, itemsize, has_res):
  """Largest band-block height whose working set fits the VMEM budget."""
  def vmem(mb):
    return (2 * (mb + 2) * cin * lanes * itemsize +          # bands x2
            2 * mb * cout * lanes * itemsize +               # out x2
            (2 * mb * cout * lanes * itemsize if has_res else 0) +
            3 * cout * 3 * cin * itemsize +                  # weights
            mb * 3 * cout * lanes * 4)                       # z (f32)

  for mb in (16, 8, 4, 2, 1):
    if m % mb == 0 and vmem(mb) <= 10 * 2**20:
      return mb
  return None


def conv2d_band_pallas(x: jnp.ndarray, weight: jnp.ndarray,
                       scale: jnp.ndarray | None = None,
                       bias: jnp.ndarray | None = None,
                       residual: jnp.ndarray | None = None,
                       relu: bool = False,
                       interleave: bool = True,
                       m_halo: bool = False) -> jnp.ndarray:
  """Fused stride-1 3x3 SAME conv (+affine +residual +ReLU), lane-major.

  ``interleave`` selects the per-row-recombination kernel (the measured
  winner here: +15-100% over batch recombination across the fusion shapes,
  ``scripts/bench_conv2d_pallas.py`` — the opposite of the conv3d kernel,
  whose recombination rows are narrower and vectorize better in one pass).

  Args:
    x: (B, M, C, L) with L a multiple of 128 and C a multiple of 8.
    weight: (3, 3, C, Cout) in (k_band, k_lane, in, out) order, Cout a
      multiple of 8.
    scale, bias: optional (Cout,) f32 epilogue affine (folded eval BN).
    residual: optional (B, M, Cout, L) added before ReLU.
    m_halo: ``x`` already carries its ±1 M halo rows (SPMD shard-local
      call — the neighbours' boundary rows were exchanged over ICI by the
      caller, ``parallel/shard_ops.py``); the output then has M-2 rows.
  Returns:
    (B, M_out, Cout, L) in x.dtype (M_out = M - 2 when ``m_halo``).
  """
  b, m, cin, lanes = x.shape
  if m_halo:
    m = m - 2
  kh, kw, wcin, cout = weight.shape
  assert (kh, kw) == (3, 3) and wcin == cin, (weight.shape, x.shape)
  assert lanes % 128 == 0 and cin % 8 == 0 and cout % 8 == 0
  itemsize = jnp.dtype(x.dtype).itemsize

  mb = _pick_mb(m, cin, cout, lanes, itemsize, residual is not None)
  assert mb is not None, (x.shape,)

  # fold k_lane into the GEMM's output rows: rows indexed (kw, cout),
  # contraction indexed (kh, cin)
  w2 = jnp.transpose(weight, (1, 3, 0, 2)).reshape(3 * cout, 3 * cin)
  w2 = w2.astype(x.dtype)

  sb = jnp.stack([
      jnp.ones((cout,), jnp.float32) if scale is None
      else scale.astype(jnp.float32),
      jnp.zeros((cout,), jnp.float32) if bias is None
      else bias.astype(jnp.float32),
  ])[:, :, None]                                       # (2, Cout, 1)

  xp = x if m_halo else jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
  xp = xp.reshape(b, (m + 2) * cin, lanes)

  has_res = residual is not None
  res = residual if has_res else jnp.zeros((b, 1, cout, lanes), x.dtype)
  res_spec = (pl.BlockSpec((1, mb, cout, lanes), lambda i, j: (i, j, 0, 0))
              if has_res else
              pl.BlockSpec((1, 1, cout, lanes), lambda i, j: (i, 0, 0, 0)))

  kernel = functools.partial(_kernel if interleave else _kernel_batch,
                             mb=mb, cin=cin, cout=cout,
                             lanes=lanes, relu=relu, has_res=has_res)
  flops = 2 * b * m * lanes * 9 * cin * cout
  return pl.pallas_call(
      kernel,
      grid=(b, m // mb),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((3 * cout, 3 * cin), lambda i, j: (0, 0)),
          pl.BlockSpec((2, cout, 1), lambda i, j: (0, 0, 0)),
          res_spec,
      ],
      out_specs=pl.BlockSpec((1, mb, cout, lanes), lambda i, j: (i, j, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((b, m, cout, lanes), x.dtype),
      scratch_shapes=[
          pltpu.VMEM((2, (mb + 2) * cin, lanes), x.dtype),
          pltpu.VMEM((mb, 3 * cout, lanes), jnp.float32),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      cost_estimate=pl.CostEstimate(
          flops=flops,
          bytes_accessed=(x.size + (res.size if has_res else 0)) * itemsize
          * 2,
          transcendentals=0),
  )(xp, w2, sb, res)


def _kernel_bpack(x_ref, w_ref, sb_ref, res_ref, o_ref, bands_ref, z_ref,
                  sem, *, g, mb, cin, cout, lanes, relu, has_res, dil):
  """Batch-packed variant of :func:`_kernel`: G images ride the LANE axis
  side by side, so each dot's N dimension is G*L instead of L (the
  MXU-fill limiter at L<=256, docs/PROFILES.md round-5). The packing
  happens in the DMA destination — each grid step issues G async band
  copies into disjoint 128-aligned lane columns of the shared scratch —
  and the kw recombination masks every image's edge lanes, keeping images
  independent (bit-identical to the per-image kernel). ``dil`` > 1 runs
  the dilated tap pattern (layer3's dilation-2 blocks): the kh taps become
  ``dil``-strided band rows (3 accumulated dots) and the kw taps become
  ±dil lane shifts with dil-wide edge masks."""
  bg = pl.program_id(0)
  m = pl.program_id(1)
  nm = pl.num_programs(1)
  lin = bg * nm + m
  total = pl.num_programs(0) * nm
  slot = lax.rem(lin, 2)
  band_rows = (mb + 2 * dil) * cin

  def band_dma(slot_idx, bg_, m_, g_):
    return pltpu.make_async_copy(
        x_ref.at[bg_ * g + g_, pl.ds(m_ * mb * cin, band_rows)],
        bands_ref.at[slot_idx, :, pl.ds(g_ * lanes, lanes)],
        sem.at[slot_idx, g_])

  @pl.when(lin == 0)
  def _first():
    for g_ in range(g):
      band_dma(slot, bg, m, g_).start()

  @pl.when(lin + 1 < total)
  def _prefetch():
    nxt = lin + 1
    for g_ in range(g):
      band_dma(1 - slot, nxt // nm, lax.rem(nxt, nm), g_).start()

  for g_ in range(g):
    band_dma(slot, bg, m, g_).wait()

  prec = _mxu_precision(w_ref.dtype)
  wmat = w_ref[:]                                  # (3Cout, 3Cin)
  gl = g * lanes
  lanes_i = jax.lax.broadcasted_iota(jnp.int32, (cout, gl), 1) % lanes
  is_left = lanes_i < dil
  is_right = lanes_i >= lanes - dil

  def recombine(mm):
    z = z_ref[mm]                                  # (3Cout, GL) f32
    left = z[0:cout]
    mid = z[cout:2 * cout]
    right = z[2 * cout:3 * cout]
    acc = (mid +
           jnp.where(is_left, 0.0, pltpu.roll(left, dil, axis=1)) +
           jnp.where(is_right, 0.0, pltpu.roll(right, gl - dil, axis=1)))
    acc = acc * sb_ref[0] + sb_ref[1]
    for g_ in range(g):
      slab = acc[:, g_ * lanes:(g_ + 1) * lanes]
      if has_res:
        slab = slab + res_ref[g_, mm].astype(jnp.float32)
      if relu:
        slab = jnp.maximum(slab, 0.0)
      o_ref[g_, mm] = slab.astype(o_ref.dtype)

  for mm in range(mb):
    if dil == 1:
      z_ref[mm] = jnp.dot(
          wmat, bands_ref[slot, mm * cin:(mm + 3) * cin],
          preferred_element_type=jnp.float32, precision=prec)
    else:
      z = jnp.dot(wmat[:, 0:cin],
                  bands_ref[slot, mm * cin:(mm + 1) * cin],
                  preferred_element_type=jnp.float32, precision=prec)
      for k in (1, 2):
        off = (mm + k * dil) * cin
        z = z + jnp.dot(wmat[:, k * cin:(k + 1) * cin],
                        bands_ref[slot, off:off + cin],
                        preferred_element_type=jnp.float32, precision=prec)
      z_ref[mm] = z
    if mm >= 1:
      recombine(mm - 1)
  recombine(mb - 1)


def _pick_mb_bpack(m, cin, cout, gl, itemsize, has_res, dil):
  def vmem(mb):
    return (2 * (mb + 2 * dil) * cin * gl * itemsize +       # bands x2
            2 * mb * cout * gl * itemsize +                  # out x2
            (2 * mb * cout * gl * itemsize if has_res else 0) +
            3 * cout * 3 * cin * itemsize +
            mb * 3 * cout * gl * 4)                          # z (f32)

  for mb in (16, 8, 4, 2, 1):
    if m % mb == 0 and vmem(mb) <= 10 * 2**20:
      return mb
  return None


def conv2d_band_bpack(x: jnp.ndarray, weight: jnp.ndarray,
                      scale: jnp.ndarray | None = None,
                      bias: jnp.ndarray | None = None,
                      residual: jnp.ndarray | None = None,
                      relu: bool = False,
                      g: int = 2,
                      dilation: int = 1) -> jnp.ndarray:
  """Fused 3x3 SAME conv (+affine +residual +ReLU), lane-major,
  batch-packed: groups of ``g`` images are computed in one GEMM with
  N = g*L. Measured 2-7x over the in-model NHWC XLA convs at the FE-stage
  shapes (docs/PROFILES.md round-5). Same semantics and param layout as
  :func:`conv2d_band_pallas`; additionally supports ``dilation`` (the
  reference layer3 blocks, submodule.py:186-189 via convbn's
  padding=dilation quirk)."""
  b, m, cin, lanes = x.shape
  kh, kw, wcin, cout = weight.shape
  assert (kh, kw) == (3, 3) and wcin == cin, (weight.shape, x.shape)
  assert lanes % 128 == 0 and cin % 8 == 0 and cout % 8 == 0
  assert b % g == 0 and g >= 1
  itemsize = jnp.dtype(x.dtype).itemsize

  mb = _pick_mb_bpack(m, cin, cout, g * lanes, itemsize,
                      residual is not None, dilation)
  assert mb is not None, (x.shape, g)

  w2 = jnp.transpose(weight, (1, 3, 0, 2)).reshape(3 * cout, 3 * cin)
  w2 = w2.astype(x.dtype)
  sb = jnp.stack([
      jnp.ones((cout,), jnp.float32) if scale is None
      else scale.astype(jnp.float32),
      jnp.zeros((cout,), jnp.float32) if bias is None
      else bias.astype(jnp.float32),
  ])[:, :, None]

  xp = jnp.pad(x, ((0, 0), (dilation, dilation), (0, 0), (0, 0)))
  xp = xp.reshape(b, (m + 2 * dilation) * cin, lanes)

  has_res = residual is not None
  res = residual if has_res else jnp.zeros((b, 1, cout, lanes), x.dtype)
  res_spec = (pl.BlockSpec((g, mb, cout, lanes), lambda i, j: (i, j, 0, 0))
              if has_res else
              pl.BlockSpec((1, 1, cout, lanes), lambda i, j: (0, 0, 0, 0)))

  kernel = functools.partial(_kernel_bpack, g=g, mb=mb, cin=cin, cout=cout,
                             lanes=lanes, relu=relu, has_res=has_res,
                             dil=dilation)
  flops = 2 * b * m * lanes * 9 * cin * cout
  return pl.pallas_call(
      kernel,
      grid=(b // g, m // mb),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((3 * cout, 3 * cin), lambda i, j: (0, 0)),
          pl.BlockSpec((2, cout, 1), lambda i, j: (0, 0, 0)),
          res_spec,
      ],
      out_specs=pl.BlockSpec((g, mb, cout, lanes),
                             lambda i, j: (i, j, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((b, m, cout, lanes), x.dtype),
      scratch_shapes=[
          pltpu.VMEM((2, (mb + 2 * dilation) * cin, g * lanes), x.dtype),
          pltpu.VMEM((mb, 3 * cout, g * lanes), jnp.float32),
          pltpu.SemaphoreType.DMA((2, g)),
      ],
      cost_estimate=pl.CostEstimate(
          flops=flops,
          bytes_accessed=(x.size + (res.size if has_res else 0)) * itemsize
          * 2,
          transcendentals=0),
  )(xp, w2, sb, res)


def pick_bpack_g(b: int, lanes: int) -> int | None:
  """Measured-best pack factor per lane width (docs/PROFILES.md round-5:
  L=512 -> g=6 at 65 TF/s, L=256 -> g=2 at 74, L=128 -> g=3 at 19),
  constrained to divisors of the batch. None = packing unavailable (b=1,
  no divisor >1, or lanes not 128-aligned): fall back to the per-image
  band kernel / XLA."""
  if lanes % 128 != 0:
    return None
  prefs = ((6, 3, 2) if lanes >= 512 else
           (2, 3, 6) if lanes >= 256 else
           (3, 6, 2))
  for g in prefs:
    if b % g == 0:
      return g
  return None


def bpack_conv2d_ok(x_shape, cout, itemsize: int = 2,
                    has_res: bool = False, g: int = 2,
                    dilation: int = 1) -> bool:
  """Static gate for :func:`conv2d_band_bpack` on a lane-major
  ``(B, M, C, L)`` input. Mesh calls are NOT supported (no shard_map
  wrapper for the packed variant — under a mesh use the per-image path)."""
  b, m, cin, lanes = x_shape
  cin = -(-cin // 8) * 8
  if g < 2 or b % g != 0:
    return False
  if cout % 8 != 0 or lanes % 128 != 0:
    return False
  if _pick_mb_bpack(m, cin, cout, g * lanes, itemsize, has_res,
                    dilation) is None:
    return False
  return pallas_policy_ok(allow_mesh=False)


def lane_axis_for_2d(shape) -> int | None:
  """Which NHWC spatial axis rides the lanes: 2 (W) or 1 (H), else None."""
  _, h, w, _ = shape
  if w % 128 == 0:
    return 2
  if h % 128 == 0:
    return 1
  return None


def conv2d_fused(x: jnp.ndarray, weight: jnp.ndarray,
                 scale: jnp.ndarray | None = None,
                 bias: jnp.ndarray | None = None,
                 residual: jnp.ndarray | None = None,
                 relu: bool = False, interleave: bool = True) -> jnp.ndarray:
  """NHWC wrapper around :func:`conv2d_band_pallas` (transposes in/out).

  weight is HWIO (flax ``nn.Conv`` layout).
  """
  la = lane_axis_for_2d(x.shape)
  assert la is not None, x.shape
  if la == 2:                     # W on lanes, bands over H
    xl = jnp.transpose(x, (0, 1, 3, 2))
    wl = weight
    rl = None if residual is None else jnp.transpose(residual, (0, 1, 3, 2))
  else:                           # H on lanes, bands over W
    xl = jnp.transpose(x, (0, 2, 3, 1))
    wl = jnp.transpose(weight, (1, 0, 2, 3))
    rl = None if residual is None else jnp.transpose(residual, (0, 2, 3, 1))
  y = conv2d_band_pallas(xl, wl, scale, bias, rl, relu,
                         interleave=interleave)
  return (jnp.transpose(y, (0, 1, 3, 2)) if la == 2
          else jnp.transpose(y, (0, 3, 1, 2)))


def _conv2d_xla(x, w):
  dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
  prec = (lax.Precision.HIGHEST if x.dtype == jnp.float32
          else lax.Precision.DEFAULT)
  return lax.conv_general_dilated(x, w, (1, 1), [(1, 1)] * 2,
                                  dimension_numbers=dn, precision=prec)


def _conv2d_xla_dil(x, w, dil):
  dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
  prec = (lax.Precision.HIGHEST if x.dtype == jnp.float32
          else lax.Precision.DEFAULT)
  return lax.conv_general_dilated(x, w, (1, 1), [(dil, dil)] * 2,
                                  rhs_dilation=(dil, dil),
                                  dimension_numbers=dn, precision=prec)


def _bpack_nhwc(x, w, g, dil):
  """NHWC wrapper around :func:`conv2d_band_bpack` (bare conv, no
  epilogue): transpose the 128-multiple spatial axis onto the lanes, run
  the packed kernel, transpose back."""
  la = lane_axis_for_2d(x.shape)
  assert la is not None, x.shape
  if la == 2:                     # W on lanes, bands over H
    xl = jnp.transpose(x, (0, 1, 3, 2))
    wl = w
  else:                           # H on lanes, bands over W
    xl = jnp.transpose(x, (0, 2, 3, 1))
    wl = jnp.transpose(w, (1, 0, 2, 3))
  y = conv2d_band_bpack(xl, wl, g=g, dilation=dil)
  return (jnp.transpose(y, (0, 1, 3, 2)) if la == 2
          else jnp.transpose(y, (0, 3, 1, 2)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_3x3_fast_train(x, w, g, dil):
  """3x3 SAME stride-1 conv (optionally dilated), NHWC/HWIO, for the
  TRAINING fast path: batch-packed Pallas forward AND grad-input (the
  grad-input of a stride-1 SAME conv is the same-shaped conv with the
  io-swapped, spatially flipped kernel), XLA conv-backward-filter for
  grad-weight. Same structure as ``conv3d_ndhwc_fast``
  (ops/pallas/conv3d_kernel.py): gradient-safe because every leg computes
  the mathematically exact quantity — only reduction order differs from
  the all-XLA path."""
  return _bpack_nhwc(x, w, g, dil)


def _bpack_train_fwd(x, w, g, dil):
  return _bpack_nhwc(x, w, g, dil), (x, w)


def _bpack_train_bwd(g_pack, dil, res, gy):
  x, w = res
  wt = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)          # (3,3,Cout,Cin)
  if bpack_conv2d_ok(
      (gy.shape[0],) + ((gy.shape[1], gy.shape[3], gy.shape[2])
                        if lane_axis_for_2d(gy.shape) == 2
                        else (gy.shape[2], gy.shape[3], gy.shape[1])),
      wt.shape[3], jnp.dtype(gy.dtype).itemsize, False, g_pack, dil):
    dx = _bpack_nhwc(gy, wt, g_pack, dil)
  else:
    dx = _conv2d_xla_dil(gy, wt, dil)
  _, vjp_w = jax.vjp(lambda w_: _conv2d_xla_dil(x, w_, dil), w)
  dw, = vjp_w(gy.astype(x.dtype))
  return dx.astype(x.dtype), dw.astype(w.dtype)


conv2d_3x3_fast_train.defvjp(_bpack_train_fwd, _bpack_train_bwd)


def train_bpack2d_g(x_shape, cout, dilation: int = 1,
                    itemsize: int = 2) -> int | None:
  """Pack factor for the 2-D training fast path, or None if ineligible.
  Shares the conv3d train gates (``train_pallas_enabled`` +
  min-batch >= 2: the per-call NHWC<->lane transposes amortize only with
  batched GEMMs, the round-4 A/B lesson) plus the bpack shape gates. No
  mesh (the packed kernel has no shard_map wrapper)."""
  from mode_tpu.ops.pallas import conv3d_kernel as c3k
  b, h, w, cin = x_shape
  if not c3k.train_pallas_enabled() or b < c3k._TRAIN_PALLAS_MIN_BATCH:
    return None
  if cin % 8 != 0 or cout % 8 != 0:
    return None
  la = lane_axis_for_2d(x_shape)
  if la is None:
    return None
  lanes, m = (w, h) if la == 2 else (h, w)
  g = pick_bpack_g(b, lanes)
  if g is None:
    return None
  if not bpack_conv2d_ok((b, m, cin, lanes), cout, itemsize, False, g,
                         dilation):
    return None
  return g


@jax.custom_vjp
def conv2d_3x3_fast(x, w):
  """Stride-1 3x3 SAME conv, NHWC/HWIO, Pallas forward + XLA backward.
  Gradient-safe: the VJP is the XLA conv's (the two forwards agree to
  kernel-precision tolerance, sharing the zero-padded SAME semantics)."""
  return conv2d_fused(x, w)


def _conv2d_fast_fwd(x, w):
  return conv2d_fused(x, w), (x, w)


def _conv2d_fast_bwd(res, g):
  x, w = res
  _, vjp = jax.vjp(_conv2d_xla, x, w)
  return vjp(g)


conv2d_3x3_fast.defvjp(_conv2d_fast_fwd, _conv2d_fast_bwd)


def pallas_policy_ok(allow_mesh: bool = False) -> bool:
  """The shared mode/mesh/platform policy for the 2-D Pallas fast paths.
  ``allow_mesh``: callers that route mesh calls through the shard_map
  wrapper (``parallel/shard_ops.py:conv2d_band_sharded``) pass True; bare
  ``conv2d_band_pallas`` calls must stay off under a mesh (the SPMD
  partitioner cannot split the custom call)."""
  from mode_tpu.ops.pallas.conv3d_kernel import _CONV3D_MODE
  if _CONV3D_MODE == "off":
    return False
  from mode_tpu.parallel.mesh import active_mesh
  mesh = active_mesh()
  if mesh is not None and mesh.size > 1 and not allow_mesh:
    return False
  if _CONV3D_MODE == "on":
    return True
  try:
    return jax.devices()[0].platform in ("tpu", "axon")
  except RuntimeError:
    return False


def lane_conv2d_ok(x_shape, cout, itemsize: int = 2,
                   has_res: bool = False,
                   allow_mesh: bool = False) -> bool:
  """Static gate for :func:`conv2d_band_pallas` on an already lane-major
  ``(B, M, C, L)`` input (stride-1 3x3 SAME assumed by the caller). ``C``
  may be padded up to the next multiple of 8 by the caller. With
  ``allow_mesh``, ``x_shape`` must be the SHARD-LOCAL shape."""
  b, m, cin, lanes = x_shape
  cin = -(-cin // 8) * 8
  if cout % 8 != 0 or lanes % 128 != 0:
    return False
  if _pick_mb(m, cin, cout, lanes, itemsize, has_res) is None:
    return False
  return pallas_policy_ok(allow_mesh)


