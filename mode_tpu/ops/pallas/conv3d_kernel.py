"""Pallas TPU kernel for the cost-volume 3-D convolutions.

The stage-1 mid-section (``/root/reference/models/mode_disparity.py:115-129``)
is ~20 stride-1 3x3x3 convs over (B, 48, 256, 128, C) volumes with C in
{32, 64}. XLA's conv3d keeps channels on the 128 TPU lanes, so C=32 wastes
3/4 of the MXU columns (measured 16.4 bf16-TFLOP/s at best across layouts,
``scripts/bench_conv3d.py``). This kernel re-maps the GEMM instead:

  * layout is lane-major ``(B, D, M, C, L)`` — the panorama axis whose size
    is a multiple of 128 (W at full volume, H at half volume) rides the
    lanes; the other spatial axis M forms DMA'd halo bands;
  * the kd / kh taps are folded into the GEMM's contraction: a
    ``band[d:d+3, m:m+3]`` slice IS the (9·C, L) contraction operand —
    contiguous in VMEM, zero im2col copies;
  * the kw taps are folded into the GEMM's output rows: one
    ``(3·Cout, 9·C) @ (9·C, L)`` matmul per output row, and the three
    Cout-row groups are combined by ±1 lane shifts (VPU) — so every MAC the
    MXU performs is a useful conv FLOP;
  * BatchNorm (eval, folded to scale/bias), the residual add, and ReLU run
    in the epilogue while the tile is still in VMEM — the reference fuses
    none of this (torch eager, ``submodule.py:20-22``);
  * halo blocks are double-buffered: the next block's DMA is issued before
    the current block's GEMMs.

Training keeps the XLA path (``models/blocks.py:Conv3dDFold``) — this kernel
is the eval/serving fast path, dispatched by ``conv3d_fused``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mode_tpu.ops.pallas.sphere_conv_kernel import _mxu_precision


def _platform_ok() -> bool:
  """Shared 'auto' gate tail: Pallas-on-TPU backends only."""
  try:
    return jax.devices()[0].platform in ("tpu", "axon")
  except RuntimeError:
    return False


def _affine_sb(scale, bias, cout):
  """Epilogue affine as the (2, Cout, 1) block every kernel consumes."""
  return jnp.stack([
      jnp.ones((cout,), jnp.float32) if scale is None
      else scale.astype(jnp.float32),
      jnp.zeros((cout,), jnp.float32) if bias is None
      else bias.astype(jnp.float32),
  ])[:, :, None]


def _kernel(x_ref, w_ref, sb_ref, res_ref, o_ref, bands_ref, z_ref, sem,
            *, db, mb, cin, cout, lanes, relu, has_res):
  b = pl.program_id(0)
  d = pl.program_id(1)
  m = pl.program_id(2)
  nd = pl.num_programs(1)
  nm = pl.num_programs(2)
  lin = (b * nd + d) * nm + m
  total = pl.num_programs(0) * nd * nm
  slot = lax.rem(lin, 2)

  def band_dma(slot_idx, b_, d_, m_):
    return pltpu.make_async_copy(
        x_ref.at[b_, pl.ds(d_ * db, db + 2),
                 pl.ds(m_ * mb * cin, (mb + 2) * cin)],
        bands_ref.at[slot_idx], sem.at[slot_idx])

  @pl.when(lin == 0)
  def _first():
    band_dma(slot, b, d, m).start()

  # prefetch the next block's halo band while this block computes
  @pl.when(lin + 1 < total)
  def _prefetch():
    nxt = lin + 1
    m2 = lax.rem(nxt, nm)
    d2 = lax.rem(nxt // nm, nd)
    b2 = nxt // (nm * nd)
    band_dma(1 - slot, b2, d2, m2).start()

  band_dma(slot, b, d, m).wait()

  # MXU pass: ONE (9·Cout, 3C) @ (3C, L) dot per INPUT row — all kd and kw
  # taps fold into the output rows, so the loop-invariant weights stream
  # through a stationary x-tile that is loaded once per dot and fed 9·Cout
  # rows (amortizing the systolic-array fill). The (kh·C) contraction operand
  # is a direct 2-D slice of the band (bands are stored (D, (M+2)·C, L), so
  # a kh-window is one sublane slice — no im2col copy). Halo input rows cost
  # (db+2)/db extra work; db is picked large to bound it.
  prec = _mxu_precision(w_ref.dtype)

  # unrolled static slices so Mosaic can pipeline the dots (a fori_loop with
  # dynamic operand slices measured 21 vs 30 TFLOP/s); the double-buffer
  # slot is a dynamic leading index only
  wmat = w_ref[:].reshape(9 * cout, 3 * cin)
  for di in range(db + 2):
    for mm in range(mb):
      z_ref[di, mm] = jnp.dot(
          wmat, bands_ref[slot, di, mm * cin:(mm + 3) * cin],
          preferred_element_type=jnp.float32,
          precision=prec).astype(z_ref.dtype)

  # VPU pass: out[dd] = sum_kd kw-shift(Z[dd+kd, group(kd, kw)]), vectorized
  # over the whole block, then the fused epilogue.
  nrow = db * mb
  lanes_i = jax.lax.broadcasted_iota(jnp.int32, (nrow, cout, lanes), 2)
  left = mid = right = None
  for kd in range(3):                          # sum kd groups per kw column
    zc = z_ref[kd:kd + db]                     # (db, mb, 9Cout, L)
    g = 3 * kd
    lt = zc[:, :, g * cout:(g + 1) * cout].reshape(nrow, cout, lanes)
    md = zc[:, :, (g + 1) * cout:(g + 2) * cout].reshape(nrow, cout, lanes)
    rt = zc[:, :, (g + 2) * cout:(g + 3) * cout].reshape(nrow, cout, lanes)
    left = lt if left is None else left + lt
    mid = md if mid is None else mid + md
    right = rt if right is None else right + rt
  acc = (mid.astype(jnp.float32) +
         jnp.where(lanes_i == 0, 0.0,
                   pltpu.roll(left.astype(jnp.float32), 1, axis=2)) +
         jnp.where(lanes_i == lanes - 1, 0.0,
                   pltpu.roll(right.astype(jnp.float32), lanes - 1, axis=2)))
  acc = acc * sb_ref[0][None] + sb_ref[1][None]
  if has_res:
    acc = acc + res_ref[0].reshape(nrow, cout, lanes).astype(jnp.float32)
  if relu:
    acc = jnp.maximum(acc, 0.0)
  o_ref[0] = acc.reshape(db, mb, cout, lanes).astype(o_ref.dtype)


def _pick_blocks(d, m, cin, cout, lanes, itemsize, has_res):
  """Largest (db, mb) whose working set fits the VMEM budget."""
  def vmem(db, mb):
    return (2 * (db + 2) * (mb + 2) * cin * lanes * itemsize +   # bands x2
            2 * db * mb * cout * lanes * itemsize +              # out x2
            (2 * db * mb * cout * lanes * itemsize if has_res else 0) +
            3 * cout * 9 * cin * itemsize +                      # weights
            (db + 2) * mb * 9 * cout * lanes * 4)                # z (f32)

  for db, mb in ((8, 8), (8, 4), (4, 8), (4, 4), (2, 4), (2, 2), (1, 2),
                 (1, 1)):
    if d % db == 0 and m % mb == 0 and vmem(db, mb) <= 10 * 2**20:
      return db, mb
  return None


def _kernel_acc(x_ref, w_ref, sb_ref, res_ref, o_ref, bands_ref, zrow_ref,
                acc_ref, sem, *, db, mb, cin, cout, lanes, relu, has_res):
  """Accumulator variant of :func:`_kernel` (round-5 A/B winner at B>=2).

  The base kernel's f32 z scratch holds ALL (db+2) input rows' (9·Cout, L)
  dot results at once, which caps db — at C=64 the block picker lands on
  (4, 4), so 2 of every 6 input-row dots are D-halo waste. Here each input
  row's dot result accumulates straight into a (db, mb, 3·Cout, L) f32
  accumulator (kw groups; kd resolved at add time), so the scratch shrinks
  ~3x and db grows: halo-compute waste (db+2)/db drops. The di loop
  alternates MXU dots with VPU adds at per-INPUT-row granularity — measured
  WINNING at B>=2 (c32 full 24.0->31.2 TF/s at B=2, c64 half 38.2->43.6 at
  B=6) where the longer grids hide the alternation, and losing at B=1 with
  a residual or at C=64 (scripts/exp_conv3d_v2.py; dispatch in
  ``_use_acc_variant``). Numerically identical to the base kernel: same
  dots, same f32 add order per kw group (max_abs_err 0.0 on-chip)."""
  b = pl.program_id(0)
  d = pl.program_id(1)
  m = pl.program_id(2)
  nd = pl.num_programs(1)
  nm = pl.num_programs(2)
  lin = (b * nd + d) * nm + m
  total = pl.num_programs(0) * nd * nm
  slot = lax.rem(lin, 2)

  def band_dma(slot_idx, b_, d_, m_):
    return pltpu.make_async_copy(
        x_ref.at[b_, pl.ds(d_ * db, db + 2),
                 pl.ds(m_ * mb * cin, (mb + 2) * cin)],
        bands_ref.at[slot_idx], sem.at[slot_idx])

  @pl.when(lin == 0)
  def _first():
    band_dma(slot, b, d, m).start()

  @pl.when(lin + 1 < total)
  def _prefetch():
    nxt = lin + 1
    m2 = lax.rem(nxt, nm)
    d2 = lax.rem(nxt // nm, nd)
    b2 = nxt // (nm * nd)
    band_dma(1 - slot, b2, d2, m2).start()

  band_dma(slot, b, d, m).wait()

  prec = _mxu_precision(w_ref.dtype)
  wmat = w_ref[:].reshape(9 * cout, 3 * cin)
  for di in range(db + 2):
    for mm in range(mb):
      zrow_ref[mm] = jnp.dot(
          wmat, bands_ref[slot, di, mm * cin:(mm + 3) * cin],
          preferred_element_type=jnp.float32, precision=prec)
    # input row di contributes its kd-group to output row dd = di - kd
    for kd in range(3):
      dd = di - kd
      if 0 <= dd < db:
        sl = zrow_ref[:, 3 * kd * cout:(3 * kd + 3) * cout]  # (mb, 3Cout, L)
        if kd == 0:
          acc_ref[dd] = sl
        else:
          acc_ref[dd] += sl

  nrow = db * mb
  a = acc_ref[:].reshape(nrow, 3, cout, lanes)
  lanes_i = jax.lax.broadcasted_iota(jnp.int32, (nrow, cout, lanes), 2)
  acc = (a[:, 1] +
         jnp.where(lanes_i == 0, 0.0, pltpu.roll(a[:, 0], 1, axis=2)) +
         jnp.where(lanes_i == lanes - 1, 0.0,
                   pltpu.roll(a[:, 2], lanes - 1, axis=2)))
  acc = acc * sb_ref[0][None] + sb_ref[1][None]
  if has_res:
    acc = acc + res_ref[0].reshape(nrow, cout, lanes).astype(jnp.float32)
  if relu:
    acc = jnp.maximum(acc, 0.0)
  o_ref[0] = acc.reshape(db, mb, cout, lanes).astype(o_ref.dtype)


def _pick_blocks_acc(d, m, cin, cout, lanes, itemsize, has_res,
                     budget=12 * 2**20):
  """Block picker for :func:`_kernel_acc`: minimize halo-compute waste
  (db+2)/db first, then DMA halo waste (mb+2)/mb, within the VMEM budget."""
  def vmem(db, mb):
    return (2 * (db + 2) * (mb + 2) * cin * lanes * itemsize +   # bands x2
            2 * db * mb * cout * lanes * itemsize +              # out x2
            (2 * db * mb * cout * lanes * itemsize if has_res else 0) +
            3 * cout * 9 * cin * itemsize +                      # weights
            mb * 9 * cout * lanes * 4 +                          # zrow (f32)
            db * mb * 3 * cout * lanes * 4)                      # acc (f32)

  best = None
  for db in (24, 16, 12, 8, 6, 4, 2, 1):
    for mb in (8, 4, 2, 1):
      if d % db == 0 and m % mb == 0 and vmem(db, mb) <= budget:
        cand = ((db + 2) / db, (mb + 2) / mb, db, mb)
        if best is None or cand[:2] < best[:2]:
          best = cand
  return (best[2], best[3]) if best else None


def _use_acc_variant(b, cin, cout, has_res) -> bool:
  """Measured dispatch rule for the accumulator kernel
  (scripts/exp_conv3d_v2.py, TPU v5e, 2026-08-19): it wins every B>=2 case
  (+4% to +30%) and the B=1 cases without a residual at C<=32 or with
  channel reduction (c64->32 +11%); it loses at B=1 with a residual (-8%)
  or at square C=64 (-9%), where the shorter grid can't hide the MXU/VPU
  alternation."""
  if b >= 2:
    return True
  if cin > cout:
    return True
  return not has_res and cin <= 32 and cout <= 32


def conv3d_band_pallas(x: jnp.ndarray, weight: jnp.ndarray,
                       scale: jnp.ndarray | None = None,
                       bias: jnp.ndarray | None = None,
                       residual: jnp.ndarray | None = None,
                       relu: bool = False, m_halo: bool = False
                       ) -> jnp.ndarray:
  """Fused stride-1 3x3x3 conv (+affine +residual +ReLU), lane-major.

  Args:
    x: (B, D, M, C, L) volume, L a multiple of 128, C a multiple of 8.
    weight: (3, 3, 3, C, Cout) in (kd, kh(M), kw(L), in, out) order,
      Cout a multiple of 8.
    scale, bias: optional (Cout,) f32 epilogue affine (folded BatchNorm).
    residual: optional (B, D, M, Cout, L) added before ReLU.
    relu: apply ReLU in the epilogue.
    m_halo: ``x`` already carries its ±1 M halo rows (SPMD shard-local call:
      the neighbours' boundary planes were exchanged over ICI by the caller,
      ``parallel/shard_ops.py``); the output then has M-2 rows.
  Returns:
    (B, D, M_out, Cout, L) in x.dtype (M_out = M - 2 when ``m_halo``).
  """
  b, d, m, cin, lanes = x.shape
  if m_halo:
    m = m - 2
  kd, kh, kw, wcin, cout = weight.shape
  assert (kd, kh, kw) == (3, 3, 3) and wcin == cin
  if cout < 8:
    # narrow heads (e.g. the classif cout=1 conv): zero-pad the output
    # channels to the 8-sublane minimum and slice after — still ~4x faster
    # than any XLA layout for this conv
    pad_to = 8
    weight = jnp.pad(weight, ((0, 0),) * 4 + ((0, pad_to - cout),))
    if scale is not None:
      scale = jnp.pad(scale, (0, pad_to - cout))
    if bias is not None:
      bias = jnp.pad(bias, (0, pad_to - cout))
    if residual is not None:
      residual = jnp.pad(residual,
                         ((0, 0),) * 3 + ((0, pad_to - cout), (0, 0)))
    y = conv3d_band_pallas(x, weight, scale, bias, residual, relu,
                           m_halo=m_halo)
    return y[:, :, :, :cout]
  # lanes must be full 128-tiles: sub-128 lane tiles fail Mosaic lowering
  # (probed on-chip round 3 — the 1/16 hourglass level stays on XLA)
  assert lanes % 128 == 0 and cin % 8 == 0 and cout % 8 == 0
  itemsize = jnp.dtype(x.dtype).itemsize
  has_res = residual is not None

  # accumulator variant where it measures faster (falls back to the base
  # kernel when its picker finds no block fit)
  acc_blocks = (_pick_blocks_acc(d, m, cin, cout, lanes, itemsize, has_res)
                if _use_acc_variant(b, cin, cout, has_res) else None)
  blocks = (acc_blocks if acc_blocks is not None else
            _pick_blocks(d, m, cin, cout, lanes, itemsize, has_res))
  assert blocks is not None, (x.shape,)
  db, mb = blocks

  # fold kw into the GEMM's output rows, one operand per kd:
  # A[kd][s*Cout+co, (kh,ci)]
  w2 = jnp.transpose(weight, (0, 2, 4, 1, 3)).reshape(3, 3 * cout, 3 * cin)
  w2 = w2.astype(x.dtype)

  sb = _affine_sb(scale, bias, cout)

  # pad D/M halos and flatten (M, C) so a kh-window is one sublane slice
  # (when m_halo, the M halo rows arrived with the input)
  m_pad = (0, 0) if m_halo else (1, 1)
  xp = jnp.pad(x, ((0, 0), (1, 1), m_pad, (0, 0), (0, 0)))
  xp = xp.reshape(b, d + 2, (m + 2) * cin, lanes)

  res = residual if has_res else jnp.zeros((b, 1, 1, cout, lanes), x.dtype)
  res_spec = (pl.BlockSpec((1, db, mb, cout, lanes),
                           lambda i, j, k: (i, j, k, 0, 0)) if has_res else
              pl.BlockSpec((1, 1, 1, cout, lanes), lambda i, j, k: (i, 0, 0,
                                                                    0, 0)))

  if acc_blocks is not None:
    kernel = functools.partial(_kernel_acc, db=db, mb=mb, cin=cin,
                               cout=cout, lanes=lanes, relu=relu,
                               has_res=has_res)
    scratch = [
        pltpu.VMEM((2, db + 2, (mb + 2) * cin, lanes), x.dtype),
        pltpu.VMEM((mb, 9 * cout, lanes), jnp.float32),      # zrow
        pltpu.VMEM((db, mb, 3 * cout, lanes), jnp.float32),  # acc
        pltpu.SemaphoreType.DMA((2,)),
    ]
    params = dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=14 * 2**20))
  else:
    kernel = functools.partial(_kernel, db=db, mb=mb, cin=cin, cout=cout,
                               lanes=lanes, relu=relu, has_res=has_res)
    scratch = [
        pltpu.VMEM((2, db + 2, (mb + 2) * cin, lanes), x.dtype),
        # z holds the per-input-row (kd,kw,Cout) pre-shift tiles in f32:
        # storing bf16 here quantizes each of the 9 accumulated taps and
        # was measurably off on-chip (conv3d_bf16_c64to32 max_abs 0.0625)
        pltpu.VMEM((db + 2, mb, 9 * cout, lanes), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    params = {}
  flops = 2 * b * d * m * lanes * 27 * cin * cout
  return pl.pallas_call(
      kernel,
      grid=(b, d // db, m // mb),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((3, 3 * cout, 3 * cin), lambda i, j, k: (0, 0, 0)),
          pl.BlockSpec((2, cout, 1), lambda i, j, k: (0, 0, 0)),
          res_spec,
      ],
      out_specs=pl.BlockSpec((1, db, mb, cout, lanes),
                             lambda i, j, k: (i, j, k, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((b, d, m, cout, lanes), x.dtype),
      scratch_shapes=scratch,
      cost_estimate=pl.CostEstimate(
          flops=flops,
          bytes_accessed=(x.size + res.size if has_res else x.size)
          * itemsize * 2,
          transcendentals=0),
      **params,
  )(xp, w2, sb, res)


def _kernel_s2(x_ref, w_ref, sb_ref, o_ref, bands_ref, z_ref, sem, *,
               db, mb, cin, cout, lanes, relu):
  """Stride-2 variant: grid/blocks index the OUTPUT volume; a block's band
  covers input planes ``2db+1`` and rows ``2mb+1`` (x_ref is the padded
  input, so plane/row ``2*o`` is the left tap of output ``o``). Each output
  plane sums three (3Cout, 3Cin) @ (3Cin, L) dots — one per kd, reusing the
  stride-1 weight layout — and the kw recombination decimates the lanes on
  the MXU: ``out = sum_kw Z_kw @ S_kw`` with ``S_kw[i, j] = (i == 2j+kw-1)``,
  which also zeroes the SAME-pad edge taps for free. The M/D decimation is
  free (the dot windows just step by 2)."""
  b = pl.program_id(0)
  d = pl.program_id(1)
  m = pl.program_id(2)
  nd = pl.num_programs(1)
  nm = pl.num_programs(2)
  lin = (b * nd + d) * nm + m
  total = pl.num_programs(0) * nd * nm
  slot = lax.rem(lin, 2)

  def band_dma(slot_idx, b_, d_, m_):
    return pltpu.make_async_copy(
        x_ref.at[b_, pl.ds(d_ * 2 * db, 2 * db + 1),
                 pl.ds(m_ * 2 * mb * cin, (2 * mb + 1) * cin)],
        bands_ref.at[slot_idx], sem.at[slot_idx])

  @pl.when(lin == 0)
  def _first():
    band_dma(slot, b, d, m).start()

  @pl.when(lin + 1 < total)
  def _prefetch():
    nxt = lin + 1
    m2 = lax.rem(nxt, nm)
    d2 = lax.rem(nxt // nm, nd)
    b2 = nxt // (nm * nd)
    band_dma(1 - slot, b2, d2, m2).start()

  band_dma(slot, b, d, m).wait()

  prec = _mxu_precision(w_ref.dtype)
  for dd in range(db):
    for mo in range(mb):
      acc = None
      for kd in range(3):
        zz = jnp.dot(
            w_ref[kd],
            bands_ref[slot, 2 * dd + kd, 2 * mo * cin:(2 * mo + 3) * cin],
            preferred_element_type=jnp.float32, precision=prec)
        acc = zz if acc is None else acc + zz
      z_ref[dd, mo] = acc                       # (3Cout, L) f32

  half = lanes // 2
  nrow = db * mb
  z = z_ref[:].reshape(nrow, 3 * cout, lanes)
  il = jax.lax.broadcasted_iota(jnp.int32, (lanes, half), 0)
  jl = jax.lax.broadcasted_iota(jnp.int32, (lanes, half), 1)
  # bf16 operands for the selection matmuls on the bf16 path (0/1 entries
  # are exact; the values round to the output dtype anyway — one extra
  # rounding vs the epilogue's) — f32 stays f32 at HIGHEST
  seldt = jnp.bfloat16 if o_ref.dtype == jnp.bfloat16 else jnp.float32
  out = None
  for kw in range(3):
    sel = jnp.where(il == 2 * jl + kw - 1, 1.0, 0.0).astype(seldt)
    g = z[:, kw * cout:(kw + 1) * cout].reshape(nrow * cout, lanes)
    t = jnp.dot(g.astype(seldt), sel, preferred_element_type=jnp.float32,
                precision=_mxu_precision(seldt))
    out = t if out is None else out + t
  out = out.reshape(nrow, cout, half)
  out = out * sb_ref[0][None] + sb_ref[1][None]
  if relu:
    out = jnp.maximum(out, 0.0)
  o_ref[0] = out.reshape(db, mb, cout, half).astype(o_ref.dtype)


def _pick_blocks_s2(d2, m2, cin, cout, lanes, itemsize):
  """(db, mb) in OUTPUT coordinates for the stride-2 kernel."""
  def vmem(db, mb):
    return (2 * (2 * db + 1) * (2 * mb + 1) * cin * lanes * itemsize +
            2 * db * mb * cout * (lanes // 2) * itemsize +
            3 * 3 * cout * 3 * cin * itemsize +
            db * mb * 3 * cout * lanes * 4)

  for db, mb in ((4, 8), (4, 4), (2, 8), (2, 4), (2, 2), (1, 2), (1, 1)):
    if d2 % db == 0 and m2 % mb == 0 and vmem(db, mb) <= 10 * 2**20:
      return db, mb
  return None


def conv3d_band_s2_pallas(x: jnp.ndarray, weight: jnp.ndarray,
                          scale: jnp.ndarray | None = None,
                          bias: jnp.ndarray | None = None,
                          relu: bool = False,
                          m_halo: bool = False) -> jnp.ndarray:
  """Fused stride-2 pad-1 3x3x3 conv (+affine +ReLU), lane-major.

  Args:
    x: (B, D, M, C, L) with D, M, L even, L a multiple of 128, C of 8.
    weight: (3, 3, 3, C, Cout) in (kd, k_band, k_lane, in, out) order.
    m_halo: ``x`` already carries its ±1 M halo rows (SPMD shard-local
      call, ``parallel/shard_ops.py``); output then has (M-2)//2 rows.
  Returns:
    (B, D//2, M//2, Cout, L//2) in x.dtype (lane axis is halved, NOT
    re-tiled: downstream band convs need ``L//2 >= 128`` or an XLA hop).

  The XLA lane-major stride-2 conv runs at 3-6 bf16-TFLOP/s at the
  hourglass shapes (both C dims < 128 starve the MXU; round-3 probes) and
  the phase-packed s2d XLA form is transpose-bound; this kernel keeps the
  band structure (55-65 TFLOP/s raw) and pays only the 3 selection matmuls
  (+44% MACs) for the lane decimation.
  """
  b, d, m, cin, lanes = x.shape
  if m_halo:
    m = m - 2
  kd, kh, kw, wcin, cout = weight.shape
  assert (kd, kh, kw) == (3, 3, 3) and wcin == cin
  assert d % 2 == 0 and m % 2 == 0 and lanes % 128 == 0
  assert cin % 8 == 0 and cout % 8 == 0
  itemsize = jnp.dtype(x.dtype).itemsize

  blocks = _pick_blocks_s2(d // 2, m // 2, cin, cout, lanes, itemsize)
  assert blocks is not None, (x.shape,)
  db, mb = blocks

  w2 = jnp.transpose(weight, (0, 2, 4, 1, 3)).reshape(3, 3 * cout, 3 * cin)
  w2 = w2.astype(x.dtype)

  sb = _affine_sb(scale, bias, cout)

  m_pad = (0, 0) if m_halo else (1, 1)
  xp = jnp.pad(x, ((0, 0), (1, 1), m_pad, (0, 0), (0, 0)))
  xp = xp.reshape(b, d + 2, (m + 2) * cin, lanes)

  kernel = functools.partial(_kernel_s2, db=db, mb=mb, cin=cin, cout=cout,
                             lanes=lanes, relu=relu)
  flops = 2 * b * (d // 2) * (m // 2) * (lanes // 2) * 27 * cin * cout
  return pl.pallas_call(
      kernel,
      grid=(b, d // 2 // db, m // 2 // mb),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((3, 3 * cout, 3 * cin), lambda i, j, k: (0, 0, 0)),
          pl.BlockSpec((2, cout, 1), lambda i, j, k: (0, 0, 0)),
      ],
      out_specs=pl.BlockSpec((1, db, mb, cout, lanes // 2),
                             lambda i, j, k: (i, j, k, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((b, d // 2, m // 2, cout, lanes // 2),
                                     x.dtype),
      scratch_shapes=[
          pltpu.VMEM((2, 2 * db + 1, (2 * mb + 1) * cin, lanes), x.dtype),
          pltpu.VMEM((db, mb, 3 * cout, lanes), jnp.float32),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      cost_estimate=pl.CostEstimate(
          flops=flops * 2,           # dots compute full-lane pre-decimation
          bytes_accessed=x.size * itemsize * 2,
          transcendentals=0),
  )(xp, w2, sb)


def band_s2_ok(x_shape, cout, itemsize: int = 2) -> bool:
  """Static gate for :func:`conv3d_band_s2_pallas` (lane-major shapes).
  Under an active mesh the sharded wrapper (``parallel/shard_ops.py:
  conv3d_band_s2_sharded``) runs shard-local, so the gate checks the mesh
  axes divide B and the band axis (each shard's row range must start on an
  even global index)."""
  b, d, m, c, lanes = x_shape
  if d % 2 or m % 2 or lanes % 128 or c % 8 or cout % 8:
    return False
  from mode_tpu.parallel.mesh import active_mesh
  mesh = active_mesh()
  if mesh is not None and mesh.size > 1:
    dp = mesh.shape.get("data", 1)
    sp = mesh.shape.get("spatial", 1)
    if b % dp != 0 or m % (2 * sp) != 0:
      return False
    m = m // sp
  if _pick_blocks_s2(d // 2, m // 2, c, cout, lanes, itemsize) is None:
    return False
  if _CONV3D_MODE == "off":
    return False
  if _CONV3D_MODE == "on":
    return True
  return _platform_ok()


def _kernel_dec(x_ref, wa_ref, wb_ref, sb_ref, o_ref, bands_ref, z_ref, sem,
                *, db, mb, cin, cout, lanes, relu, m_halo):
  """Transpose-conv (k=3, stride 2, pad 1, output_padding 1) band kernel.

  Grid/blocks index the INPUT volume; each (db, mb) input block emits a
  (2db, 2mb, Cout, 2L) output block. Sub-pixel decomposition: output plane
  ``2d+phi_d`` reads input plane d (flipped tap kd=1) when ``phi_d=0`` and
  planes d, d+1 (taps kd=0, kd=2) when ``phi_d=1`` — same for rows via the
  contraction (``wb`` carries the two row taps over a contiguous (2C, L)
  band slice), so every MAC is a useful deconv FLOP. The k_lane taps fold
  into the dot's output rows as usual; the lane doubling is two scatter
  matmuls ``out = g1 @ S(j==2i) + odd @ S(j==2i+1)``.
  """
  b = pl.program_id(0)
  d = pl.program_id(1)
  m = pl.program_id(2)
  nd = pl.num_programs(1)
  nm = pl.num_programs(2)
  lin = (b * nd + d) * nm + m
  total = pl.num_programs(0) * nd * nm
  slot = lax.rem(lin, 2)
  row0 = 1 if m_halo else 0

  def band_dma(slot_idx, b_, d_, m_):
    return pltpu.make_async_copy(
        x_ref.at[b_, pl.ds(d_ * db, db + 1),
                 pl.ds((m_ * mb + row0) * cin, (mb + 1) * cin)],
        bands_ref.at[slot_idx], sem.at[slot_idx])

  @pl.when(lin == 0)
  def _first():
    band_dma(slot, b, d, m).start()

  @pl.when(lin + 1 < total)
  def _prefetch():
    nxt = lin + 1
    m2 = lax.rem(nxt, nm)
    d2 = lax.rem(nxt // nm, nd)
    b2 = nxt // (nm * nd)
    band_dma(1 - slot, b2, d2, m2).start()

  band_dma(slot, b, d, m).wait()

  prec = _mxu_precision(wa_ref.dtype)

  def dot_a(kd, dd, mi):          # single-row tap (phi_m = 0)
    return jnp.dot(wa_ref[kd], bands_ref[slot, dd, mi * cin:(mi + 1) * cin],
                   preferred_element_type=jnp.float32, precision=prec)

  def dot_b(kd, dd, mi):          # two-row taps (phi_m = 1)
    return jnp.dot(wb_ref[kd], bands_ref[slot, dd, mi * cin:(mi + 2) * cin],
                   preferred_element_type=jnp.float32, precision=prec)

  for dd in range(db):
    for mi in range(mb):
      z_ref[2 * dd, 2 * mi] = dot_a(1, dd, mi)
      z_ref[2 * dd, 2 * mi + 1] = dot_b(1, dd, mi)
      z_ref[2 * dd + 1, 2 * mi] = dot_a(0, dd, mi) + dot_a(2, dd + 1, mi)
      z_ref[2 * dd + 1, 2 * mi + 1] = (dot_b(0, dd, mi) +
                                       dot_b(2, dd + 1, mi))

  nrow = 4 * db * mb
  z = z_ref[:].reshape(nrow, 3 * cout, lanes)
  g0 = z[:, :cout].reshape(nrow * cout, lanes)
  g1 = z[:, cout:2 * cout].reshape(nrow * cout, lanes)
  g2 = z[:, 2 * cout:].reshape(nrow * cout, lanes)
  lanes_i = jax.lax.broadcasted_iota(jnp.int32, (nrow * cout, lanes), 1)
  odd = g0 + jnp.where(lanes_i == lanes - 1, 0.0,
                       pltpu.roll(g2, lanes - 1, axis=1))

  seldt = jnp.bfloat16 if o_ref.dtype == jnp.bfloat16 else jnp.float32
  il = jax.lax.broadcasted_iota(jnp.int32, (lanes, 2 * lanes), 0)
  jl = jax.lax.broadcasted_iota(jnp.int32, (lanes, 2 * lanes), 1)
  se = jnp.where(jl == 2 * il, 1.0, 0.0).astype(seldt)
  so = jnp.where(jl == 2 * il + 1, 1.0, 0.0).astype(seldt)
  out = (jnp.dot(g1.astype(seldt), se, preferred_element_type=jnp.float32,
                 precision=_mxu_precision(seldt)) +
         jnp.dot(odd.astype(seldt), so, preferred_element_type=jnp.float32,
                 precision=_mxu_precision(seldt)))
  out = out.reshape(nrow, cout, 2 * lanes)
  out = out * sb_ref[0][None] + sb_ref[1][None]
  if relu:
    out = jnp.maximum(out, 0.0)
  o_ref[0] = out.reshape(2 * db, 2 * mb, cout, 2 * lanes).astype(o_ref.dtype)


def _pick_blocks_dec(d, m, cin, cout, lanes, itemsize):
  """(db, mb) in INPUT coordinates for the deconv kernel."""
  def vmem(db, mb):
    return (2 * (db + 1) * (mb + 1) * cin * lanes * itemsize +
            2 * 4 * db * mb * cout * 2 * lanes * itemsize +
            3 * 3 * cout * 3 * cin * itemsize +
            4 * db * mb * 3 * cout * lanes * 4)

  for db, mb in ((4, 8), (4, 4), (2, 4), (2, 2), (1, 2), (1, 1)):
    if d % db == 0 and m % mb == 0 and vmem(db, mb) <= 10 * 2**20:
      return db, mb
  return None


def conv3d_band_deconv_pallas(x: jnp.ndarray, kernel_t: jnp.ndarray,
                              scale: jnp.ndarray | None = None,
                              bias: jnp.ndarray | None = None,
                              relu: bool = False, lane_axis: int = 3,
                              m_halo: bool = False) -> jnp.ndarray:
  """Fused ConvTranspose3d(k=3, s=2, p=1, op=1) (+affine +ReLU), lane-major.

  Args:
    x: (B, D, M, C, L), L a multiple of 128, C and Cout multiples of 8.
    kernel_t: torch-layout transpose-conv param (3, 3, 3, O, I)
      (``models/blocks.py:ConvTranspose``).
    lane_axis: 3 if the NDHWC W axis rides the lanes, 2 for H (selects the
      (k_band, k_lane) order of the taps).
    m_halo: ``x`` carries ±1 M halo rows (shard-local call); the left halo
      row is skipped (a transpose conv has no left dependence), the right
      one supplies the cross-shard tap.
  Returns:
    (B, 2D, 2M, Cout, 2L) in x.dtype.

  The XLA path lowers this via ``lhs_dilation`` — a 27-tap conv over a
  zero-stuffed volume where only 27/64 of MACs are useful, measured 4-8
  effective bf16-TFLOP/s at the hourglass decoder shapes. Here every dot
  MAC is useful; the only overhead is the two lane-scatter matmuls.
  """
  b, d, m, cin, lanes = x.shape
  if m_halo:
    m = m - 2
  assert lanes % 128 == 0 and cin % 8 == 0
  kd_, kh_, kw_, cout, wcin = kernel_t.shape
  assert (kd_, kh_, kw_) == (3, 3, 3) and wcin == cin
  assert cout % 8 == 0
  itemsize = jnp.dtype(x.dtype).itemsize

  blocks = _pick_blocks_dec(d, m, cin, cout, lanes, itemsize)
  assert blocks is not None, (x.shape,)
  db, mb = blocks

  # flipped kernel, (kd, k_band, k_lane, I, O)
  wf = jnp.swapaxes(jnp.flip(kernel_t, axis=(0, 1, 2)), -1, -2)
  if lane_axis == 2:
    wf = jnp.transpose(wf, (0, 2, 1, 3, 4))
  # fold k_lane into output rows: rows (k_lane, cout)
  # wa[kd] : (3Cout, C)   single-row taps (k_band = 1)
  # wb[kd] : (3Cout, 2C)  row-pair taps (k_band = 0 @ row, k_band = 2 @ +1)
  wa = jnp.transpose(wf[:, 1], (0, 1, 3, 2))       # (kd, k_lane, O, C)
  wa = wa.reshape(3, 3 * cout, cin).astype(x.dtype)
  wb = jnp.stack([wf[:, 0], wf[:, 2]], axis=3)     # (kd, kl, I, 2, O)
  wb = jnp.transpose(wb, (0, 1, 4, 3, 2))          # (kd, kl, O, 2, I)
  wb = wb.reshape(3, 3 * cout, 2 * cin).astype(x.dtype)

  sb = _affine_sb(scale, bias, cout)

  # +1 right halo on D and M (the (k-1-p, k-1-p+op) pad of the dilated
  # input reduces to one trailing plane/row of zeros)
  m_pad = (0, 0) if m_halo else (0, 1)
  xp = jnp.pad(x, ((0, 0), (0, 1), m_pad, (0, 0), (0, 0)))
  mp = xp.shape[2]
  xp = xp.reshape(b, d + 1, mp * cin, lanes)

  kernel = functools.partial(_kernel_dec, db=db, mb=mb, cin=cin, cout=cout,
                             lanes=lanes, relu=relu, m_halo=m_halo)
  flops = 2 * b * d * m * lanes * 27 * cin * cout
  return pl.pallas_call(
      kernel,
      grid=(b, d // db, m // mb),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((3, 3 * cout, cin), lambda i, j, k: (0, 0, 0)),
          pl.BlockSpec((3, 3 * cout, 2 * cin), lambda i, j, k: (0, 0, 0)),
          pl.BlockSpec((2, cout, 1), lambda i, j, k: (0, 0, 0)),
      ],
      out_specs=pl.BlockSpec((1, 2 * db, 2 * mb, cout, 2 * lanes),
                             lambda i, j, k: (i, j, k, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((b, 2 * d, 2 * m, cout, 2 * lanes),
                                     x.dtype),
      scratch_shapes=[
          pltpu.VMEM((2, db + 1, (mb + 1) * cin, lanes), x.dtype),
          pltpu.VMEM((2 * db, 2 * mb, 3 * cout, lanes), jnp.float32),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      cost_estimate=pl.CostEstimate(
          flops=flops,
          bytes_accessed=x.size * itemsize * 2,
          transcendentals=0),
  )(xp, wa, wb, sb)


def band_deconv_ok(x_shape, cout, itemsize: int = 2) -> bool:
  """Static gate for :func:`conv3d_band_deconv_pallas`."""
  b, d, m, c, lanes = x_shape
  if lanes % 128 or c % 8 or cout % 8:
    return False
  from mode_tpu.parallel.mesh import active_mesh
  mesh = active_mesh()
  if mesh is not None and mesh.size > 1:
    dp = mesh.shape.get("data", 1)
    sp = mesh.shape.get("spatial", 1)
    if b % dp != 0 or m % sp != 0:
      return False
    m = m // sp
  if _pick_blocks_dec(d, m, c, cout, lanes, itemsize) is None:
    return False
  if _CONV3D_MODE == "off":
    return False
  if _CONV3D_MODE == "on":
    return True
  return _platform_ok()


def _kernel_fold(x_ref, w_ref, sb_ref, o_ref, bands_ref, z_ref, sem, *,
                 db, cin, cout, mdim, ldim, relu):
  """Folded-lane stride-1 3x3x3 conv: BOTH small spatial axes ride the
  lanes as F = M·L (M major), so the only non-lane axis left is D — bands
  are (db+2, C, F) D-halo slabs. One (9Cout, 3C) @ (3C, F) dot per output
  plane folds all k_M/k_L taps into the output rows and kd into the
  contraction; the recombination is 9 masked multi-tile lane rolls (the
  masks re-impose the M/L SAME-pad borders that folding erased)."""
  b = pl.program_id(0)
  d = pl.program_id(1)
  nd = pl.num_programs(1)
  lin = b * nd + d
  total = pl.num_programs(0) * nd
  slot = lax.rem(lin, 2)
  fdim = mdim * ldim

  def band_dma(slot_idx, b_, d_):
    return pltpu.make_async_copy(
        x_ref.at[b_, pl.ds(d_ * db * cin, (db + 2) * cin)],
        bands_ref.at[slot_idx], sem.at[slot_idx])

  @pl.when(lin == 0)
  def _first():
    band_dma(slot, b, d).start()

  @pl.when(lin + 1 < total)
  def _prefetch():
    nxt = lin + 1
    band_dma(1 - slot, nxt // nd, lax.rem(nxt, nd)).start()

  band_dma(slot, b, d).wait()

  prec = _mxu_precision(w_ref.dtype)
  wmat = w_ref[:]
  for dd in range(db):
    z_ref[dd] = jnp.dot(wmat, bands_ref[slot, dd * cin:(dd + 3) * cin],
                        preferred_element_type=jnp.float32, precision=prec)

  fi = jax.lax.broadcasted_iota(jnp.int32, (db, cout, fdim), 2)
  mi = fi // ldim
  li = lax.rem(fi, ldim)
  z = z_ref[:]                                  # (db, 9Cout, F) f32
  acc = None
  for km in range(3):
    for kl in range(3):
      g = z[:, (3 * km + kl) * cout:(3 * km + kl + 1) * cout]
      k = ((1 - km) * ldim + (1 - kl)) % fdim   # t[f] = g[f + shift]
      t = pltpu.roll(g, k, axis=2) if k else g
      valid = None
      if km == 0:
        valid = mi >= 1
      elif km == 2:
        valid = mi <= mdim - 2
      if kl == 0:
        v2 = li >= 1
        valid = v2 if valid is None else valid & v2
      elif kl == 2:
        v2 = li <= ldim - 2
        valid = v2 if valid is None else valid & v2
      t = t if valid is None else jnp.where(valid, t, 0.0)
      acc = t if acc is None else acc + t
  acc = acc * sb_ref[0][None] + sb_ref[1][None]
  if relu:
    acc = jnp.maximum(acc, 0.0)
  o_ref[0] = acc.astype(o_ref.dtype)


def _pick_blocks_fold(d, cin, cout, fdim, itemsize):
  def vmem(db):
    return (2 * (db + 2) * cin * fdim * itemsize +   # bands x2
            2 * db * cout * fdim * itemsize +        # out x2
            9 * cout * 3 * cin * itemsize +          # weights
            db * 9 * cout * fdim * 4)                # z (f32)

  for db in (4, 2, 1):
    if d % db == 0 and vmem(db) <= 10 * 2**20:
      return db
  return None


def conv3d_fold_pallas(x: jnp.ndarray, weight: jnp.ndarray,
                       scale: jnp.ndarray | None = None,
                       bias: jnp.ndarray | None = None,
                       relu: bool = False) -> jnp.ndarray:
  """Fused stride-1 3x3x3 conv for levels where NO single axis fills the
  128 TPU lanes (the 1/16 hourglass level: M=32, L=64) — M and L fold
  together onto the lanes. XLA runs these convs at ~3 bf16-TFLOP/s (every
  axis starves the MXU; `docs/PROFILES.md` round-3 probes). Serves the
  hourglass conv4 (`/root/reference/models/mode_disparity.py:21,37`).

  Args:
    x: (B, D, M, C, L) lane-major volume, M·L a multiple of 128.
    weight: (3, 3, 3, C, Cout) in (kd, k_M, k_L, in, out) order.
    scale, bias: optional (Cout,) f32 epilogue affine (folded BatchNorm).
    relu: apply ReLU in the epilogue.
  Returns:
    (B, D, M, Cout, L) in x.dtype.
  """
  b, d, m, cin, ldim = x.shape
  kd, kh, kw, wcin, cout = weight.shape
  assert (kd, kh, kw) == (3, 3, 3) and wcin == cin
  fdim = m * ldim
  assert fdim % 128 == 0 and cin % 8 == 0 and cout % 8 == 0
  itemsize = jnp.dtype(x.dtype).itemsize
  db = _pick_blocks_fold(d, cin, cout, fdim, itemsize)
  assert db is not None, (x.shape,)

  # rows (k_M, k_L, co), cols (kd, ci)
  w2 = jnp.transpose(weight, (1, 2, 4, 0, 3)).reshape(9 * cout, 3 * cin)
  w2 = w2.astype(x.dtype)
  sb = _affine_sb(scale, bias, cout)

  xf = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, d, cin, fdim)
  xp = jnp.pad(xf, ((0, 0), (1, 1), (0, 0), (0, 0)))
  xp = xp.reshape(b, (d + 2) * cin, fdim)

  kernel = functools.partial(_kernel_fold, db=db, cin=cin, cout=cout,
                             mdim=m, ldim=ldim, relu=relu)
  flops = 2 * b * d * fdim * 27 * cin * cout
  y = pl.pallas_call(
      kernel,
      grid=(b, d // db),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((9 * cout, 3 * cin), lambda i, j: (0, 0)),
          pl.BlockSpec((2, cout, 1), lambda i, j: (0, 0, 0)),
      ],
      out_specs=pl.BlockSpec((1, db, cout, fdim), lambda i, j: (i, j, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((b, d, cout, fdim), x.dtype),
      scratch_shapes=[
          pltpu.VMEM((2, (db + 2) * cin, fdim), x.dtype),
          pltpu.VMEM((db, 9 * cout, fdim), jnp.float32),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=x.size * itemsize * 2,
          transcendentals=0),
  )(xp, w2, sb)
  return jnp.transpose(y.reshape(b, d, cout, m, ldim), (0, 1, 3, 2, 4))


def fold_pallas_ok(x_shape, cout, itemsize: int = 2) -> bool:
  """Static gate for :func:`conv3d_fold_pallas` (lane-major shapes whose
  lane axis is sub-128 but whose M·L fold fills whole lane tiles). Under an
  active mesh this path has no shard_map wrapper yet, so it defers to the
  XLA lane path (which the SPMD partitioner can split)."""
  if _CONV3D_MODE == "off" or _FOLD_MODE == "off":
    return False
  b, d, m, c, lanes = x_shape
  if lanes % 128 == 0:          # full lane tiles: the band kernel is better
    return False
  if (m * lanes) % 128 or c % 8 or cout % 8:
    return False
  from mode_tpu.parallel.mesh import active_mesh
  mesh = active_mesh()
  if mesh is not None and mesh.size > 1:
    return False
  if _pick_blocks_fold(d, c, max(cout, 8), m * lanes, itemsize) is None:
    return False
  if _CONV3D_MODE == "on" or _FOLD_MODE == "on":
    return True
  if not _FOLD_ON_CHIP_VERIFIED:
    # interpret-mode parity is green, but the Mosaic lowering of the folded
    # kernels has not run on a real chip yet — keep auto dispatch off until
    # scripts/tpu_kernel_check.py passes the conv3d_fold_* checks
    return False
  return _platform_ok()


# (km, kl) tap -> ((pm, pl) output phase, (dm, dl) input offset) for the
# k=3 s=2 p=1 op=1 transpose conv in folded-lane space: even outputs read
# the flipped-centre tap at the same input index; odd outputs read taps
# 0 (same index) and 2 (index + 1) — the folded analogue of
# ``_kernel_dec``'s dot_a/dot_b structure.
_DEC_PHASE = {0: (1, 0), 1: (0, 0), 2: (1, 1)}


def _kernel_fold_dec(x_ref, wa_ref, wb_ref, sb_ref, o_ref, bands_ref, z_ref,
                     sem, *, cin, cout, mdim, ldim, relu):
  """Folded-lane transpose conv (k=3, s=2, p=1, op=1): grid is
  (B, D_in, phase_d); each block emits the 4 (pm, pl) output phases of one
  output plane as separate folded F-planes (interleaved to the 1/8-level
  lane-major layout by XLA outside the kernel — cheap, vs 8x the MACs XLA
  spends on the zero-stuffed ``lhs_dilation`` form at this shape)."""
  b = pl.program_id(0)
  d = pl.program_id(1)
  pd = pl.program_id(2)
  nd = pl.num_programs(1)
  fdim = mdim * ldim
  # both phase_d grid steps of one (b, d) share one band: DMA it on the
  # even step, prefetch the NEXT (b, d)'s band on the odd step (pair p uses
  # slot p%2, so its band survives until pair p+2's prefetch — grid steps
  # are sequential)
  pair = b * nd + d
  npairs = pl.num_programs(0) * nd
  slot = lax.rem(pair, 2)

  def band_dma(slot_idx, b_, d_):
    return pltpu.make_async_copy(
        x_ref.at[b_, pl.ds(d_ * cin, 2 * cin)],
        bands_ref.at[slot_idx], sem.at[slot_idx])

  @pl.when((pair == 0) & (pd == 0))
  def _first():
    band_dma(slot, b, d).start()

  @pl.when((pd == 1) & (pair + 1 < npairs))
  def _prefetch():
    nxt = pair + 1
    band_dma(1 - slot, nxt // nd, lax.rem(nxt, nd)).start()

  @pl.when(pd == 0)
  def _wait():
    band_dma(slot, b, d).wait()

  prec = _mxu_precision(wa_ref.dtype)
  # even output plane (2d): flipped-centre kd tap @ plane d;
  # odd (2d+1): kd=0 @ plane d + kd=2 @ plane d+1 (one (9Cout, 2C) dot)
  @pl.when(pd == 0)
  def _even():
    z_ref[:] = jnp.dot(wa_ref[:], bands_ref[slot, :cin],
                       preferred_element_type=jnp.float32, precision=prec)

  @pl.when(pd == 1)
  def _odd():
    z_ref[:] = jnp.dot(wb_ref[:], bands_ref[slot],
                       preferred_element_type=jnp.float32, precision=prec)

  fi = jax.lax.broadcasted_iota(jnp.int32, (cout, fdim), 1)
  mi = fi // ldim
  li = lax.rem(fi, ldim)
  z = z_ref[:]
  accs = [[None, None], [None, None]]
  for km in range(3):
    for kl in range(3):
      pm, dm = _DEC_PHASE[km]
      pl_, dl = _DEC_PHASE[kl]
      g = z[(3 * km + kl) * cout:(3 * km + kl + 1) * cout]
      k = (-(dm * ldim + dl)) % fdim            # t[f] = g[f + dm*L + dl]
      t = pltpu.roll(g, k, axis=1) if k else g
      valid = None
      if dm:
        valid = mi <= mdim - 2
      if dl:
        v2 = li <= ldim - 2
        valid = v2 if valid is None else valid & v2
      t = t if valid is None else jnp.where(valid, t, 0.0)
      accs[pm][pl_] = t if accs[pm][pl_] is None else accs[pm][pl_] + t
  for pm in range(2):
    for pl_ in range(2):
      acc = accs[pm][pl_] * sb_ref[0] + sb_ref[1]
      if relu:
        acc = jnp.maximum(acc, 0.0)
      o_ref[0, 0, 2 * pm + pl_] = acc.astype(o_ref.dtype)


def conv3d_fold_deconv_pallas(x: jnp.ndarray, kernel_t: jnp.ndarray,
                              scale: jnp.ndarray | None = None,
                              bias: jnp.ndarray | None = None,
                              relu: bool = False,
                              lane_axis: int = 3) -> jnp.ndarray:
  """Fused ConvTranspose3d(k=3, s=2, p=1, op=1) for levels where no single
  axis fills the lanes (the 1/16 -> 1/8 hourglass decoder step): M and L
  fold onto the lanes; the 8 sub-pixel phases come out as separate folded
  planes and XLA interleaves them into the (B, 2D, 2M, Cout, 2L)
  lane-major volume the 1/8 level uses. Serves the hourglass conv5
  (`/root/reference/models/mode_disparity.py:23,40-42`).

  Args:
    x: (B, D, M, C, L) lane-major volume, M·L a multiple of 128.
    kernel_t: torch-layout transpose-conv param (3, 3, 3, O, I).
    lane_axis: 3 if the NDHWC W axis rides the lanes, 2 for H.
  Returns:
    (B, 2D, 2M, Cout, 2L) in x.dtype.
  """
  b, d, m, cin, ldim = x.shape
  fdim = m * ldim
  assert fdim % 128 == 0 and cin % 8 == 0
  kd_, kh_, kw_, cout, wcin = kernel_t.shape
  assert (kd_, kh_, kw_) == (3, 3, 3) and wcin == cin
  assert cout % 8 == 0
  itemsize = jnp.dtype(x.dtype).itemsize

  wf = jnp.swapaxes(jnp.flip(kernel_t, axis=(0, 1, 2)), -1, -2)
  if lane_axis == 2:
    wf = jnp.transpose(wf, (0, 2, 1, 3, 4))     # (kd, k_M, k_L, I, O)
  # rows (k_M, k_L, co), cols ci — one matrix per kd
  aa = jnp.transpose(wf, (0, 1, 2, 4, 3)).reshape(3, 9 * cout, cin)
  wa = aa[1].astype(x.dtype)
  wb = jnp.concatenate([aa[0], aa[2]], axis=1).astype(x.dtype)

  sb = _affine_sb(scale, bias, cout)

  xf = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, d, cin, fdim)
  xp = jnp.pad(xf, ((0, 0), (0, 1), (0, 0), (0, 0)))    # +1 right D halo
  xp = xp.reshape(b, (d + 1) * cin, fdim)

  kernel = functools.partial(_kernel_fold_dec, cin=cin, cout=cout,
                             mdim=m, ldim=ldim, relu=relu)
  flops = 2 * b * d * fdim * 27 * cin * cout
  y = pl.pallas_call(
      kernel,
      grid=(b, d, 2),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((9 * cout, cin), lambda i, j, k: (0, 0)),
          pl.BlockSpec((9 * cout, 2 * cin), lambda i, j, k: (0, 0)),
          pl.BlockSpec((2, cout, 1), lambda i, j, k: (0, 0, 0)),
      ],
      out_specs=pl.BlockSpec((1, 1, 4, cout, fdim),
                             lambda i, j, k: (i, 2 * j + k, 0, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((b, 2 * d, 4, cout, fdim), x.dtype),
      scratch_shapes=[
          pltpu.VMEM((2, 2 * cin, fdim), x.dtype),
          pltpu.VMEM((9 * cout, fdim), jnp.float32),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=x.size * itemsize * 4,
          transcendentals=0),
  )(xp, wa, wb, sb)
  # dim1 already interleaves (d, phase_d); unfold the (pm, pl) phases and
  # the (M, L) fold, then interleave them into the 1/8-level layout
  y = y.reshape(b, 2 * d, 2, 2, cout, m, ldim)
  y = jnp.transpose(y, (0, 1, 5, 2, 4, 6, 3))
  return y.reshape(b, 2 * d, 2 * m, cout, 2 * ldim)


def fold_deconv_ok(x_shape, cout, itemsize: int = 2) -> bool:
  """Static gate for :func:`conv3d_fold_deconv_pallas` (no shard_map
  wrapper: defers to the XLA lane path under an active mesh)."""
  if _CONV3D_MODE == "off" or _FOLD_MODE == "off":
    return False
  b, d, m, c, lanes = x_shape
  if lanes % 128 == 0:          # full lane tiles: band deconv kernel
    return False
  fdim = m * lanes
  if fdim % 128 or c % 8 or cout % 8:
    return False
  from mode_tpu.parallel.mesh import active_mesh
  mesh = active_mesh()
  if mesh is not None and mesh.size > 1:
    return False
  vmem = (2 * 2 * c * fdim * itemsize + 9 * max(cout, 8) * fdim * 4 +
          2 * 4 * max(cout, 8) * fdim * itemsize)
  if vmem > 10 * 2**20:
    return False
  if _CONV3D_MODE == "on" or _FOLD_MODE == "on":
    return True
  if not _FOLD_ON_CHIP_VERIFIED:
    return False                    # see fold_pallas_ok
  return _platform_ok()


def lane_axis_for(shape) -> int | None:
  """Which NDHWC spatial axis rides the lanes: 3 (W) or 2 (H), else None."""
  _, _, h, w, _ = shape
  if w % 128 == 0:
    return 3
  if h % 128 == 0:
    return 2
  return None


def to_lane_major(x: jnp.ndarray, lane_axis: int) -> jnp.ndarray:
  """NDHWC -> (B, D, M, C, L) with L = the chosen spatial axis."""
  return (jnp.transpose(x, (0, 1, 2, 4, 3)) if lane_axis == 3
          else jnp.transpose(x, (0, 1, 3, 4, 2)))


def from_lane_major(x: jnp.ndarray, lane_axis: int) -> jnp.ndarray:
  """(B, D, M, C, L) -> NDHWC."""
  return (jnp.transpose(x, (0, 1, 2, 4, 3)) if lane_axis == 3
          else jnp.transpose(x, (0, 1, 4, 2, 3)))


def weight_lane_major(w: jnp.ndarray, lane_axis: int) -> jnp.ndarray:
  """(KD, KH, KW, I, O) -> (kd, k_band, k_lane, I, O)."""
  return w if lane_axis == 3 else jnp.transpose(w, (0, 2, 1, 3, 4))


def conv3d_fused(x: jnp.ndarray, weight: jnp.ndarray,
                 scale: jnp.ndarray | None = None,
                 bias: jnp.ndarray | None = None,
                 residual: jnp.ndarray | None = None,
                 relu: bool = False) -> jnp.ndarray:
  """NDHWC wrapper around :func:`conv3d_band_pallas` (transposes in/out).

  Callers that keep whole stacks on-chip should stay in the lane-major
  layout and call :func:`conv3d_band_pallas` directly instead.
  """
  la = lane_axis_for(x.shape)
  assert la is not None, x.shape
  y = conv3d_band_pallas(
      to_lane_major(x, la), weight_lane_major(weight, la), scale, bias,
      None if residual is None else to_lane_major(residual, la), relu)
  return from_lane_major(y, la)


def conv3d_pallas_eligible(shape, kernel, stride, pad, cout) -> bool:
  """Static gate for the Pallas conv3d fast path (NDHWC shapes)."""
  if tuple(kernel) != (3, 3, 3) or tuple(stride) != (1, 1, 1):
    return False
  if tuple(pad) != (1, 1, 1):
    return False
  b, d, h, w, c = shape
  if c % 8 != 0 or cout % 8 != 0:
    return False
  return lane_axis_for(shape) is not None


_CONV3D_MODE = "auto"   # "auto" | "on" | "off"

# Verified on a TPU v5e chip 2026-08-18: scripts/tpu_kernel_check.py passed
# all four conv3d_fold_* checks (conv4/conv5 production shapes bf16 + f32
# smalls, max_abs <= 0.016) — the folded kernels' Mosaic lowering is sound,
# so auto dispatch may select them.
_FOLD_ON_CHIP_VERIFIED = True

_FOLD_MODE = "auto"   # "auto" | "on" | "off" — see set_fold_pallas


def set_fold_pallas(mode: str):
  """Force/forbid/auto-select the folded-lane kernels independently of the
  band kernels (tests: the mesh-equality tests pin the shard_map'd band
  kernels against single-device output, and the fold kernels — which have
  no shard wrapper — must then dispatch identically on both sides)."""
  global _FOLD_MODE
  assert mode in ("auto", "on", "off")
  _FOLD_MODE = mode

# Training fast path: set by the train-step builders (training.py) when the
# step runs WITHOUT a device mesh. The Pallas custom-call cannot be
# partitioned by the SPMD partitioner, so sharded (multi-chip) training
# keeps the XLA conv path.
#
# ON by default since round 4, gated to per-shard batch >= MIN_BATCH: the
# full-step A/B (scripts/bench_train_s1.py, 2026-08-19, full-res bf16 +
# remat + strided paths) measured the stride-1 custom-VJP band conv at
# B=2 WINNING 294.9 -> 281.9 ms/example (-4.4%, the gain concentrated at
# the 1/8 hourglass level) and at B=1 LOSING 439.4 -> 464.9 ms (+6%, the
# round-3 result) — at B=1 the per-call lane transposes + lost BN/ReLU
# fusion outweigh the GEMM win, at B>=2 the batched GEMMs amortize them.
_TRAIN_PALLAS = True
_TRAIN_PALLAS_MIN_BATCH = 2


def set_conv3d_train_min_batch(n: int):
  global _TRAIN_PALLAS_MIN_BATCH
  _TRAIN_PALLAS_MIN_BATCH = int(n)


def set_conv3d_train_pallas(enabled: bool):
  global _TRAIN_PALLAS
  _TRAIN_PALLAS = bool(enabled)


# Scope for the stride-1 custom-VJP training conv: only shapes with at
# least this many voxels (d*h*w) take the Pallas path when it is enabled.
# The all-shapes experiment lost its round-3 A/B (0.56 vs 0.51 s at B=1) —
# per-call lane transposes + lost BN/ReLU fusion outweigh the GEMM win at
# the small levels; the full-volume convs (dres/classif, 48x256x128) are
# where XLA's differentiated dfold runs far below the MXU.
_TRAIN_PALLAS_MIN_VOXELS = 0


def set_conv3d_train_scope(min_voxels: int = 0):
  global _TRAIN_PALLAS_MIN_VOXELS
  _TRAIN_PALLAS_MIN_VOXELS = int(min_voxels)


def train_pallas_enabled() -> bool:
  return _TRAIN_PALLAS


def set_conv3d_pallas(mode: str):
  """Force/forbid/auto-select the Pallas conv3d fast path (tests)."""
  global _CONV3D_MODE
  assert mode in ("auto", "on", "off")
  _CONV3D_MODE = mode


def band_pallas_ok(x_shape, cout, itemsize: int = 2,
                   has_res: bool = False) -> bool:
  """Can :func:`conv3d_band_pallas` run on this lane-major (B,D,M,C,L)?

  ``itemsize``/``has_res`` must describe the actual call (the block probe
  evaluates the same configuration the kernel will run). Under an active
  device mesh the call is routed through the shard_map wrapper
  (``parallel/shard_ops.py``), so the mesh axes must divide (B, M) and the
  probe runs on the shard-local M.
  """
  if _CONV3D_MODE == "off":
    return False
  b, d, m, c, lanes = x_shape
  if lanes % 128 != 0 or c % 8 != 0 or cout % 8 != 0:
    return False
  from mode_tpu.parallel.mesh import active_mesh
  mesh = active_mesh()
  if mesh is not None and mesh.size > 1:
    dp = mesh.shape.get("data", 1)
    sp = mesh.shape.get("spatial", 1)
    if b % dp != 0 or m % sp != 0:
      return False
    m = m // sp
  if _pick_blocks(d, m, c, max(cout, 8), lanes, itemsize, has_res) is None:
    return False
  if _CONV3D_MODE == "on":
    return True
  return _platform_ok()


# ---------------------------------------------------------------------------
# Training path: custom-VJP stride-1 3x3x3 conv on NDHWC.
#
# Forward and grad-input both run the Pallas band kernel (the cotangent of a
# stride-1 SAME conv is the same conv with the kernel spatially flipped and
# in/out channels swapped — exact, not an approximation). Grad-weight is the
# conv-backward-filter contraction expressed directly as one XLA conv (input
# channels as the batch, the example batch as the contraction), the same
# program autodiff would emit for the XLA path. CUDA counterpart: the
# col2im/im2col backward pair, sphere_conv_cuda_kernel.cu:294-356.
# ---------------------------------------------------------------------------


def _ndhwc_pallas(x, w):
  la = lane_axis_for(x.shape)
  y = conv3d_band_pallas(to_lane_major(x, la), weight_lane_major(w, la))
  return from_lane_major(y, la)


@jax.custom_vjp
def conv3d_ndhwc_fast(x, w):
  """Stride-1 3x3x3 SAME conv, NDHWC, Pallas fwd/bwd (single chip)."""
  return _ndhwc_pallas(x, w)


def _conv3d_fast_fwd(x, w):
  return _ndhwc_pallas(x, w), (x, w)


def _conv3d_fast_bwd(res, g):
  x, w = res
  wt = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)        # (3,3,3,Cout,Cin)
  dx = _ndhwc_pallas(g, wt)

  prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
          else jax.lax.Precision.DEFAULT)
  dn = lax.conv_dimension_numbers(x.shape, g.shape,
                                  ("CDHWN", "IDHWO", "NDHWC"))
  dw = lax.conv_general_dilated(
      x, g, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn,
      precision=prec)                                     # (Cin,3,3,3,Cout)
  dw = jnp.transpose(dw, (1, 2, 3, 0, 4)).astype(w.dtype)
  return dx.astype(x.dtype), dw


conv3d_ndhwc_fast.defvjp(_conv3d_fast_fwd, _conv3d_fast_bwd)


def train_conv3d_eligible(x_shape, cout) -> bool:
  """Gate for the custom-VJP training conv (NDHWC shapes). Only legal
  without a device mesh: the SPMD partitioner cannot split the Pallas
  custom call, and the training path has no shard_map wrapper (it loses
  to XLA single-chip already, training.py)."""
  if not _TRAIN_PALLAS:
    return False
  from mode_tpu.parallel.mesh import active_mesh
  mesh = active_mesh()
  if mesh is not None and mesh.size > 1:
    return False
  b, d, h, w, c = x_shape
  if b < _TRAIN_PALLAS_MIN_BATCH:
    return False
  if d * h * w < _TRAIN_PALLAS_MIN_VOXELS:
    return False
  la = lane_axis_for(x_shape)
  if la is None:
    return False
  m = h if la == 3 else w
  # both fwd (c->cout) and grad-input (cout->c) must fit the kernel
  return (band_pallas_ok((b, d, m, c, 128), cout) and
          band_pallas_ok((b, d, m, cout, 128), c))


# Folded-lane training conv for the 1/16 hourglass level, where no axis
# fills the lanes and the differentiated XLA conv starves the MXU. Same
# custom-VJP structure as conv3d_ndhwc_fast: Pallas fwd + Pallas
# grad-input (flipped kernel, channels swapped), XLA conv-backward-filter
# for grad-weight. Off by default: the on-chip A/B
# (scripts/bench_train_fold.py, 2026-08-18, full-res bf16+remat step)
# measured it LOSING at B=1 (497.8 vs 471.3 ms) and adding nothing on top
# of the strided paths at B=2 (284.8 vs 284.6 ms/example) — XLA's fused
# dfold form wins once the backward's extra transposes are counted.
_TRAIN_FOLD = False


def set_conv3d_train_fold(enabled: bool):
  global _TRAIN_FOLD
  _TRAIN_FOLD = bool(enabled)


def _ndhwc_fold(x, w):
  xl = jnp.transpose(x, (0, 1, 2, 4, 3))      # (B, D, M=H, C, L=W)
  y = conv3d_fold_pallas(xl, w)               # DHWIO == (kd, k_M, k_L, I, O)
  return jnp.transpose(y, (0, 1, 2, 4, 3))


@jax.custom_vjp
def conv3d_fold_fast(x, w):
  """Stride-1 3x3x3 SAME conv, NDHWC, folded-lane Pallas fwd/bwd."""
  return _ndhwc_fold(x, w)


def _fold_fast_fwd(x, w):
  return _ndhwc_fold(x, w), (x, w)


def _fold_fast_bwd(res, g):
  x, w = res
  wt = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
  dx = _ndhwc_fold(g, wt)

  prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
          else jax.lax.Precision.DEFAULT)
  dn = lax.conv_dimension_numbers(x.shape, g.shape,
                                  ("CDHWN", "IDHWO", "NDHWC"))
  dw = lax.conv_general_dilated(
      x, g, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn,
      precision=prec)
  dw = jnp.transpose(dw, (1, 2, 3, 0, 4)).astype(w.dtype)
  return dx.astype(x.dtype), dw


conv3d_fold_fast.defvjp(_fold_fast_fwd, _fold_fast_bwd)


def train_fold_eligible(x_shape, cout, itemsize: int = 2) -> bool:
  """Gate for :func:`conv3d_fold_fast` (NDHWC shapes; no mesh wrapper)."""
  if not _TRAIN_FOLD:
    return False
  from mode_tpu.parallel.mesh import active_mesh
  mesh = active_mesh()
  if mesh is not None and mesh.size > 1:
    return False
  b, d, h, w, c = x_shape
  if lane_axis_for(x_shape) is not None:      # band-path territory
    return False
  f = h * w
  if f % 128 or c % 8 or cout % 8:
    return False
  return (_pick_blocks_fold(d, c, cout, f, itemsize) is not None and
          _pick_blocks_fold(d, cout, c, f, itemsize) is not None)


# ---------------------------------------------------------------------------
# Training paths for the hourglass's strided convs: custom-VJP stride-2
# conv and transpose conv on NDHWC. The two ops are each other's input
# adjoints — sharing the same parameter array, no flip or channel swap —
# so the SAME chip-proven kernels serve both directions:
#   * stride-2 conv:    fwd = band-s2 kernel; grad-input = deconv of the
#     cotangent with the weight itself (band or folded deconv);
#   * transpose conv:   fwd = band/folded deconv kernel; grad-input =
#     stride-2 band conv of the cotangent with kernel_t itself.
# Grad-weight uses jax.vjp of the equivalent XLA conv (exactly the
# conv-backward-filter program autodiff would emit — zero derivation risk).
# ON by default: the on-chip A/B (scripts/bench_train_fold.py, 2026-08-18,
# full-res bf16+remat train step) measured 471.3 -> 432.0 ms at B=1 and
# 319.3 -> 284.6 ms/example at B=2 (-11%) with only the strided paths
# flipped — unlike the full-lane stride-1 path, which lost to XLA fusion.
# ---------------------------------------------------------------------------

_TRAIN_STRIDED = True


def set_conv3d_train_strided(enabled: bool):
  global _TRAIN_STRIDED
  _TRAIN_STRIDED = bool(enabled)


def _deconv_route(shape, cout, itemsize):
  """How an NDHWC transpose conv runs: ('band', la) | ('fold',) | None."""
  b, d, h, w, c = shape
  la = lane_axis_for(shape)
  if la is not None:
    lanes, m = (w, h) if la == 3 else (h, w)
    if band_deconv_ok((b, d, m, c, lanes), cout, itemsize):
      return ("band", la)
  if fold_deconv_ok((b, d, h, c, w), cout, itemsize):
    return ("fold",)
  return None


def _s2_route(shape, cout, itemsize):
  """How an NDHWC stride-2 conv runs: ('band', la) | None."""
  b, d, h, w, c = shape
  la = lane_axis_for(shape)
  if la is not None:
    lanes, m = (w, h) if la == 3 else (h, w)
    if band_s2_ok((b, d, m, c, lanes), cout, itemsize):
      return ("band", la)
  return None


def _run_deconv(x, kt, route):
  if route[0] == "band":
    la = route[1]
    y = conv3d_band_deconv_pallas(to_lane_major(x, la), kt, lane_axis=la)
    return from_lane_major(y, la)
  xl = jnp.transpose(x, (0, 1, 2, 4, 3))        # (B, D, M=H, C, L=W)
  y = conv3d_fold_deconv_pallas(xl, kt, lane_axis=3)
  return jnp.transpose(y, (0, 1, 2, 4, 3))


def _run_s2(x, w, route):
  la = route[1]
  y = conv3d_band_s2_pallas(to_lane_major(x, la), weight_lane_major(w, la))
  return from_lane_major(y, la)


def _xla_s2(x, w):
  dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                  ("NDHWC", "DHWIO", "NDHWC"))
  return lax.conv_general_dilated(
      x, w, (2, 2, 2), [(1, 1)] * 3, dimension_numbers=dn,
      precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT))


def _xla_deconv(x, kt):
  w_io = jnp.swapaxes(jnp.flip(kt, axis=(0, 1, 2)), -1, -2)
  dn = lax.conv_dimension_numbers(x.shape, w_io.shape,
                                  ("NDHWC", "DHWIO", "NDHWC"))
  return lax.conv_general_dilated(
      x, w_io, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
      dimension_numbers=dn,
      precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT))


@jax.custom_vjp
def conv3d_s2_fast(x, w):
  """Stride-2 pad-1 3x3x3 conv, NDHWC, Pallas fwd + Pallas grad-input."""
  route = _s2_route(x.shape, w.shape[-1], jnp.dtype(x.dtype).itemsize)
  return _run_s2(x, w, route) if route else _xla_s2(x, w)


def _s2_fast_fwd(x, w):
  return conv3d_s2_fast(x, w), (x, w)


def _s2_fast_bwd(res, g):
  x, w = res
  # grad-input: the k3/s2/p1/op1 transpose conv is EXACTLY the adjoint of
  # this conv, and the (K, Cin, Cout) conv weight read as the deconv's
  # (K, O, I) param is the same array — no flip, no channel swap
  # (dx[q, ci] = sum_{p, co} g[p, co] * w[q + 1 - 2p][ci, co])
  kt = w
  route = _deconv_route(g.shape, x.shape[-1],
                        jnp.dtype(g.dtype).itemsize)
  dx = _run_deconv(g, kt, route) if route else _xla_deconv(g, kt)
  _, pull = jax.vjp(lambda w_: _xla_s2(x, w_), w)
  dw, = pull(g.astype(x.dtype))
  return dx.astype(x.dtype), dw.astype(w.dtype)


conv3d_s2_fast.defvjp(_s2_fast_fwd, _s2_fast_bwd)


@jax.custom_vjp
def convtranspose3d_fast(x, kt):
  """ConvTranspose3d(k3 s2 p1 op1), NDHWC, Pallas fwd + Pallas grad-input.
  ``kt`` is the torch-layout (3, 3, 3, O, I) param."""
  route = _deconv_route(x.shape, kt.shape[3], jnp.dtype(x.dtype).itemsize)
  return _run_deconv(x, kt, route) if route else _xla_deconv(x, kt)


def _deconv_fast_fwd(x, kt):
  return convtranspose3d_fast(x, kt), (x, kt)


def _deconv_fast_bwd(res, g):
  x, kt = res
  # grad-input: the stride-2 pad-1 conv is the adjoint of this deconv, and
  # the (K, O, I) kernel_t read as the conv's (K, Cin, Cout) weight is the
  # same array (dx[p, i] = sum_{k, o} g[2p + k - 1, o] * kt[k][o, i])
  w = kt
  route = _s2_route(g.shape, x.shape[-1], jnp.dtype(g.dtype).itemsize)
  dx = _run_s2(g, w, route) if route else _xla_s2(g, w)
  _, pull = jax.vjp(lambda k_: _xla_deconv(x, k_), kt)
  dkt, = pull(g.astype(x.dtype))
  return dx.astype(x.dtype), dkt.astype(kt.dtype)


convtranspose3d_fast.defvjp(_deconv_fast_fwd, _deconv_fast_bwd)


def train_s2_eligible(x_shape, cout, itemsize: int = 2) -> bool:
  """Gate for :func:`conv3d_s2_fast`: the fwd AND the grad-input deconv
  (at the cotangent's half-resolution shape) must both have kernels."""
  if not _TRAIN_STRIDED:
    return False
  from mode_tpu.parallel.mesh import active_mesh
  mesh = active_mesh()
  if mesh is not None and mesh.size > 1:
    return False
  b, d, h, w, c = x_shape
  if d % 2 or h % 2 or w % 2:
    return False
  g_shape = (b, d // 2, h // 2, w // 2, cout)
  return (_s2_route(x_shape, cout, itemsize) is not None and
          _deconv_route(g_shape, c, itemsize) is not None)


def train_deconv_eligible(x_shape, cout, itemsize: int = 2) -> bool:
  """Gate for :func:`convtranspose3d_fast` (fwd deconv + grad-input s2)."""
  if not _TRAIN_STRIDED:
    return False
  from mode_tpu.parallel.mesh import active_mesh
  mesh = active_mesh()
  if mesh is not None and mesh.size > 1:
    return False
  b, d, h, w, c = x_shape
  g_shape = (b, 2 * d, 2 * h, 2 * w, cout)
  return (_deconv_route(x_shape, cout, itemsize) is not None and
          _s2_route(g_shape, c, itemsize) is not None)
