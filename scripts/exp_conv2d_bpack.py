#!/usr/bin/env python
"""Batch-packed 2-D band conv: pack G views along the LANE axis.

The FE stages (layer1-3, ``models/disparity.py:80-83``) run B=6 views of
c64 3x3 stride-1 convs at 512x256 / 256x128. Both XLA NHWC and the
lane-major band kernel sit at ~8-10 bf16-TF/s there (docs/PROFILES.md
round-3/4): at 256x128 the band kernel's GEMM is (192, 192) @ (192, 128)
— N=128 columns can't amortize the MXU fill, and B only lengthens the
grid. This experiment packs G images side-by-side on the lanes so each
dot is (3Cout, 3C) @ (3C, G*L):

  * the band scratch is (2, (mb+2)*C, G*L); each grid step issues G
    async copies, one per image, into disjoint 128-aligned lane columns
    (no HBM relayout — the packing happens in the DMA destination);
  * the kw recombination masks every image's edge lanes
    (lane % L == 0 / L-1), not just the global edges;
  * the output block is (G, mb, Cout, L); each image's slab is a
    128-aligned lane slice of the accumulator.

Run: python scripts/exp_conv2d_bpack.py [case ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from mode_tpu.ops.pallas.conv2d_kernel import conv2d_band_pallas
from mode_tpu.ops.pallas.sphere_conv_kernel import _mxu_precision


def _kernel_bp(x_ref, w_ref, sb_ref, o_ref, bands_ref, z_ref, sem,
               *, g, mb, cin, cout, lanes, relu):
  """lanes = per-image L; the packed width is g*lanes."""
  bg = pl.program_id(0)
  m = pl.program_id(1)
  nm = pl.num_programs(1)
  lin = bg * nm + m
  total = pl.num_programs(0) * nm
  slot = lax.rem(lin, 2)

  def band_dma(slot_idx, bg_, m_, g_):
    return pltpu.make_async_copy(
        x_ref.at[bg_ * g + g_, pl.ds(m_ * mb * cin, (mb + 2) * cin)],
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
  lanes_i = jax.lax.broadcasted_iota(jnp.int32, (cout, gl), 1)
  is_left = (lanes_i % lanes) == 0
  is_right = (lanes_i % lanes) == lanes - 1

  def recombine(mm):
    z = z_ref[mm]                                  # (3Cout, GL) f32
    left = z[0:cout]
    mid = z[cout:2 * cout]
    right = z[2 * cout:3 * cout]
    acc = (mid +
           jnp.where(is_left, 0.0, pltpu.roll(left, 1, axis=1)) +
           jnp.where(is_right, 0.0, pltpu.roll(right, gl - 1, axis=1)))
    acc = acc * sb_ref[0] + sb_ref[1]
    if relu:
      acc = jnp.maximum(acc, 0.0)
    for g_ in range(g):
      o_ref[g_, mm] = acc[:, g_ * lanes:(g_ + 1) * lanes].astype(o_ref.dtype)

  for mm in range(mb):
    z_ref[mm] = jnp.dot(
        wmat, bands_ref[slot, mm * cin:(mm + 3) * cin],
        preferred_element_type=jnp.float32, precision=prec)
    if mm >= 1:
      recombine(mm - 1)
  recombine(mb - 1)


def conv2d_band_bpack(x, weight, scale=None, bias=None, relu=False, g=None,
                      mb=None):
  b, m, cin, lanes = x.shape
  kh, kw, wcin, cout = weight.shape
  assert (kh, kw) == (3, 3) and wcin == cin
  itemsize = jnp.dtype(x.dtype).itemsize
  if g is None:
    g = b
  assert b % g == 0

  if mb is None:
    def vmem(mb_):
      return (2 * (mb_ + 2) * cin * g * lanes * itemsize +
              2 * g * mb_ * cout * lanes * itemsize +
              3 * cout * 3 * cin * itemsize +
              mb_ * 3 * cout * g * lanes * 4)
    mb = next((c for c in (16, 8, 4, 2, 1)
               if m % c == 0 and vmem(c) <= 10 * 2**20), None)
    assert mb is not None

  w2 = jnp.transpose(weight, (1, 3, 0, 2)).reshape(3 * cout, 3 * cin)
  w2 = w2.astype(x.dtype)
  sb = jnp.stack([
      jnp.ones((cout,), jnp.float32) if scale is None
      else scale.astype(jnp.float32),
      jnp.zeros((cout,), jnp.float32) if bias is None
      else bias.astype(jnp.float32)])[:, :, None]

  xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
  xp = xp.reshape(b, (m + 2) * cin, lanes)

  kernel = functools.partial(_kernel_bp, g=g, mb=mb, cin=cin, cout=cout,
                             lanes=lanes, relu=relu)
  flops = 2 * b * m * lanes * 9 * cin * cout
  return pl.pallas_call(
      kernel,
      grid=(b // g, m // mb),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),
          pl.BlockSpec((3 * cout, 3 * cin), lambda i, j: (0, 0)),
          pl.BlockSpec((2, cout, 1), lambda i, j: (0, 0, 0)),
      ],
      out_specs=pl.BlockSpec((g, mb, cout, lanes),
                             lambda i, j: (i, j, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((b, m, cout, lanes), x.dtype),
      scratch_shapes=[
          pltpu.VMEM((2, (mb + 2) * cin, g * lanes), x.dtype),
          pltpu.VMEM((mb, 3 * cout, g * lanes), jnp.float32),
          pltpu.SemaphoreType.DMA((2, g)),
      ],
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=x.size * itemsize * 2,
          transcendentals=0),
  )(xp, w2, sb)


def _xla_lane(x, w):
  dn = lax.conv_dimension_numbers(
      x.shape, w.shape, ("NHCW", "HWIO", "NHCW"))
  return lax.conv_general_dilated(
      x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
      precision=lax.Precision.DEFAULT)


def run_case(name, b, m, cin, cout, lanes, dtype=jnp.bfloat16, iters=30):
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.normal(size=(b, m, cin, lanes)), dtype)
  w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, dtype)
  sc = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
  bi = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
  flops = 2 * b * m * lanes * 9 * cin * cout

  def band(xx):
    return conv2d_band_pallas(xx, w, sc, bi, None, relu=True)

  def xla(xx):
    y = _xla_lane(xx, w).astype(jnp.float32)
    return jnp.maximum(y * sc[:, None] + bi[:, None], 0.0).astype(xx.dtype)

  cases = {"band": band, "xla": xla}
  for g in (2, 3, 6):
    if b % g == 0:
      cases[f"bp{g}"] = functools.partial(
          conv2d_band_bpack, weight=w, scale=sc, bias=bi, relu=True, g=g)

  ref = None
  for vname, fn in cases.items():
    @jax.jit
    def loop(xx, fn=fn):
      def body(_, acc):
        return fn(acc * 1.0)        # keep iterations dependent
      return lax.fori_loop(0, iters, body, fn(xx))

    try:
      out = loop(x)
      out.block_until_ready()
      t0 = time.perf_counter()
      outh = np.asarray(out.astype(jnp.float32).sum())
      dt = (time.perf_counter() - t0) / (iters + 1)
      one = np.asarray(jax.jit(fn)(x).astype(jnp.float32))
      if ref is None:
        ref = one
        err = 0.0
      else:
        err = float(np.abs(one - ref).max())
      print(f"{name:28s} {vname:6s} {dt * 1e3:7.3f} ms  "
            f"{flops / dt / 1e12:6.2f} TF/s  maxerr {err:.2e}  "
            f"sum {outh:.3e}", flush=True)
    except Exception as e:
      print(f"{name:28s} {vname:6s} FAILED: {type(e).__name__}: "
            f"{str(e)[:120]}", flush=True)


def main():
  only = set(sys.argv[1:])
  all_cases = {
      "layer1_512x256_c64_b6": (6, 512, 64, 64, 256),
      "layer2_256x128_c64_b6": (6, 256, 64, 64, 128),
      "stem_1024x512_c32_b6": (6, 1024, 32, 32, 512),
      "fusion_c32_1024x512_b1": (1, 1024, 32, 32, 512),
  }
  for name, (b, m, cin, cout, lanes) in all_cases.items():
    if only and name not in only:
      continue
    run_case(name, b, m, cin, cout, lanes)


if __name__ == "__main__":
  main()
