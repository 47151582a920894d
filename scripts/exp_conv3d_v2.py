#!/usr/bin/env python
"""Round-5 experiment: accumulator-based recombination for the stride-1
3-D band conv kernel.

Hypothesis (VERDICT r4 lever): the shipped kernel's f32 z scratch holds
ALL (db+2) input rows' (9·Cout, L) dot results at once, which caps db —
at C=64 the block picker lands on (4, 4), so 2 of every 6 input-row dots
are D-halo waste (measured 19.6 TF/s vs 32.6 at C=32 where db=8).
This variant accumulates each input row's dot result directly into a
(db, mb, 3·Cout, L) f32 accumulator (kw groups; kd resolved at add time),
so the scratch shrinks ~3x and db can grow: halo waste (db+2)/db drops.
Risk: the di loop now alternates MXU dots with VPU adds — the round-3
interleave experiment lost 7-25% doing this at per-output-row granularity
(docs/PROFILES.md); here the granularity is per-INPUT-row (mb dots, then
<=3 adds), which is what this experiment measures.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_conv3d_v2.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mode_tpu.ops.pallas.conv3d_kernel import (_affine_sb, conv3d_band_pallas,
                                               lane_axis_for, to_lane_major,
                                               from_lane_major,
                                               weight_lane_major)
from mode_tpu.ops.pallas.sphere_conv_kernel import _mxu_precision

ITERS = 10


def _kernel_acc(x_ref, w_ref, sb_ref, res_ref, o_ref, bands_ref, zrow_ref,
                acc_ref, sem, *, db, mb, cin, cout, lanes, relu, has_res):
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
        sl = zrow_ref[:, 3 * kd * cout:(3 * kd + 3) * cout]   # (mb, 3Cout, L)
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
        # prefer the lowest halo-compute waste (db), then DMA (mb)
        cand = ((db + 2) / db, (mb + 2) / mb, db, mb)
        if best is None or cand[:2] < best[:2]:
          best = cand
  return (best[2], best[3]) if best else None


def conv3d_band_pallas_v2(x, weight, scale=None, bias=None, residual=None,
                          relu=False):
  b, d, m, cin, lanes = x.shape
  kd, kh, kw, wcin, cout = weight.shape
  assert (kd, kh, kw) == (3, 3, 3) and wcin == cin
  assert lanes % 128 == 0 and cin % 8 == 0 and cout % 8 == 0
  itemsize = jnp.dtype(x.dtype).itemsize
  blocks = _pick_blocks_acc(d, m, cin, cout, lanes, itemsize,
                            residual is not None)
  assert blocks is not None, (x.shape,)
  db, mb = blocks

  w2 = jnp.transpose(weight, (0, 2, 4, 1, 3)).reshape(3, 3 * cout, 3 * cin)
  w2 = w2.astype(x.dtype)
  sb = _affine_sb(scale, bias, cout)
  xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
  xp = xp.reshape(b, d + 2, (m + 2) * cin, lanes)

  has_res = residual is not None
  res = residual if has_res else jnp.zeros((b, 1, 1, cout, lanes), x.dtype)
  res_spec = (pl.BlockSpec((1, db, mb, cout, lanes),
                           lambda i, j, k: (i, j, k, 0, 0)) if has_res else
              pl.BlockSpec((1, 1, 1, cout, lanes),
                           lambda i, j, k: (i, 0, 0, 0, 0)))
  kernel = functools.partial(_kernel_acc, db=db, mb=mb, cin=cin, cout=cout,
                             lanes=lanes, relu=relu, has_res=has_res)
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
      scratch_shapes=[
          pltpu.VMEM((2, db + 2, (mb + 2) * cin, lanes), x.dtype),
          pltpu.VMEM((mb, 9 * cout, lanes), jnp.float32),
          pltpu.VMEM((db, mb, 3 * cout, lanes), jnp.float32),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=14 * 2**20),
      cost_estimate=pl.CostEstimate(
          flops=flops,
          bytes_accessed=(x.size + res.size if has_res else x.size)
          * itemsize * 2,
          transcendentals=0),
  )(xp, w2, sb, res)


def check(name, b, d, h, w_, c, cout, relu=True, res=False,
          dtype=jnp.bfloat16):
  key = jax.random.PRNGKey(0)
  k1, k2, k3, k4, k5 = jax.random.split(key, 5)
  x = jax.device_put(jax.random.normal(k1, (b, d, h, w_, c), dtype) * 0.3)
  wgt = jax.device_put(jax.random.normal(k2, (3, 3, 3, c, cout), dtype) * .08)
  scale = jax.device_put(jax.random.normal(k3, (cout,), jnp.float32) * .2 + 1)
  bias = jax.device_put(jax.random.normal(k4, (cout,), jnp.float32) * 0.1)
  residual = jax.device_put(
      jax.random.normal(k5, (b, d, h, w_, cout), dtype) * 0.3) if res else None

  la = lane_axis_for(x.shape)
  xl = jax.device_put(to_lane_major(x, la))
  wl = jax.device_put(weight_lane_major(wgt, la))
  rl = jax.device_put(to_lane_major(residual, la)) if res else None

  @jax.jit
  def v1_fn(xl, wl, rl):
    return conv3d_band_pallas(xl, wl, scale, bias, rl, relu=relu)

  @jax.jit
  def v2_fn(xl, wl, rl):
    return conv3d_band_pallas_v2(xl, wl, scale, bias, rl, relu=relu)

  y1 = np.asarray(v1_fn(xl, wl, rl), np.float32)
  y2 = np.asarray(v2_fn(xl, wl, rl), np.float32)
  err = np.max(np.abs(y1 - y2))
  rel = err / max(np.max(np.abs(y1)), 1e-6)

  def timed(fn, *args):
    @jax.jit
    def loop(a0, rest):
      def body(i, carry):
        y = fn(carry, *rest)
        return (a0 + jnp.mean(y).astype(a0.dtype) * 1e-6)
      return jnp.sum(lax.fori_loop(0, ITERS, body, a0).astype(jnp.float32))
    r = loop(args[0], args[1:])
    np.asarray(jax.device_get(r))
    t0 = time.time()
    r = loop(args[0], args[1:])
    np.asarray(jax.device_get(r))
    return (time.time() - t0) / ITERS

  flops = 2 * b * d * h * w_ * 27 * c * cout
  t1 = timed(v1_fn, xl, wl, rl)
  t2 = timed(v2_fn, xl, wl, rl)
  print(json.dumps({
      "case": name, "max_abs_err": float(err), "rel_err": float(rel),
      "v1_ms": round(t1 * 1e3, 3), "v2_ms": round(t2 * 1e3, 3),
      "v1_tflops": round(flops / t1 / 1e12, 2),
      "v2_tflops": round(flops / t2 / 1e12, 2),
      "pass": bool(rel < 0.02)}), flush=True)


def main():
  if "round2" in sys.argv[1:]:
    # round 2: the gaps after the first sweep — B=2 is the TRAIN custom-VJP
    # operating point (conv3d_ndhwc_fast), B=6+res covers the eval
    # hourglass residual epilogues at the pipeline batch
    check("c32_full_b2", 2, 48, 256, 128, 32, 32)
    check("c32_full_b2_res", 2, 48, 256, 128, 32, 32, res=True)
    check("c64_half_b2", 2, 24, 128, 64, 64, 64)
    check("c32_full_b6_res", 6, 48, 256, 128, 32, 32, res=True)
    check("c64to32_full_b6", 6, 48, 256, 128, 64, 32)
    return
  check("c32_full_b1", 1, 48, 256, 128, 32, 32)
  check("c32_full_b1_res", 1, 48, 256, 128, 32, 32, res=True)
  check("c64_half_b1", 1, 24, 128, 64, 64, 64)
  check("c64to32_full", 1, 48, 256, 128, 64, 32)
  check("c32_full_b6", 6, 48, 256, 128, 32, 32)
  check("c64_half_b6", 6, 24, 128, 64, 64, 64)


if __name__ == "__main__":
  main()
