#!/usr/bin/env python
"""Microbenchmark: 3-D conv layout alternatives for the cost-volume stack.

The stage-1 mid-section (``models/disparity.py:225-246``) is ~20 conv3d /
deconv3d ops on a (1, 48, 256, 128, C) volume with C in {32, 64}. In NDHWC
the channel axis rides the 128 TPU lanes, so C=32 wastes 3/4 of the MXU
columns. This script times the candidate layouts on the real chip:

  ndhwc     - current: lax.conv NDHWC / DHWIO
  ncdhw     - channel-major: W=128 on lanes, C on sublanes
  d2batch   - fold D into batch, 3x conv2d (kd taps) accumulation, NHWC
  d2b_cmaj  - fold D into batch, 3x conv2d, NCHW (W on lanes)

Timing per the axon rules: the op is iterated inside one jit (serialized by
carrying the activation), a single dispatch covers all iterations, and a host
readback forces completion. Prints one JSON line per case.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ITERS = 30
PREC = lax.Precision.HIGHEST


def conv3d_ndhwc(x, w):
  dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                  ("NDHWC", "DHWIO", "NDHWC"))
  return lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                  dimension_numbers=dn, precision=PREC)


def conv3d_ncdhw(x, w):
  # x: (B, C, D, H, W); w: (O, I, KD, KH, KW)
  dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                  ("NCDHW", "OIDHW", "NCDHW"))
  return lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                  dimension_numbers=dn, precision=PREC)


def conv3d_d2batch(x, w):
  # x: (B*D, H, W, C) with D padded by 1 outside; w: (KD, KH, KW, I, O)
  # caller passes the padded volume; here x is (D+2, H, W, C), D=out depth.
  d = x.shape[0] - 2
  dn = lax.conv_dimension_numbers((d,) + x.shape[1:], w.shape[1:],
                                  ("NHWC", "HWIO", "NHWC"))
  out = None
  for kd in range(3):
    y = lax.conv_general_dilated(x[kd:kd + d], w[kd], (1, 1), [(1, 1)] * 2,
                                 dimension_numbers=dn, precision=PREC)
    out = y if out is None else out + y
  return out


def conv3d_d2b_cmaj(x, w):
  # x: (D+2, C, H, W); w: (KD, O, I, KH, KW)
  d = x.shape[0] - 2
  dn = lax.conv_dimension_numbers((d,) + x.shape[1:], w.shape[1:],
                                  ("NCHW", "OIHW", "NCHW"))
  out = None
  for kd in range(3):
    y = lax.conv_general_dilated(x[kd:kd + d], w[kd], (1, 1), [(1, 1)] * 2,
                                 dimension_numbers=dn, precision=PREC)
    out = y if out is None else out + y
  return out


def timed(fn, x, flops, name, iters=ITERS):
  @jax.jit
  def loop(x):
    def body(i, carry):
      return fn(carry)
    return jnp.sum(lax.fori_loop(0, iters, body, x).astype(jnp.float32))

  y = loop(x)                       # compile + warmup
  np.asarray(jax.device_get(y))     # scalar readback only
  t0 = time.time()
  y = loop(x)
  _ = np.asarray(jax.device_get(y))
  dt = (time.time() - t0) / iters
  print(json.dumps({"case": name, "ms": round(dt * 1e3, 3),
                    "tflops": round(flops / dt / 1e12, 2)}), flush=True)
  return dt


def main():
  dtype = jnp.bfloat16
  key = jax.random.PRNGKey(0)
  b, d, h, w_, c = 1, 48, 256, 128, 32
  flops32 = 2 * d * h * w_ * 27 * c * c

  # shape-preserving 32->32 full volume
  x = jax.device_put(jax.random.normal(key, (b, d, h, w_, c), dtype) * 0.1)
  k = jax.device_put(jax.random.normal(key, (3, 3, 3, c, c), dtype) * 0.05)
  timed(lambda v: conv3d_ndhwc(v, k), x, flops32, "ndhwc_c32")

  def conv3d_ndhwc_default(v, w):
    dn = lax.conv_dimension_numbers(v.shape, w.shape,
                                    ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(v, w, (1, 1, 1), [(1, 1)] * 3,
                                    dimension_numbers=dn)
  timed(lambda v: conv3d_ndhwc_default(v, k), x, flops32,
        "ndhwc_c32_defaultprec")

  xc = jax.device_put(jnp.transpose(x, (0, 4, 1, 2, 3)))
  kc = jax.device_put(jnp.transpose(k, (4, 3, 0, 1, 2)))
  timed(lambda v: conv3d_ncdhw(v, kc), xc, flops32, "ncdhw_c32")

  # D-in-batch: carry the D-padded volume, re-pad inside to stay shape-stable
  xp = jax.device_put(jnp.pad(x[0], ((1, 1), (0, 0), (0, 0), (0, 0))))
  kd_ = jax.device_put(jnp.reshape(k, (3, 3, 3, c, c)))

  def d2b_step(v):
    y = conv3d_d2batch(v, kd_)               # (D, H, W, C)
    return jnp.pad(y, ((1, 1), (0, 0), (0, 0), (0, 0)))
  timed(d2b_step, xp, flops32, "d2batch_c32")

  xpc = jax.device_put(jnp.transpose(xp, (0, 3, 1, 2)))
  kcm = jax.device_put(jnp.transpose(k, (0, 4, 3, 1, 2)))

  def d2bc_step(v):
    y = conv3d_d2b_cmaj(v, kcm)              # (D, C, H, W)
    return jnp.pad(y, ((1, 1), (0, 0), (0, 0), (0, 0)))
  timed(d2bc_step, xpc, flops32, "d2b_cmaj_c32")

  # D-pack: one conv2d with kd folded into OUTPUT channels (cout=3F), then
  # shift-add over D. K=9*cin, N=3*F — much better MXU shapes than N=F.
  def dpack_step(v):
    # v: (D+2, H, W, C) carried D-padded
    d = v.shape[0] - 2
    f = c
    w2 = jnp.reshape(jnp.transpose(kd_, (1, 2, 3, 0, 4)),
                     (3, 3, c, 3 * f))
    dn = lax.conv_dimension_numbers(v.shape, w2.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    z = lax.conv_general_dilated(v, w2, (1, 1), [(1, 1)] * 2,
                                 dimension_numbers=dn, precision=PREC)
    y = (z[0:d, :, :, 0:f] + z[1:d + 1, :, :, f:2 * f] +
         z[2:d + 2, :, :, 2 * f:3 * f])
    return jnp.pad(y, ((1, 1), (0, 0), (0, 0), (0, 0)))
  timed(dpack_step, xp, flops32, "dpack_xla_c32")

  # 64->64 at half volume (hourglass inner)
  d2, h2, w2, c2 = 24, 128, 64, 64
  flops64 = 2 * d2 * h2 * w2 * 27 * c2 * c2
  x64 = jax.device_put(jax.random.normal(key, (1, d2, h2, w2, c2), dtype) * .1)
  k64 = jax.device_put(jax.random.normal(key, (3, 3, 3, c2, c2), dtype) * .05)
  timed(lambda v: conv3d_ndhwc(v, k64), x64, flops64, "ndhwc_c64_half")
  x64c = jax.device_put(jnp.transpose(x64, (0, 4, 1, 2, 3)))
  k64c = jax.device_put(jnp.transpose(k64, (4, 3, 0, 1, 2)))
  timed(lambda v: conv3d_ncdhw(v, k64c), x64c, flops64, "ncdhw_c64_half")

  xp64 = jax.device_put(jnp.pad(x64[0], ((1, 1), (0, 0), (0, 0), (0, 0))))
  w2_64 = jax.device_put(jnp.reshape(jnp.transpose(k64, (1, 2, 3, 0, 4)),
                                     (3, 3, c2, 3 * c2)))

  def dpack64_step(v):
    d = v.shape[0] - 2
    dn = lax.conv_dimension_numbers(v.shape, w2_64.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    z = lax.conv_general_dilated(v, w2_64, (1, 1), [(1, 1)] * 2,
                                 dimension_numbers=dn, precision=PREC)
    y = (z[0:d, :, :, 0:c2] + z[1:d + 1, :, :, c2:2 * c2] +
         z[2:d + 2, :, :, 2 * c2:3 * c2])
    return jnp.pad(y, ((1, 1), (0, 0), (0, 0), (0, 0)))
  timed(dpack64_step, xp64, flops64, "dpack_xla_c64_half")

  # deconv 64->32 to full volume (the single biggest op), NDHWC vs NCDHW
  dh, hh, wh = 24, 128, 64
  xd = jax.device_put(jax.random.normal(key, (1, dh, hh, wh, 64), dtype) * .1)
  kd64 = jax.device_put(
      jax.random.normal(key, (3, 3, 3, 64, 32), dtype) * 0.05)
  flops_dec = 2 * 48 * 256 * 128 * 27 * 64 * 32 // 8  # lhs-dilated: 1/8 taps hit

  def deconv_ndhwc(v):
    dn = lax.conv_dimension_numbers(v.shape, kd64.shape,
                                    ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(
        v, kd64, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=dn, precision=PREC)

  def chain(fn, xin, name, flops):
    # output shape differs from input: serialize via a scalar feedback term
    @jax.jit
    def loop(x0):
      def body(i, carry):
        x_eff = x0 + carry * jnp.asarray(1e-6, x0.dtype)
        y = fn(x_eff)
        return jnp.mean(y)
      return lax.fori_loop(0, ITERS, body, jnp.asarray(0, x0.dtype))
    r = loop(xin)
    np.asarray(jax.device_get(r))
    t0 = time.time()
    r = loop(xin)
    np.asarray(jax.device_get(r))
    dt = (time.time() - t0) / ITERS
    print(json.dumps({"case": name, "ms": round(dt * 1e3, 3),
                      "tflops": round(flops / dt / 1e12, 2)}), flush=True)

  chain(deconv_ndhwc, xd, "deconv_ndhwc_64to32", flops_dec)

  xdc = jax.device_put(jnp.transpose(xd, (0, 4, 1, 2, 3)))
  kdc = jax.device_put(jnp.transpose(kd64, (4, 3, 0, 1, 2)))

  def deconv_ncdhw(v):
    dn = lax.conv_dimension_numbers(v.shape, kdc.shape,
                                    ("NCDHW", "OIDHW", "NCDHW"))
    return lax.conv_general_dilated(
        v, kdc, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=dn, precision=PREC)
  chain(deconv_ncdhw, xdc, "deconv_ncdhw_64to32", flops_dec)

  # layout-change overhead: one NDHWC->NCDHW transpose of the full volume
  def tr(v):
    return jnp.transpose(jnp.transpose(v, (0, 4, 1, 2, 3)), (0, 2, 3, 4, 1))
  timed(tr, x, 0, "roundtrip_transpose_c32")


if __name__ == "__main__":
  main()
