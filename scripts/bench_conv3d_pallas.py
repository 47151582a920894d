#!/usr/bin/env python
"""Correctness + speed of the Pallas conv3d kernel on the real chip.

Compares conv3d_band_pallas against the XLA NDHWC path at the production
cost-volume shapes and times both (bf16). Prints one JSON line per case.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mode_tpu.ops.pallas.conv3d_kernel import (
    conv3d_band_pallas, to_lane_major, from_lane_major, weight_lane_major,
    lane_axis_for)

ITERS = 20


def conv3d_xla(x, w):
  dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                  ("NDHWC", "DHWIO", "NDHWC"))
  return lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                  dimension_numbers=dn)


def check(name, b, d, h, w_, c, cout, relu=True, res=False, dtype=jnp.bfloat16):
  key = jax.random.PRNGKey(0)
  k1, k2, k3, k4, k5 = jax.random.split(key, 5)
  x = jax.device_put(jax.random.normal(k1, (b, d, h, w_, c), dtype) * 0.3)
  wgt = jax.device_put(jax.random.normal(k2, (3, 3, 3, c, cout), dtype) * .08)
  scale = jax.device_put(jax.random.normal(k3, (cout,), jnp.float32) * 0.2 + 1)
  bias = jax.device_put(jax.random.normal(k4, (cout,), jnp.float32) * 0.1)
  residual = jax.device_put(
      jax.random.normal(k5, (b, d, h, w_, cout), dtype) * 0.3) if res else None

  la = lane_axis_for(x.shape)
  xl = jax.device_put(to_lane_major(x, la))
  wl = jax.device_put(weight_lane_major(wgt, la))
  rl = jax.device_put(to_lane_major(residual, la)) if res else None

  @jax.jit
  def pallas_fn(xl, wl, rl):
    return conv3d_band_pallas(xl, wl, scale, bias, rl, relu=relu)

  @jax.jit
  def xla_fn(x, wgt, residual):
    y = conv3d_xla(x, wgt).astype(jnp.float32)
    y = y * scale + bias
    if res:
      y = y + residual.astype(jnp.float32)
    if relu:
      y = jnp.maximum(y, 0.0)
    return y.astype(dtype)

  yp = from_lane_major(np.asarray(pallas_fn(xl, wl, rl)), la)
  yx = np.asarray(xla_fn(x, wgt, residual))
  err = np.max(np.abs(yp.astype(np.float32) - yx.astype(np.float32)))
  rel = err / max(np.max(np.abs(yx)), 1e-6)

  # timing: serialized inside one jit via activation carry
  def timed(fn, *args):
    @jax.jit
    def loop(a0, rest):
      def body(i, carry):
        y = fn(carry, *rest)
        # keep shapes stable: project back to input channel count via slice
        return (a0 + jnp.mean(y).astype(a0.dtype) * 1e-6)
      return jnp.sum(lax.fori_loop(0, ITERS, body, a0).astype(jnp.float32))
    r = loop(args[0], args[1:])
    np.asarray(jax.device_get(r))
    t0 = time.time()
    r = loop(args[0], args[1:])
    np.asarray(jax.device_get(r))
    return (time.time() - t0) / ITERS

  flops = 2 * b * d * h * w_ * 27 * c * cout
  tp = timed(pallas_fn, xl, wl, rl)
  tx = timed(xla_fn, x, wgt, residual)
  print(json.dumps({
      "case": name, "max_abs_err": float(err), "rel_err": float(rel),
      "pallas_ms": round(tp * 1e3, 3), "xla_ms": round(tx * 1e3, 3),
      "pallas_tflops": round(flops / tp / 1e12, 2),
      "xla_tflops": round(flops / tx / 1e12, 2),
      "pass": bool(rel < 0.02)}), flush=True)


def check_fold(name, b, d, h, w_, c, cout, deconv=False,
               dtype=jnp.bfloat16):
  """Folded-lane kernels vs XLA at the 1/16 hourglass shapes (NDHWC in,
  lane-major with H on the folded lanes, exactly the model's layout)."""
  from mode_tpu.ops.pallas.conv3d_kernel import (conv3d_fold_deconv_pallas,
                                                 conv3d_fold_pallas)
  key = jax.random.PRNGKey(0)
  k1, k2, k3, k4 = jax.random.split(key, 4)
  x = jax.device_put(jax.random.normal(k1, (b, d, h, w_, c), dtype) * 0.3)
  scale = jax.device_put(jax.random.normal(k3, (cout,), jnp.float32) * .2 + 1)
  bias = jax.device_put(jax.random.normal(k4, (cout,), jnp.float32) * 0.1)
  xl = jax.device_put(jnp.transpose(x, (0, 1, 3, 4, 2)))  # (B,D,W,C,H)

  if deconv:
    kt = jax.device_put(
        jax.random.normal(k2, (3, 3, 3, cout, c), dtype) * 0.08)

    @jax.jit
    def pallas_fn(xl, kt):
      return conv3d_fold_deconv_pallas(xl, kt, scale, bias, lane_axis=2)

    @jax.jit
    def xla_fn(x, kt):
      w_io = jnp.swapaxes(jnp.flip(kt, axis=(0, 1, 2)), -1, -2)
      dn = lax.conv_dimension_numbers(x.shape, w_io.shape,
                                      ("NDHWC", "DHWIO", "NDHWC"))
      y = lax.conv_general_dilated(
          x, w_io, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
          dimension_numbers=dn).astype(jnp.float32)
      return (y * scale + bias).astype(dtype)

    args_p, args_x = (xl, kt), (x, kt)
  else:
    wgt = jax.device_put(
        jax.random.normal(k2, (3, 3, 3, c, cout), dtype) * 0.08)
    wl = jax.device_put(weight_lane_major(wgt, 2))

    @jax.jit
    def pallas_fn(xl, wl):
      return conv3d_fold_pallas(xl, wl, scale, bias, relu=True)

    @jax.jit
    def xla_fn(x, wgt):
      y = conv3d_xla(x, wgt).astype(jnp.float32)
      return jnp.maximum(y * scale + bias, 0.0).astype(dtype)

    args_p, args_x = (xl, wl), (x, wgt)

  yp = np.asarray(pallas_fn(*args_p))
  yp = np.transpose(yp, (0, 1, 4, 2, 3))                  # back to NDHWC
  yx = np.asarray(xla_fn(*args_x))
  err = np.max(np.abs(yp.astype(np.float32) - yx.astype(np.float32)))
  rel = err / max(np.max(np.abs(yx)), 1e-6)

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
  tp = timed(pallas_fn, *args_p)
  tx = timed(xla_fn, *args_x)
  print(json.dumps({
      "case": name, "max_abs_err": float(err), "rel_err": float(rel),
      "pallas_ms": round(tp * 1e3, 3), "xla_ms": round(tx * 1e3, 3),
      "pallas_tflops": round(flops / tp / 1e12, 2),
      "xla_tflops": round(flops / tx / 1e12, 2),
      "pass": bool(rel < 0.02)}), flush=True)


def main():
  check("c32_full_b1", 1, 48, 256, 128, 32, 32)
  check("c32_full_b1_res", 1, 48, 256, 128, 32, 32, res=True)
  check("c64_half_b1", 1, 24, 128, 64, 64, 64)
  check("c64to32_full", 1, 48, 256, 128, 64, 32)
  check("c32_full_b6", 6, 48, 256, 128, 32, 32)
  # 1/16 level (conv4 / conv5 production shapes, B=6 pipeline)
  check_fold("fold_conv4_b6", 6, 12, 64, 32, 64, 64)
  check_fold("fold_deconv_conv5_b6", 6, 12, 64, 32, 64, 64, deconv=True)


if __name__ == "__main__":
  main()
