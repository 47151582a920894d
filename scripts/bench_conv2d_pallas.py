#!/usr/bin/env python
"""Correctness + speed of the Pallas 2-D conv kernel on the real chip.

Compares conv2d_fused against the XLA NHWC path at the fusion/stem
production shapes and times both (bf16), for both kernel structures
(batch recombination vs MXU/VPU-interleaved). Prints one JSON line per
case. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_conv2d_pallas.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mode_tpu.ops.pallas.conv2d_kernel import conv2d_fused

ITERS = 30


def conv2d_xla(x, w):
  dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
  return lax.conv_general_dilated(x, w, (1, 1), [(1, 1)] * 2,
                                  dimension_numbers=dn)


def check(name, b, h, w_, c, cout, relu=True, res=False, dtype=jnp.bfloat16,
          interleave=False):
  key = jax.random.PRNGKey(0)
  k1, k2, k3, k4, k5 = jax.random.split(key, 5)
  x = jax.device_put(jax.random.normal(k1, (b, h, w_, c), dtype) * 0.3)
  wgt = jax.device_put(jax.random.normal(k2, (3, 3, c, cout), dtype) * .08)
  scale = jax.device_put(jax.random.normal(k3, (cout,), jnp.float32) * .2 + 1)
  bias = jax.device_put(jax.random.normal(k4, (cout,), jnp.float32) * 0.1)
  residual = jax.device_put(
      jax.random.normal(k5, (b, h, w_, cout), dtype) * 0.3) if res else None

  @jax.jit
  def pallas_fn(x, wgt, residual):
    return conv2d_fused(x, wgt, scale, bias, residual, relu=relu,
                        interleave=interleave)

  @jax.jit
  def xla_fn(x, wgt, residual):
    y = conv2d_xla(x, wgt).astype(jnp.float32)
    y = y * scale + bias
    if res:
      y = y + residual.astype(jnp.float32)
    if relu:
      y = jnp.maximum(y, 0.0)
    return y.astype(dtype)

  yp = np.asarray(pallas_fn(x, wgt, residual))
  yx = np.asarray(xla_fn(x, wgt, residual))
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

  flops = 2 * b * h * w_ * 9 * c * cout
  tp = timed(pallas_fn, x, wgt, residual)
  tx = timed(xla_fn, x, wgt, residual)
  print(json.dumps({
      "case": name, "max_abs_err": float(err), "rel_err": float(rel),
      "pallas_ms": round(tp * 1e3, 3), "xla_ms": round(tx * 1e3, 3),
      "pallas_tflops": round(flops / tp / 1e12, 2),
      "xla_tflops": round(flops / tx / 1e12, 2),
      "pass": bool(rel < 0.02)}), flush=True)


def main():
  for il, tag in [(False, ""), (True, "_il")]:
    # fusion full-res block conv (1024x512 ERP, C=32)
    check(f"c32_full{tag}", 1, 512, 1024, 32, 32, interleave=il)
    # fusion half-res (C=64)
    check(f"c64_half{tag}", 1, 256, 512, 64, 64, interleave=il)
    # fusion quarter-res (C=128)
    check(f"c128_quarter{tag}", 1, 128, 256, 128, 128, interleave=il)
    # fusion concat conv (C=64 -> 32 at full res)
    check(f"c64to32_full{tag}", 1, 512, 1024, 64, 32, interleave=il)


if __name__ == "__main__":
  main()
