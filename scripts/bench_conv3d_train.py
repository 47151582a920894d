#!/usr/bin/env python
"""Layout probe for the TRAIN-path cost-volume convs (fwd + bwd).

The eval path solved the C=32-wastes-lanes problem with the Pallas band
kernel; the differentiated train path still runs the D-fold NDHWC conv
(``models/blocks.py:Conv3dDFold``), whose 32-channel feature dim uses 1/4 of
the MXU lanes. This measures value_and_grad of one conv across layouts at
the production train shapes, to pick the train-path compute layout:

  * dfold      — D folded into batch, 3 accumulated 2-D NHWC convs (current)
  * ndhwc      — plain XLA conv3d, channels minor
  * lane_w     — "NDHCW" dimension numbers: W (128/convolved) rides minor
  * lane_h     — "NDWCH": H (256) minor

Prints one JSON line per (shape, layout): median ms over 5 iters.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DTYPE = jnp.bfloat16

SHAPES = [
    # (name, (B, D, H, W, C), Cout)  — stage-1 train mid-section shapes
    ("full_c64to32", (1, 48, 256, 128, 64), 32),
    ("full_c32", (1, 48, 256, 128, 32), 32),
    ("half_c64", (1, 24, 128, 64, 64), 64),
    ("full_c32_b2", (2, 48, 256, 128, 32), 32),
]


def conv_dfold(x, w):
  n, d, h, ww, c = x.shape
  xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
  dn = lax.conv_dimension_numbers((n * d, h, ww, c), w.shape[1:],
                                  ("NHWC", "HWIO", "NHWC"))
  y = None
  for kd in range(3):
    xs = xp[:, kd:kd + d].reshape(n * d, h, ww, c)
    yk = lax.conv_general_dilated(xs, w[kd], (1, 1), [(1, 1), (1, 1)],
                                  dimension_numbers=dn)
    y = yk if y is None else y + yk
  return y.reshape(n, d, h, ww, w.shape[-1])


def conv_plain(x, w):
  dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                  ("NDHWC", "DHWIO", "NDHWC"))
  return lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                  dimension_numbers=dn)


def conv_lane(x, w, spec):
  # x arrives already in the lane-major layout matching `spec`
  dn = lax.conv_dimension_numbers(x.shape, w.shape, (spec, "DHWIO", spec))
  return lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3,
                                  dimension_numbers=dn)


def timeit(name, fn, *args, iters=5):
  @jax.jit
  def vg(*a):
    def loss(*aa):
      return jnp.sum(fn(*aa).astype(jnp.float32))
    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(*a)
    return val + sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                     for g in grads)

  r = vg(*args)
  np.asarray(jax.device_get(r))
  times = []
  for _ in range(iters):
    t0 = time.time()
    r = vg(*args)
    np.asarray(jax.device_get(r))
    times.append(time.time() - t0)
  ms = float(np.median(times) * 1e3)
  print(json.dumps({"bench": name, "ms": round(ms, 2)}), flush=True)


def main():
  import sys
  only = set(sys.argv[1:])
  key = jax.random.PRNGKey(0)
  for name, shape, cout in SHAPES:
    if only and not any(name.startswith(o) for o in only):
      continue
    b, d, h, ww, c = shape
    x = jax.device_put(jax.random.normal(key, shape, DTYPE) * 0.3)
    w = jax.device_put(
        jax.random.normal(key, (3, 3, 3, c, cout), DTYPE) * 0.1)
    timeit(f"{name}/dfold", conv_dfold, x, w)
    timeit(f"{name}/ndhwc", conv_plain, x, w)
    xw = jnp.transpose(x, (0, 1, 2, 4, 3))          # (B, D, H, C, W)
    timeit(f"{name}/lane_w", functools.partial(conv_lane, spec="NDHCW"),
           xw, w)
    xh = jnp.transpose(x, (0, 1, 3, 4, 2))          # (B, D, W, C, H)
    timeit(f"{name}/lane_h", functools.partial(conv_lane, spec="NDWCH"),
           xh, w)


if __name__ == "__main__":
  main()
