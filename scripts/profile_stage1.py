#!/usr/bin/env python
"""Section-level timing of the stage-1 network at production shapes.

Times each piece of ModeDisparity (bf16 eval, batch-6 1024x512 Cassini,
maxdisp 192) as its own jitted program with a scalar-readback sync, to
locate where the pipeline's per-frame time goes. Prints one JSON line per
section.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mode_tpu.models.disparity import Hourglass, ModeDisparity
from mode_tpu.models import disparity as D
from mode_tpu.models.blocks import convbn_3d, conv_nd
import flax.linen as nn

B, H, W = 6, 1024, 512
MAXD = 192
DTYPE = jnp.bfloat16


def cast16(vars_):
  from mode_tpu.training import cast_conv_params
  return cast_conv_params(vars_, DTYPE)


def timeit(name, fn, *args, iters=5):
  # reduce to a scalar ON DEVICE — reading a full tensor back through the
  # dev tunnel (~17 MB/s) would swamp the measurement
  @jax.jit
  def jfn(*a):
    leaves = jax.tree_util.tree_leaves(fn(*a))
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

  r = jfn(*args)
  np.asarray(jax.device_get(r))  # warm (compile)
  t0 = time.time()
  for _ in range(iters):
    r = jfn(*args)
  np.asarray(jax.device_get(r))
  dt = (time.time() - t0) / iters
  print(json.dumps({"section": name, "ms": round(dt * 1e3, 1)}), flush=True)
  return dt


def main():
  import sys
  only = set(sys.argv[1:])

  def want(name):
    return not only or any(name.startswith(o) for o in only)

  key = jax.random.PRNGKey(0)

  # --- feature extraction (both views) ---
  x = jax.device_put(
      jax.random.normal(key, (B, H, W, 3), DTYPE) * 0.5)
  if want("fe"):
    fe = D.SphereFeatureExtraction("Cassini", name="feature_extraction")
    fe_vars = cast16(jax.jit(lambda: fe.init(key, x, False))())

    def fe_fwd(v, l, r):
      return fe.apply(v, l, False), fe.apply(v, r, False)
    timeit("feature_extraction_x2", fe_fwd, fe_vars, x, x)

  # --- cost volume ---
  if want("cost_volume"):
    from mode_tpu.ops.cost_volume import build_cost_volume
    feat = jax.device_put(
        jax.random.normal(key, (B, H // 4, W // 4, 32), DTYPE) * 0.5)
    timeit("cost_volume", lambda a, b: build_cost_volume(a, b, MAXD // 4),
           feat, feat)

  # --- dres0 + dres1 (4 convs, 64->32, 32->32 x3) ---
  class Dres(nn.Module):
    @nn.compact
    def __call__(self, cost):
      cost0 = nn.relu(convbn_3d(cost, False, 32, 3, 1, 1, "dres0.0"))
      cost0 = nn.relu(convbn_3d(cost0, False, 32, 3, 1, 1, "dres0.2"))
      d1 = nn.relu(convbn_3d(cost0, False, 32, 3, 1, 1, "dres1.0"))
      d1 = convbn_3d(d1, False, 32, 3, 1, 1, "dres1.2")
      return d1 + cost0

  if want("dres"):
    cost = jax.device_put(
        jax.random.normal(key, (B, MAXD // 4, H // 4, W // 4, 64), DTYPE)
        * .3)
    dres = Dres()
    dres_vars = cast16(jax.jit(lambda: dres.init(key, cost))())
    timeit("dres0+dres1", dres.apply, dres_vars, cost)

  # --- dres, lane-major (the path the eval model actually takes) ---
  if want("dres_lane"):
    from mode_tpu.models.blocks import convbn_3d_lane

    class DresLane(nn.Module):
      @nn.compact
      def __call__(self, costl):
        c0 = convbn_3d_lane(costl, 32, 3, 1, 1, "dres0.0", in_lane="W",
                            relu=True)
        c0 = convbn_3d_lane(c0, 32, 3, 1, 1, "dres0.2", in_lane="W",
                            relu=True)
        d1 = convbn_3d_lane(c0, 32, 3, 1, 1, "dres1.0", in_lane="W",
                            relu=True)
        return convbn_3d_lane(d1, 32, 3, 1, 1, "dres1.2", in_lane="W",
                              residual=c0)

    costl = jax.device_put(
        jax.random.normal(key, (B, MAXD // 4, H // 4, 64, W // 4), DTYPE)
        * .3)
    dl = DresLane()
    dl_vars = cast16(jax.jit(lambda: dl.init(key, costl))())
    timeit("dres_lane", dl.apply, dl_vars, costl)

  cost0 = jax.device_put(
      jax.random.normal(key, (B, MAXD // 4, H // 4, W // 4, 32), DTYPE) * .3)
  cost0l = jax.device_put(
      jax.random.normal(key, (B, MAXD // 4, H // 4, 32, W // 4), DTYPE) * .3)

  # --- one hourglass ---
  if want("hourglass"):
    hg = Hourglass(32)
    hg_vars = cast16(
        jax.jit(lambda: hg.init(key, cost0, None, None, False))())
    timeit("hourglass_x1", lambda v, c: hg.apply(v, c, None, None, False),
           hg_vars, cost0)

  if want("hourglass_lane"):
    hg = Hourglass(32)
    hgl_vars = cast16(jax.jit(
        lambda: hg.init(key, cost0l, None, None, False, lane="W"))())
    timeit("hourglass_lane_x1",
           lambda v, c: hg.apply(v, c, None, None, False, lane="W"),
           hgl_vars, cost0l)

  if want("classif_lane"):
    from mode_tpu.models.blocks import Conv3dDFold, convbn_3d_lane

    class ClassifLane(nn.Module):
      @nn.compact
      def __call__(self, x):
        y = convbn_3d_lane(x, 32, 3, 1, 1, "c.0", in_lane="W", relu=True)
        return Conv3dDFold(1, (3, 3, 3), (1, 1, 1), (1, 1, 1),
                           name="c.2")(y, lane_fused=dict(lane_axis=3))

    cl = ClassifLane()
    cll_vars = cast16(jax.jit(lambda: cl.init(key, cost0l))())
    timeit("classif_lane_x1", cl.apply, cll_vars, cost0l)

  # --- classif head (1 of 3) ---
  if want("classif"):
    class Classif(nn.Module):
      @nn.compact
      def __call__(self, x):
        x = nn.relu(convbn_3d(x, False, 32, 3, 1, 1, "c.0"))
        return conv_nd(x, 1, (3, 3, 3), stride=1, pad=1, name="c.2")

    cl = Classif()
    cl_vars = cast16(jax.jit(lambda: cl.init(key, cost0))())
    timeit("classif_x1", cl.apply, cl_vars, cost0)

  # --- fused regression head ---
  if want("regression"):
    from mode_tpu.ops.pallas.regression_kernel import (
        fused_disparity_regression)
    cost3 = jax.device_put(
        jax.random.normal(key, (B, MAXD // 4, H // 4, W // 4), jnp.float32))
    timeit("fused_regression",
           lambda c: fused_disparity_regression(c, MAXD, H, W), cost3)

  # --- whole model for reference ---
  if want("full"):
    model = ModeDisparity(maxdisp=MAXD, out_conf=True)
    mv = jax.jit(lambda: model.init(key, x.astype(jnp.float32)[:1],
                                    x.astype(jnp.float32)[:1], train=False))()
    from mode_tpu.training import cast_conv_params
    mv16 = cast_conv_params(mv, DTYPE)
    timeit("stage1_full_b6",
           lambda v, l, r: model.apply(v, l, r, train=False)[0], mv16, x, x,
           iters=3)

  # --- two frames per program (B=12): does serving-side frame batching
  # amortize the mid-section like train B=1->2 did? ---
  if want("full_b12"):
    model = ModeDisparity(maxdisp=MAXD, out_conf=True)
    mv = jax.jit(lambda: model.init(key, x.astype(jnp.float32)[:1],
                                    x.astype(jnp.float32)[:1], train=False))()
    from mode_tpu.training import cast_conv_params
    mv16 = cast_conv_params(mv, DTYPE)
    x12 = jnp.concatenate([x, x * 0.9], axis=0)
    timeit("stage1_full_b12_2frames",
           lambda v, l, r: model.apply(v, l, r, train=False)[0], mv16, x12,
           x12, iters=3)


if __name__ == "__main__":
  main()
