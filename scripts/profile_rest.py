#!/usr/bin/env python
"""TPU timing for the non-stage-1 pipeline pieces + FE internals.

Sections: bridge (6 disparity->depth SE(3) re-projections), fusion net,
FE sub-stages. Scalar readback (see profile_stage1.py). Args select
sections: bridge fusion fe_parts
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

B, H, W = 6, 1024, 512
DT = jnp.bfloat16


def timed(tag, fn, *args, iters=4):
  @jax.jit
  def f(*a):
    leaves = jax.tree_util.tree_leaves(fn(*a))
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

  r = f(*args)
  np.asarray(jax.device_get(r))
  t0 = time.time()
  for _ in range(iters):
    r = f(*args)
  np.asarray(jax.device_get(r))
  print(json.dumps({"sec": tag, "ms": round((time.time() - t0) / iters * 1e3,
                                            1)}), flush=True)


def main():
  only = set(sys.argv[1:])

  def want(n):
    return not only or n in only

  from mode_tpu.training import cast_conv_params
  key = jax.random.PRNGKey(0)
  rng = np.random.default_rng(0)

  if want("bridge"):
    from mode_tpu.pipeline import bridge_all_pairs
    disps = jax.device_put(jnp.asarray(
        rng.uniform(1.0, 150.0, size=(6, H, W)).astype(np.float32)))
    confs = jax.device_put(jnp.asarray(
        rng.uniform(0.0, 1.0, size=(6, H, W)).astype(np.float32)))
    timed("bridge_all_pairs", bridge_all_pairs, disps, confs)

  if want("fusion"):
    from mode_tpu.models.fusion import ModeFusion
    model = ModeFusion(max_depth=1000.0)
    z1 = [jax.device_put(jnp.asarray(
        rng.uniform(1, 900, size=(1, H, W, 1)).astype(np.float32)))
        for _ in range(6)]
    c1 = [jax.device_put(jnp.asarray(
        rng.uniform(0, 1, size=(1, H, W, 1)).astype(np.float32)))
        for _ in range(6)]
    r3 = [jax.device_put(jnp.asarray(
        rng.normal(size=(1, H, W, 3)).astype(np.float32)))
        for _ in range(4)]
    fv = jax.jit(lambda: model.init(key, z1, c1, r3, train=False))()
    timed("fusion_net", lambda v: model.apply(v, z1, c1, r3, train=False),
          fv)

  if want("fe_parts"):
    from mode_tpu.models import disparity as D
    from mode_tpu.models.blocks import convbn
    from mode_tpu.ops.sphere_conv import sphere_conv

    x = jax.device_put(jax.random.normal(key, (2 * B, H, W, 3), DT) * 0.5)

    class Stem(nn.Module):
      @nn.compact
      def __call__(self, x):
        for i, (feat, k, s, p) in enumerate([(32, 7, 2, 3), (32, 3, 1, 1),
                                             (32, 3, 1, 1)]):
          x = nn.relu(convbn(x, False, feat, k, s, p, 1, f"fc.{2 * i}"))
        return x

    stem = Stem()
    sv = cast_conv_params(jax.jit(lambda: stem.init(key, x))(), DT)
    timed("fe_stem_12img", stem.apply, sv, x)

    # layer1-3 regular stages
    x2 = jax.device_put(
        jax.random.normal(key, (2 * B, H // 2, W // 2, 32), DT) * 0.5)

    class L123(nn.Module):
      @nn.compact
      def __call__(self, x):
        from mode_tpu.models.blocks import RegularBasicBlock

        def stage(x, prefix, feats, blocks, stride, dilation):
          cin = x.shape[-1]
          x = RegularBasicBlock(feats, stride=stride, pad=1,
                                dilation=dilation,
                                has_downsample=(stride != 1 or cin != feats),
                                name=f"{prefix}.0")(x, False)
          for i in range(1, blocks):
            x = RegularBasicBlock(feats, stride=1, pad=1, dilation=dilation,
                                  name=f"{prefix}.{i}")(x, False)
          return x

        x = stage(x, "layer1", 64, 3, 1, 1)
        raw = stage(x, "layer2", 64, 8, 2, 1)
        reg = stage(raw, "layer3", 64, 4, 1, 2)
        return raw, reg

    l123 = L123()
    lv = cast_conv_params(jax.jit(lambda: l123.init(key, x2))(), DT)
    timed("fe_layer123_12img", l123.apply, lv, x2)

    # layer4: 8 sphere blocks at 1/4 res, 128ch
    x4 = jax.device_put(
        jax.random.normal(key, (2 * B, H // 4, W // 4, 64), DT) * 0.5)

    class L4(nn.Module):
      @nn.compact
      def __call__(self, x):
        from mode_tpu.models.blocks import SphereBasicBlock

        cin = x.shape[-1]
        x = SphereBasicBlock(128, stride=1, pad=1, dilation=1,
                             has_downsample=True, name="layer4.0")(x, False)
        for i in range(1, 8):
          x = SphereBasicBlock(128, stride=1, pad=1, dilation=1,
                               name=f"layer4.{i}")(x, False)
        return x

    l4 = L4()
    l4v = cast_conv_params(jax.jit(lambda: l4.init(key, x4))(), DT)
    timed("fe_layer4_sphere_12img", l4.apply, l4v, x4)


if __name__ == "__main__":
  main()
