#!/usr/bin/env python
"""Section-level timing of the EVAL feature extraction (the pipeline's
biggest stage-1 block: 103.5 of 252 ms at B=6, round-3 profile).

Sections mirror SphereFeatureExtraction (models/disparity.py): the 7x7/2 +
2x 3x3 stem at 1024x512, layer1 (3 regular blocks, 512x256 c64), layer2
(8 blocks, stride-2 entry, 256x128 c64), layer3 (4 dilation-2 blocks),
layer4 (8 sphere blocks, c128 Pallas), lastconv (1x1+3x3+1x1 on c256).
Run with the exact pipeline dtype (bf16). One JSON line per section.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_fe.py [section ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import flax.linen as nn
import jax
import jax.numpy as jnp

from mode_tpu.models import disparity as D
from mode_tpu.models.blocks import RegularBasicBlock, SphereBasicBlock, convbn
from mode_tpu.training import cast_conv_params

B, H, W = 6, 1024, 512
DTYPE = jnp.bfloat16


def cast16(vars_):
  return {"params": cast_conv_params(vars_["params"], DTYPE),
          "batch_stats": vars_["batch_stats"]}


def timeit(name, fn, *args, iters=5):
  @jax.jit
  def jfn(*a):
    leaves = jax.tree_util.tree_leaves(fn(*a))
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

  r = jfn(*args)
  np.asarray(jax.device_get(r))
  t0 = time.time()
  for _ in range(iters):
    r = jfn(*args)
  np.asarray(jax.device_get(r))
  dt = (time.time() - t0) / iters
  print(json.dumps({"section": name, "ms": round(dt * 1e3, 1)}), flush=True)
  return dt


class Stem(nn.Module):
  @nn.compact
  def __call__(self, x):
    from mode_tpu.models.blocks import convbn2d_lane
    x = nn.relu(convbn(x, False, 32, 7, 2, 3, 1, "firstconv.0"))
    xl = jnp.transpose(x, (0, 1, 3, 2))
    xl = convbn2d_lane(xl, 32, "firstconv.2", relu=True)
    xl = convbn2d_lane(xl, 32, "firstconv.4", relu=True)
    return jnp.transpose(xl, (0, 1, 3, 2))


class Stem7(nn.Module):
  @nn.compact
  def __call__(self, x):
    return nn.relu(convbn(x, False, 32, 7, 2, 3, 1, "firstconv.0"))


def _stage_mod(block_cls, prefix, feats, blocks, stride, dilation, **kw):
  class Stage(nn.Module):
    @nn.compact
    def __call__(self, x):
      cin = x.shape[-1]
      x = block_cls(feats, stride=stride, pad=1, dilation=dilation,
                    has_downsample=(stride != 1 or cin != feats),
                    name=f"{prefix}.0", **kw)(x, False)
      for i in range(1, blocks):
        x = block_cls(feats, stride=1, pad=1, dilation=dilation,
                      name=f"{prefix}.{i}", **kw)(x, False)
      return x
  return Stage()


class LastConv(nn.Module):
  @nn.compact
  def __call__(self, feat):
    for i, (f, k, p) in enumerate([(128, 1, 0), (128, 3, 1), (32, 1, 0)]):
      feat = nn.relu(convbn(feat, False, f, k, 1, p, 1, f"lastconv.{2 * i}"))
    return feat


def main():
  only = set(sys.argv[1:])

  def want(name):
    return not only or any(name.startswith(o) for o in only)

  key = jax.random.PRNGKey(0)
  x_in = jax.device_put(jax.random.normal(key, (B, H, W, 3), DTYPE) * 0.5)
  x_half32 = jax.device_put(
      jax.random.normal(key, (B, H // 2, W // 2, 32), DTYPE) * 0.5)
  x_half64 = jax.device_put(
      jax.random.normal(key, (B, H // 2, W // 2, 64), DTYPE) * 0.5)
  x_q64 = jax.device_put(
      jax.random.normal(key, (B, H // 4, W // 4, 64), DTYPE) * 0.5)
  x_q256 = jax.device_put(
      jax.random.normal(key, (B, H // 4, W // 4, 256), DTYPE) * 0.5)

  cases = [
      ("stem", Stem(), x_in),
      ("stem_7x7_only", Stem7(), x_in),
      ("layer1", _stage_mod(RegularBasicBlock, "layer1", 64, 3, 1, 1),
       x_half32),
      ("layer2", _stage_mod(RegularBasicBlock, "layer2", 64, 8, 2, 1),
       x_half64),
      ("layer3", _stage_mod(RegularBasicBlock, "layer3", 64, 4, 1, 2),
       x_q64),
      ("layer4_sphere", _stage_mod(SphereBasicBlock, "layer4", 128, 8, 1, 1,
                                   sphere_type="Cassini"), x_q64),
      ("lastconv", LastConv(), x_q256),
  ]
  for name, mod, x in cases:
    if not want(name):
      continue
    vars_ = jax.jit(lambda m=mod, xx=x: m.init(key, xx))()
    v16 = cast16(vars_)
    timeit(name, lambda v, xx, m=mod: m.apply(v, xx), v16, x)

  if want("fe_full"):
    fe = D.SphereFeatureExtraction("Cassini")
    fe_vars = jax.jit(lambda: fe.init(key, x_in, False))()
    v16 = cast16(fe_vars)
    timeit("fe_full_1view", lambda v, xx: fe.apply(v, xx, False), v16, x_in)


if __name__ == "__main__":
  main()
