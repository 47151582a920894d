#!/usr/bin/env python
"""Section-level timing of the DIFFERENTIATED full-res stage-1 train step.

The eval-side profile (``profile_stage1.py``) located the pipeline's time;
this locates the train step's (bf16 + remat, B=1, 1024x512, maxdisp 192 —
the exact bench.py configuration). Each section is timed as its own jitted
``value_and_grad`` program (forward + backward + the section's remat
recompute), with a scalar on-device reduction before the host readback.
Reference hot loop: ``/root/reference/models/mode_disparity.py:115-129``
under ``train_disparity.py:147-163``.

Usage: python scripts/profile_train.py [section-prefix ...] [--batch N]
"""

import json
import sys
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mode_tpu.models import disparity as D
from mode_tpu.models.blocks import conv_nd, convbn_3d
from mode_tpu.models.disparity import Hourglass, ModeDisparity
from mode_tpu.training import cast_conv_params

H, W = 1024, 512
MAXD = 192
DTYPE = jnp.bfloat16


def timeit(name, fn, *args, iters=3):
  """Time value-and-grad of fn's scalarized output wrt its first arg tree."""
  def scalar_fn(*a):
    leaves = jax.tree_util.tree_leaves(fn(*a))
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

  @jax.jit
  def vg(*a):
    val, grads = jax.value_and_grad(scalar_fn)(*a)
    gsum = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
               for l in jax.tree_util.tree_leaves(grads))
    return val + gsum

  r = vg(*args)
  np.asarray(jax.device_get(r))   # warm (compile)
  t0 = time.time()
  for _ in range(iters):
    r = vg(*args)
  np.asarray(jax.device_get(r))
  dt = (time.time() - t0) / iters
  print(json.dumps({"section": name, "ms": round(dt * 1e3, 1)}), flush=True)
  return dt


def main():
  args = [a for a in sys.argv[1:]]
  b = 1
  if "--batch" in args:
    i = args.index("--batch")
    b = int(args[i + 1])
    del args[i:i + 2]
  policy_name = "save_convs"
  if "--policy" in args:
    i = args.index("--policy")
    policy_name = args[i + 1]
    del args[i:i + 2]
  policy = (jax.checkpoint_policies.save_only_these_names("conv_out")
            if policy_name == "save_convs" else None)
  print(json.dumps({"policy": policy_name, "batch": b}), flush=True)
  only = set(args)

  def want(name):
    return not only or any(name.startswith(o) for o in only)

  key = jax.random.PRNGKey(0)
  x = jax.device_put(jax.random.normal(key, (b, H, W, 3), DTYPE) * 0.5)

  # --- feature extraction fwd+bwd (both views, remat as in the model) ---
  if want("fe"):
    fe_cls = nn.remat(D.SphereFeatureExtraction, static_argnums=(2,),
                      policy=policy)
    fe = fe_cls("Cassini", name="feature_extraction")
    fe_vars = jax.jit(lambda: fe.init(key, x, True))()

    def fe_fwd(params, l, r):
      p16 = cast_conv_params(params, DTYPE)
      v = {"params": p16, "batch_stats": fe_vars["batch_stats"]}
      a, _ = fe.apply(v, l, True, mutable=["batch_stats"])
      bb, _ = fe.apply(v, r, True, mutable=["batch_stats"])
      return a, bb
    timeit("fe_x2_grad", fe_fwd, fe_vars["params"], x, x)

  # --- cost volume fwd+bwd ---
  if want("cost_volume"):
    from mode_tpu.ops.cost_volume import build_cost_volume
    feat = jax.device_put(
        jax.random.normal(key, (b, H // 4, W // 4, 32), DTYPE) * 0.5)
    timeit("cost_volume_grad",
           lambda a2, b2: build_cost_volume(a2, b2, MAXD // 4), feat, feat)

  # --- dres0 + dres1 fwd+bwd (train-mode BN) ---
  class Dres(nn.Module):
    @nn.compact
    def __call__(self, cost):
      cost0 = nn.relu(convbn_3d(cost, True, 32, 3, 1, 1, "dres0.0"))
      cost0 = nn.relu(convbn_3d(cost0, True, 32, 3, 1, 1, "dres0.2"))
      d1 = nn.relu(convbn_3d(cost0, True, 32, 3, 1, 1, "dres1.0"))
      d1 = convbn_3d(d1, True, 32, 3, 1, 1, "dres1.2")
      return d1 + cost0

  cost = jax.device_put(
      jax.random.normal(key, (b, MAXD // 4, H // 4, W // 4, 64), DTYPE) * .3)
  cost0 = jax.device_put(
      jax.random.normal(key, (b, MAXD // 4, H // 4, W // 4, 32), DTYPE) * .3)

  if want("dres"):
    dres = Dres()
    dres_vars = jax.jit(lambda: dres.init(key, cost))()

    def dres_fwd(params, c):
      p16 = cast_conv_params(params, DTYPE)
      out, _ = dres.apply({"params": p16,
                           "batch_stats": dres_vars["batch_stats"]},
                          c, mutable=["batch_stats"])
      return out
    timeit("dres0+dres1_grad", dres_fwd, dres_vars["params"], cost)

  # --- one hourglass fwd+bwd (remat as in the model; x3 in the step) ---
  if want("hourglass"):
    hg_cls = nn.remat(Hourglass, static_argnums=(4,), policy=policy)
    hg = hg_cls(32)
    hg_vars = jax.jit(lambda: hg.init(key, cost0, None, None, True))()

    def hg_fwd(params, c):
      p16 = cast_conv_params(params, DTYPE)
      out, _ = hg.apply({"params": p16,
                         "batch_stats": hg_vars["batch_stats"]},
                        c, None, None, True, mutable=["batch_stats"])
      return out
    timeit("hourglass_x1_grad", hg_fwd, hg_vars["params"], cost0)

  # --- classif head fwd+bwd (x3 in the step) ---
  if want("classif"):
    class Classif(nn.Module):
      @nn.compact
      def __call__(self, x):
        x = nn.relu(convbn_3d(x, True, 32, 3, 1, 1, "c.0"))
        return conv_nd(x, 1, (3, 3, 3), stride=1, pad=1, name="c.2")

    cl = Classif()
    cl_vars = jax.jit(lambda: cl.init(key, cost0))()

    def cl_fwd(params, c):
      p16 = cast_conv_params(params, DTYPE)
      out, _ = cl.apply({"params": p16,
                         "batch_stats": cl_vars["batch_stats"]},
                        c, mutable=["batch_stats"])
      return out
    timeit("classif_x1_grad", cl_fwd, cl_vars["params"], cost0)

  # --- regression + loss fwd+bwd (remat'd per head, x3 in the step) ---
  if want("regress"):
    from mode_tpu.models.disparity import disparity_regression
    from mode_tpu.ops.resize import upsample_trilinear
    from mode_tpu.utils.losses import smooth_l1
    costh = jax.device_put(jax.random.normal(
        key, (b, MAXD // 4, H // 4, W // 4, 1), DTYPE) * .3)
    gt = jax.device_put(jax.random.uniform(key, (b, H, W), jnp.float32,
                                           1.0, 100.0))

    def reg(c):
      def one(cc):
        up = upsample_trilinear(cc, MAXD, H, W)[..., 0]
        prob = jax.nn.softmax(up.astype(jnp.float32), axis=1)
        return disparity_regression(prob, MAXD)
      pred = jax.checkpoint(one)(c)
      return smooth_l1(pred, gt, jnp.ones_like(gt, jnp.bool_))
    timeit("regress+loss_x1_grad", reg, costh)

  # --- Adam update at full parameter count ---
  if want("adam"):
    from mode_tpu import training
    model = ModeDisparity(maxdisp=MAXD, out_conf=False, remat=True)
    opt = training.make_optimizer()
    dummy = np.zeros((1, H, W, 3), np.float32)
    state = training.init_state(model, opt, key, dummy, dummy, train=False)

    @jax.jit
    def adam(state):
      grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
      updates, opt_state = opt.update(grads, state.opt_state, state.params)
      params = jax.tree_util.tree_map(
          lambda p, u: p + u, state.params, updates)
      return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(params))

    r = adam(state)
    np.asarray(jax.device_get(r))
    t0 = time.time()
    for _ in range(3):
      r = adam(state)
    np.asarray(jax.device_get(r))
    print(json.dumps({"section": "adam_update",
                      "ms": round((time.time() - t0) / 3 * 1e3, 1)}),
          flush=True)

  # --- the full train step for reference ---
  if want("full"):
    from mode_tpu import training
    model = ModeDisparity(maxdisp=MAXD, out_conf=False, remat=True,
                          remat_policy=policy_name)
    opt = training.make_optimizer()
    dummy = np.zeros((b, H, W, 3), np.float32)
    state = training.init_state(model, opt, key, dummy, dummy, train=False)
    step = training.make_disparity_train_step(model, opt, mesh=None,
                                              compute_dtype=DTYPE)
    rng = np.random.default_rng(1)
    batch = [jax.device_put(v) for v in (
        rng.normal(size=(b, H, W, 3)).astype(np.float32),
        rng.normal(size=(b, H, W, 3)).astype(np.float32),
        rng.uniform(1.0, 100.0, size=(b, H, W)).astype(np.float32))]
    state, loss = step(state, *batch)
    _ = float(loss)
    t0 = time.time()
    for _ in range(3):
      state, loss = step(state, *batch)
      _ = float(loss)
    print(json.dumps({"section": f"full_step_b{b}",
                      "ms": round((time.time() - t0) / 3 * 1e3, 1)}),
          flush=True)


if __name__ == "__main__":
  main()
