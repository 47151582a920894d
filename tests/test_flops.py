"""Analytic FLOP counts vs XLA's cost analysis on the all-XLA config.

The analytic counter (mode_tpu/utils/flops.py) is bench.py's MFU numerator
— it must stay pinned to what the compiler actually emits. On CPU at these
shapes every Pallas eligibility gate fails, so XLA's cost_analysis sees the
whole program; the analytic count must land within 10% BELOW it (we count
conv MACs only — BN statistics, the regression volumes, loss and Adam are
uncounted, so analytic <= XLA always).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mode_tpu.utils.flops import (disparity_flops, fusion_flops,
                                  pipeline_flops)


def _xla_flops(jitted, *args):
  cost = jitted.lower(*args).compile().cost_analysis()
  if isinstance(cost, (list, tuple)):
    cost = cost[0]
  return float(cost["flops"])


def _check(analytic, xla):
  assert analytic <= xla * 1.005, (analytic, xla)
  assert analytic >= 0.90 * xla, (analytic, xla)


def test_disparity_train_flops_match_xla():
  from mode_tpu import training
  from mode_tpu.models.disparity import ModeDisparity

  b, h, w, md = 1, 64, 32, 16
  model = ModeDisparity(maxdisp=md, conv="Sphere", sphere_type="Cassini",
                        out_conf=False, remat=True)
  opt = training.make_optimizer()
  dummy = np.zeros((b, h, w, 3), np.float32)
  state = training.init_state(model, opt, jax.random.PRNGKey(0), dummy,
                              dummy, train=False)
  step = training.make_disparity_train_step(model, opt, mesh=None,
                                            compute_dtype=jnp.float32)
  batch = (dummy, dummy, np.ones((b, h, w), np.float32))
  _check(disparity_flops(b, h, w, md)["train"], _xla_flops(step, state,
                                                           *batch))


def test_disparity_eval_flops_match_xla():
  from mode_tpu.models.disparity import ModeDisparity

  b, h, w, md = 1, 64, 32, 16
  model = ModeDisparity(maxdisp=md, conv="Sphere", sphere_type="Cassini",
                        out_conf=False)
  z = jnp.zeros((b, h, w, 3))
  variables = model.init(jax.random.PRNGKey(0), z, z, train=False)
  ev = jax.jit(lambda v, l, r: model.apply(v, l, r, train=False))
  _check(disparity_flops(b, h, w, md)["fwd"], _xla_flops(ev, variables, z, z))


def test_fusion_eval_flops_match_xla():
  from mode_tpu.models.fusion import ModeFusion

  h, w = 64, 128
  model = ModeFusion(max_depth=1000.0)
  z1 = [jnp.zeros((1, h, w, 1))] * 6
  z3 = [jnp.zeros((1, h, w, 3))] * 4
  variables = model.init(jax.random.PRNGKey(1), z1, z1, z3, train=False)
  ev = jax.jit(lambda v: model.apply(v, z1, z1, z3, train=False))
  _check(fusion_flops(1, h, w)["fwd"], _xla_flops(ev, variables))


def test_production_magnitudes():
  """Pin the production-shape numbers so silent counter regressions show."""
  d = disparity_flops(1, 1024, 512, 192)
  assert 1.4e12 < d["fwd"] < 1.8e12, d
  assert 4.2e12 < d["train"] < 5.2e12, d
  assert abs(disparity_flops(2, 1024, 512, 192)["train"]
             - 2 * d["train"]) < 1e6
  assert 9.0e12 < pipeline_flops() < 10.5e12
