"""End-to-end golden tests: JAX models + checkpoint converter vs the torch
mirror oracles (which replicate the reference architectures key-for-key)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mode_tpu.models.disparity import ModeDisparity
from mode_tpu.models.fusion import ModeFusion
from mode_tpu.utils.torch_convert import convert_state_dict, convert_shg_only
from tests.torch_mirror import ModeDisparityT, ModeFusionT

H, W = 64, 32           # small Cassini panorama (2:1 vertical)
MAXDISP = 16


def _randomize_bn_stats(model: torch.nn.Module, seed=0):
  g = torch.Generator().manual_seed(seed)
  for m in model.modules():
    if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
      m.running_mean.normal_(0, 0.2, generator=g)
      m.running_var.uniform_(0.6, 1.6, generator=g)
      m.weight.data.uniform_(0.7, 1.3, generator=g)
      m.bias.data.normal_(0, 0.1, generator=g)


@pytest.fixture(scope="module")
def disp_pair():
  torch.manual_seed(0)
  tmodel = ModeDisparityT(MAXDISP, H, W, out_conf=True)
  _randomize_bn_stats(tmodel)
  jmodel = ModeDisparity(maxdisp=MAXDISP, out_conf=True)
  left = np.random.default_rng(1).normal(size=(2, 3, H, W)).astype(np.float32)
  right = np.random.default_rng(2).normal(size=(2, 3, H, W)).astype(np.float32)
  variables = jmodel.init(jax.random.PRNGKey(0),
                          jnp.moveaxis(jnp.asarray(left), 1, -1),
                          jnp.moveaxis(jnp.asarray(right), 1, -1),
                          train=False)
  variables = convert_state_dict(tmodel.state_dict(), variables)
  return tmodel, jmodel, variables, left, right


def test_disparity_eval_parity(disp_pair):
  tmodel, jmodel, variables, left, right = disp_pair
  tmodel.eval()
  with torch.no_grad():
    t_pred, t_conf = tmodel(torch.from_numpy(left), torch.from_numpy(right))
  j_pred, j_conf = jmodel.apply(variables,
                                jnp.moveaxis(jnp.asarray(left), 1, -1),
                                jnp.moveaxis(jnp.asarray(right), 1, -1),
                                train=False)
  np.testing.assert_allclose(np.asarray(j_pred), t_pred.numpy(),
                             rtol=2e-3, atol=2e-3)
  np.testing.assert_allclose(np.asarray(j_conf), t_conf.numpy(),
                             rtol=2e-3, atol=2e-3)


def test_disparity_train_mode_parity(disp_pair):
  tmodel, jmodel, variables, left, right = disp_pair
  tmodel.train()
  with torch.no_grad():
    t1, t2, t3 = tmodel(torch.from_numpy(left), torch.from_numpy(right))
  (j1, j2, j3), mutated = jmodel.apply(
      variables, jnp.moveaxis(jnp.asarray(left), 1, -1),
      jnp.moveaxis(jnp.asarray(right), 1, -1), train=True,
      mutable=["batch_stats"])
  for tj, tt in ((j1, t1), (j2, t2), (j3, t3)):
    np.testing.assert_allclose(np.asarray(tj), tt.numpy(), rtol=5e-3,
                               atol=5e-3)
  # running-stat updates must match torch's momentum/unbiased-var convention
  t_stats = tmodel.state_dict()
  key = "feature_extraction.firstconv.0.1"
  flax_bn = mutated["batch_stats"]["feature_extraction"]["firstconv.0.1"]
  np.testing.assert_allclose(np.asarray(flax_bn["mean"]),
                             t_stats[key + ".running_mean"].numpy(),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(flax_bn["var"]),
                             t_stats[key + ".running_var"].numpy(),
                             rtol=1e-4, atol=1e-5)


def test_shg_only_partial_load(disp_pair):
  tmodel, jmodel, variables, _, _ = disp_pair
  partial = convert_shg_only(tmodel.state_dict(), variables)
  # hourglass weights converted...
  src = tmodel.state_dict()["dres2.conv2.0.weight"].numpy()
  dst = np.asarray(partial["params"]["dres2"]["conv2.0"]["kernel"])
  np.testing.assert_allclose(dst, src.transpose(2, 3, 4, 1, 0))
  # ...feature extraction untouched (keeps fresh init)
  orig = np.asarray(
      variables["params"]["feature_extraction"]["firstconv.0.0"]["kernel"])
  kept = np.asarray(
      partial["params"]["feature_extraction"]["firstconv.0.0"]["kernel"])
  # converted variables already hold torch values; partial load should keep
  # whatever was passed in for FE keys
  np.testing.assert_allclose(kept, orig)


def test_fusion_parity():
  torch.manual_seed(3)
  channels = [8, 16, 32, 64]
  tmodel = ModeFusionT(1000.0, channels, {"depth": 12, "rgb": 12})
  _randomize_bn_stats(tmodel, seed=4)
  tmodel.eval()

  rng = np.random.default_rng(5)
  h, w = 32, 16
  depths = [rng.uniform(0, 900, (2, 1, h, w)).astype(np.float32)
            for _ in range(6)]
  confs = [rng.uniform(0, 1, (2, 1, h, w)).astype(np.float32)
           for _ in range(6)]
  rgbs = [rng.normal(size=(2, 3, h, w)).astype(np.float32)
          for _ in range(4)]
  with torch.no_grad():
    t_out = tmodel([torch.from_numpy(d) for d in depths],
                   [torch.from_numpy(c) for c in confs],
                   [torch.from_numpy(r) for r in rgbs])

  jmodel = ModeFusion(max_depth=1000.0, channels=tuple(channels))
  jd = [jnp.moveaxis(jnp.asarray(d), 1, -1) for d in depths]
  jc = [jnp.moveaxis(jnp.asarray(c), 1, -1) for c in confs]
  jr = [jnp.moveaxis(jnp.asarray(r), 1, -1) for r in rgbs]
  variables = jmodel.init(jax.random.PRNGKey(0), jd, jc, jr, train=False)
  variables = convert_state_dict(tmodel.state_dict(), variables)
  j_out = jmodel.apply(variables, jd, jc, jr, train=False)
  np.testing.assert_allclose(np.asarray(j_out)[..., 0],
                             t_out.numpy()[:, 0], rtol=2e-3, atol=2e-2)
