"""Init-menu tests: distribution stats vs torch's initializers."""

import jax
import numpy as np
import pytest
import torch

from mode_tpu.models.initialize import init_model_params


def _fake_variables():
  rng = np.random.default_rng(0)
  return {"params": {
      "conv": {"kernel": rng.normal(size=(3, 3, 64, 128)).astype(np.float32)},
      "tconv": {"kernel_t": rng.normal(size=(3, 3, 3, 64, 32)).astype(np.float32)},
      "bn": {"scale": rng.normal(size=(64,)).astype(np.float32),
             "bias": rng.normal(size=(64,)).astype(np.float32)},
  }}


@pytest.mark.parametrize("init_type,torch_fn", [
    ("kaiming_normal",
     lambda w: torch.nn.init.kaiming_normal_(w, mode="fan_in",
                                             nonlinearity="leaky_relu")),
    ("xavier_normal", torch.nn.init.xavier_normal_),
    ("kaiming_uniform",
     lambda w: torch.nn.init.kaiming_uniform_(w, mode="fan_in",
                                              nonlinearity="leaky_relu")),
    ("xavier_uniform", torch.nn.init.xavier_uniform_),
])
def test_init_stats_match_torch(init_type, torch_fn):
  v = init_model_params(_fake_variables(), init_type, jax.random.PRNGKey(0))
  k = np.asarray(v["params"]["conv"]["kernel"])
  # torch layout (O, I, kh, kw) == our (*K, I, O) transposed
  tw = torch.empty(128, 64, 3, 3)
  torch.manual_seed(0)
  torch_fn(tw)
  ref = tw.numpy()
  np.testing.assert_allclose(k.std(), ref.std(), rtol=0.1)
  np.testing.assert_allclose(abs(k).max(), abs(ref).max(), rtol=0.15)
  # BN reset
  assert np.all(np.asarray(v["params"]["bn"]["scale"]) == 1)
  assert np.all(np.asarray(v["params"]["bn"]["bias"]) == 0)


def test_default_is_identity():
  v0 = _fake_variables()
  v1 = init_model_params(v0, "default", jax.random.PRNGKey(0))
  assert v1 is v0
