"""End-to-end stage-1 parity at a TRAINED operating point.

The random-weight parity tests (``test_model_parity.py``) pin every layer
but must use loose end-to-end tolerances: a random-init soft-argmin
regresses over near-uniform softmax probabilities, so reduction-order noise
swings the prediction by pixels. These tests load mirror weights trained on
a synthetic stereo task (``tests/trained_mirror.py``, committed artifact)
where the softmax is collapsed — and pin the full JAX model against the
torch mirror at ≤1e-3 disparity MAE, the bar the released-checkpoint
golden-parity protocol targets (``scripts/golden_parity.py``,
``/root/reference/README.md:104-111``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mode_tpu.models.disparity import ModeDisparity
from mode_tpu.utils.torch_convert import convert_state_dict
from tests.trained_mirror import MAXDISP, _make_batch, load_trained_mirror


@pytest.fixture(scope="module")
def trained_pair():
  tmodel = load_trained_mirror(out_conf=True)
  rng = np.random.default_rng(42)
  left, right, gt = _make_batch(rng, batch=3)
  jmodel = ModeDisparity(maxdisp=MAXDISP, out_conf=True)
  jl = jnp.moveaxis(jnp.asarray(left.numpy()), 1, -1)
  jr = jnp.moveaxis(jnp.asarray(right.numpy()), 1, -1)
  variables = jmodel.init(jax.random.PRNGKey(0), jl, jr, train=False)
  variables = convert_state_dict(tmodel.state_dict(), variables)
  return tmodel, jmodel, variables, left, right, gt


def test_trained_eval_parity(trained_pair):
  """JAX vs mirror disparity at trained weights: MAE <= 1e-3 px."""
  tmodel, jmodel, variables, left, right, _ = trained_pair
  tmodel.eval()
  with torch.no_grad():
    t_pred, t_conf = tmodel(left, right)
  j_pred, j_conf = jmodel.apply(
      variables, jnp.moveaxis(jnp.asarray(left.numpy()), 1, -1),
      jnp.moveaxis(jnp.asarray(right.numpy()), 1, -1), train=False)
  mae = float(np.abs(np.asarray(j_pred) - t_pred.numpy()).mean())
  assert mae <= 1e-3, f"trained-weights disparity MAE {mae}"
  # the operating point must be non-chaotic: tight max-abs too
  assert float(np.abs(np.asarray(j_pred) - t_pred.numpy()).max()) <= 1e-2
  conf_mae = float(np.abs(np.asarray(j_conf) - t_conf.numpy()).mean())
  assert conf_mae <= 1e-3, f"confidence MAE {conf_mae}"


def test_trained_train_mode_parity(trained_pair):
  """All three deep-supervision heads match in train mode at trained
  weights (the training observable — what a fine-tune run would see)."""
  tmodel, jmodel, variables, left, right, _ = trained_pair
  tmodel.train()
  with torch.no_grad():
    t1, t2, t3 = tmodel(left, right)
  (j1, j2, j3), _ = jmodel.apply(
      variables, jnp.moveaxis(jnp.asarray(left.numpy()), 1, -1),
      jnp.moveaxis(jnp.asarray(right.numpy()), 1, -1), train=True,
      mutable=["batch_stats"])
  for tj, tt in ((j1, t1), (j2, t2), (j3, t3)):
    mae = float(np.abs(np.asarray(tj) - tt.numpy()).mean())
    assert mae <= 1e-3, f"train-mode head MAE {mae}"


def test_trained_bf16_drift(trained_pair):
  """bf16 conv-path drift vs f32 at the trained operating point stays
  small on CPU (the production-path drift gate at full resolution runs
  on-chip: ``scripts/tpu_kernel_check.py``)."""
  from mode_tpu.training import cast_conv_params
  _, jmodel, variables, left, right, _ = trained_pair
  jl = jnp.moveaxis(jnp.asarray(left.numpy()), 1, -1)
  jr = jnp.moveaxis(jnp.asarray(right.numpy()), 1, -1)
  ref, _ = jmodel.apply(variables, jl, jr, train=False)
  v16 = dict(variables)
  v16["params"] = cast_conv_params(variables["params"], jnp.bfloat16)
  out, _ = jmodel.apply(v16, jl.astype(jnp.bfloat16),
                        jr.astype(jnp.bfloat16), train=False)
  mae = float(np.abs(np.asarray(out) - np.asarray(ref)).mean())
  assert mae <= 0.02, f"bf16 drift MAE {mae} px"
