"""SPMD tests on the 8-virtual-device CPU mesh: the driver's dryrun
contract, sharding equivalence, and checkpoint round-trip."""

import jax
import numpy as np
import pytest


def test_dryrun_multichip_contract():
  import __graft_entry__ as ge
  ge.dryrun_multichip(8)


def test_entry_contract():
  import __graft_entry__ as ge
  fn, example_args = ge.entry()
  # compile-check only (full-res eval on CPU is too slow to execute)
  jax.eval_shape(fn, *example_args)


def test_spmd_eval_matches_single_device():
  """Sharded eval forward of the full stage-1 model must match unsharded.

  (Training-mode gradient equality is NOT a valid cross-sharding test for
  this model: a batch-order swap on a single device already perturbs the
  untrained network's gradients by ~40% relative — f32 chaos through
  batch-2 BatchNorm + softmax over 30 layers. Gradient correctness under
  sharding is covered on a shallow model below, and per-op in
  test_sphere_conv.)
  """
  from mode_tpu import training
  from mode_tpu.models.disparity import ModeDisparity
  from mode_tpu.parallel import make_mesh
  from mode_tpu.parallel import mesh as pmesh

  # maxdisp//4 (cost depth) must be divisible by 4 for the hourglass
  h, w, maxdisp, b = 32, 16, 16, 2
  model = ModeDisparity(maxdisp=maxdisp, out_conf=True)
  rng = np.random.default_rng(0)
  left = rng.normal(size=(b, h, w, 3)).astype(np.float32)
  right = rng.normal(size=(b, h, w, 3)).astype(np.float32)
  variables = model.init(jax.random.PRNGKey(0), left[:1], right[:1],
                         train=False)
  fwd = jax.jit(lambda v, l, r: model.apply(v, l, r, train=False))

  pred0, conf0 = fwd(variables, left, right)
  mesh = make_mesh(data=2, spatial=4)
  batch = training.shard_batch(mesh, (left, right))
  with mesh, pmesh.activate(mesh):
    pred1, conf1 = fwd(variables, *batch)
  np.testing.assert_allclose(np.asarray(pred1), np.asarray(pred0),
                             rtol=1e-3, atol=1e-3)
  # confidence values span [0, 3] with softmax tails ~1e-18 whose relative
  # error is pure reduction-order noise
  np.testing.assert_allclose(np.asarray(conf1), np.asarray(conf0),
                             rtol=2e-3, atol=1e-3)

  # the loose tolerances above absorb softmax chaos on the random-weight
  # regression head; the network TRUNK must agree much tighter — pin the
  # final pre-softmax cost logits (classif3.2 output) across shardings
  cap = jax.jit(lambda v, l, r: model.apply(
      v, l, r, train=False, capture_intermediates=True)[1])

  def classif3(tree):
    return np.asarray(
        tree["intermediates"]["classif3.2"]["__call__"][0])

  logits0 = classif3(cap(variables, left, right))
  with mesh, pmesh.activate(mesh):
    logits1 = classif3(cap(variables, *batch))
  # measured: sharded-vs-unsharded reorder noise is ~9e-7 of the logit
  # scale (|logits| reaches ~600 on random weights), and pure batch
  # sharding shows the same scale — i.e. f32 epsilon, not a halo bug
  scale = np.abs(logits0).max()
  assert np.abs(logits1 - logits0).max() <= 2e-6 * scale


def test_spmd_grads_match_on_shallow_model():
  """Gradient equality under batch sharding (Baseline fusion net, BN in
  eval mode — train-mode batch statistics at batch 2 make gradients
  chaotically sensitive to reduction order even on one device, which would
  test float noise rather than SPMD correctness)."""
  from mode_tpu import training
  from mode_tpu.models.fusion import Baseline
  from mode_tpu.parallel import make_mesh
  from mode_tpu.parallel import mesh as pmesh
  from mode_tpu.utils.losses import silog_loss

  model = Baseline(max_depth=100.0)
  rng = np.random.default_rng(0)
  depths = [rng.uniform(1, 90, (2, 16, 8, 1)).astype(np.float32)
            for _ in range(6)]
  gt = rng.uniform(1, 90, (2, 16, 8)).astype(np.float32)
  variables = model.init(jax.random.PRNGKey(0),
                         [d[:1] for d in depths], train=False)

  def loss_fn(params, depths, gt):
    out = model.apply({"params": params,
                       "batch_stats": variables["batch_stats"]},
                      list(depths), train=False)
    return silog_loss(0.5, out[..., 0], gt, gt <= 100.0)

  gf = jax.jit(jax.grad(loss_fn))
  g0 = gf(variables["params"], depths, gt)
  mesh = make_mesh(data=2, spatial=1)
  sharded = training.shard_batch(mesh, (depths, gt))
  with mesh, pmesh.activate(mesh):
    g1 = gf(variables["params"], *sharded)
  for a, b in zip(jax.tree_util.tree_leaves(g0),
                  jax.tree_util.tree_leaves(g1)):
    scale = max(float(np.abs(np.asarray(a)).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-3, atol=1e-3 * scale)


def test_checkpoint_roundtrip(tmp_path):
  from mode_tpu import training
  from mode_tpu.models.fusion import Baseline
  from mode_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

  model = Baseline(max_depth=100.0)
  depths = [np.random.default_rng(i).normal(
      size=(1, 16, 8, 1)).astype(np.float32) for i in range(6)]
  optimizer = training.make_optimizer()
  state = training.init_state(model, optimizer, jax.random.PRNGKey(0),
                              depths, train=False)
  payload = {"epoch": 3, "params": state.params,
             "batch_stats": state.batch_stats}
  path = str(tmp_path / "ckpt")
  save_checkpoint(path, payload)
  restored = load_checkpoint(path)
  assert int(restored["epoch"]) == 3
  orig = jax.tree_util.tree_leaves(state.params)
  back = jax.tree_util.tree_leaves(restored["params"])
  for a, b in zip(orig, back):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_bf16_mixed_precision_train_step():
  """bf16 train step: master weights stay f32, loss finite, params move."""
  import jax.numpy as jnp
  from mode_tpu import training
  from mode_tpu.models.disparity import ModeDisparity

  h, w, maxdisp, b = 32, 16, 16, 1
  model = ModeDisparity(maxdisp=maxdisp)
  opt = training.make_optimizer()
  rng = np.random.default_rng(0)
  left = rng.normal(size=(b, h, w, 3)).astype(np.float32)
  right = rng.normal(size=(b, h, w, 3)).astype(np.float32)
  disp = rng.uniform(0.5, maxdisp - 1, size=(b, h, w)).astype(np.float32)
  state = training.init_state(model, opt, jax.random.PRNGKey(0), left,
                              right, train=False)
  step = training.make_disparity_train_step(model, opt, None,
                                            compute_dtype=jnp.bfloat16)
  p0 = jax.tree_util.tree_map(np.asarray, state.params)
  state, loss = step(state, left, right, disp)
  assert np.isfinite(float(loss))
  for a, b_ in zip(jax.tree_util.tree_leaves(p0),
                   jax.tree_util.tree_leaves(state.params)):
    assert np.asarray(b_).dtype == np.float32   # master weights stay f32
  moved = any(np.abs(np.asarray(a) - np.asarray(b_)).max() > 0
              for a, b_ in zip(jax.tree_util.tree_leaves(p0),
                               jax.tree_util.tree_leaves(state.params)))
  assert moved
