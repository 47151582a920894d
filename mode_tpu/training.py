"""Jitted SPMD train/eval steps for both stages.

Replaces the reference's per-batch Python loops + DataParallel
(``/root/reference/train_disparity.py:147-163``, ``train_fusion.py:90-116``)
with single compiled steps over a device mesh: the whole update — forward,
loss, backward, Adam, batch-stat update — is one XLA program; gradients
all-reduce over ICI automatically from the batch sharding.

Optimizer parity: Adam(lr, betas=(0.9, 0.999), eps=1e-8) with the
reference's schedules — stage 1 lr=1e-3 ×0.1 after epoch ``start_decay``=45
(``train_disparity.py:138-143``), stage 2 constant lr
(``train_fusion.py:152-155``; its Adam is *created* with 1e-3 but every
epoch resets param groups to ``args.lr``=1e-4 before any step, so the
effective lr is args.lr). Learning rate is injected as a state field so
epoch changes don't retrigger compilation.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from mode_tpu.parallel import mesh as pmesh
from mode_tpu.utils.losses import disparity_deep_supervision, silog_loss


def normalize_rgb_on_device(x, compute_dtype=None):
  """ImageNet-normalize a uint8 RGB batch on device (same math as the host
  ``preprocess.rgb_to_tensor``); float inputs pass through. Pairing this
  with the loaders' ``device_normalize`` mode cuts host→device bytes 4×."""
  if x.dtype == jnp.uint8:
    from mode_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
    xf = x.astype(jnp.float32) / 255.0
    x = (xf - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
  return x.astype(compute_dtype) if compute_dtype else x


def cast_conv_params(params, dtype):
  """Cast conv kernels (kernel/kernel_t leaves) to ``dtype``; BN leaves stay
  float32. Differentiable — under autodiff the cast transposes back to f32
  master-weight gradients (mixed-precision training)."""
  def f(path, leaf):
    if path[-1].key in ("kernel", "kernel_t"):
      return leaf.astype(dtype)
    return leaf
  return jax.tree_util.tree_map_with_path(f, params)


@flax.struct.dataclass
class TrainState:
  params: Any
  batch_stats: Any
  opt_state: Any
  step: jnp.ndarray


def make_optimizer() -> optax.GradientTransformation:
  """Adam with an injected learning rate (torch defaults)."""
  return optax.inject_hyperparams(optax.adam)(
      learning_rate=1e-3, b1=0.9, b2=0.999, eps=1e-8)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
  opt_state = state.opt_state
  opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
  return state.replace(opt_state=opt_state)


def init_state(model, optimizer, rng, *example_args, **example_kw
               ) -> TrainState:
  variables = model.init(rng, *example_args, **example_kw)
  params = variables["params"]
  batch_stats = variables.get("batch_stats", {})
  return TrainState(params=params, batch_stats=batch_stats,
                    opt_state=optimizer.init(params),
                    step=jnp.zeros((), jnp.int32))


def make_disparity_train_step(model, optimizer,
                              mesh: Optional[Any] = None,
                              compute_dtype=None) -> Callable:
  """One stage-1 update: deep-supervision smooth-L1 on ~isnan(gt) mask
  (train_disparity.py:195). ``compute_dtype=jnp.bfloat16`` enables
  mixed-precision (bf16 activations/conv kernels, f32 master weights,
  f32 softmax/regression and loss)."""

  # Pallas custom-VJP conv3d in training: ON by default for per-shard
  # batch >= 2 since round 4 (B=2 A/B: 294.9 -> 281.9 ms/example), OFF at
  # B=1 where the per-call lane transposes + lost BN/ReLU fusion outweigh
  # the GEMM win (439.4 -> 464.9 ms; scripts/bench_train_s1.py, policy in
  # ops/pallas/conv3d_kernel.py:_TRAIN_PALLAS_MIN_BATCH). Only legal
  # without a mesh: the SPMD partitioner cannot split the Pallas call.
  from mode_tpu.ops.pallas.conv3d_kernel import (set_conv3d_train_pallas,
                                                 train_pallas_enabled)
  # captured at step-build time so A/B harnesses (scripts/bench_train_s1.py)
  # can flip it with set_conv3d_train_pallas before building the step; the
  # explicit set/reset bracket below keeps tracing deterministic either way
  use_train_pallas = train_pallas_enabled()

  def step(state: TrainState, left, right, disp_gt):
    mask = ~jnp.isnan(disp_gt)
    gt = jnp.where(mask, disp_gt, 0.0)

    def loss_fn(params):
      apply_params = (cast_conv_params(params, compute_dtype)
                      if compute_dtype else params)
      l = normalize_rgb_on_device(left, compute_dtype)
      r = normalize_rgb_on_device(right, compute_dtype)
      prev_train_pallas = train_pallas_enabled()
      set_conv3d_train_pallas(use_train_pallas)
      try:
        (p1, p2, p3), mut = model.apply(
            {"params": apply_params, "batch_stats": state.batch_stats},
            l, r, train=True, mutable=["batch_stats"])
      finally:
        # restore the value the global held at TRACE entry (not the
        # build-time capture): interleaved retraces of two step builders
        # with different captures must leave the ambient setting unchanged,
        # while tracing itself stays deterministic via the set() above
        set_conv3d_train_pallas(prev_train_pallas)
      loss = disparity_deep_supervision((p1, p2, p3), gt, mask)
      return loss, mut["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(params=params, batch_stats=new_stats,
                         opt_state=opt_state, step=state.step + 1), loss

  return _jit_with_mesh(step, mesh)


def make_fusion_train_step(model, optimizer, max_depth: float,
                           mesh: Optional[Any] = None,
                           compute_dtype=None,
                           raw_inputs: bool = False) -> Callable:
  """One stage-2 update: silog(λ=0.5) on gt<=max_depth
  (train_fusion.py:100-112).

  ``raw_inputs``: accept the packed-dataset wire dtypes — depths f16,
  confs u8, rgbs raw u8 (``data/fusion_pack.py``) — and unpack them ON
  DEVICE (conf/255, ImageNet-normalize rgb): ~3x fewer host→device bytes
  per frame than pre-decoded float32 inputs."""

  def step(state: TrainState, depths, confs, rgbs, gt):
    mask = gt <= max_depth
    in_dtype = compute_dtype or jnp.float32
    if raw_inputs:
      depths = [d.astype(in_dtype) for d in depths]
      confs = [c.astype(in_dtype) * jnp.asarray(1.0 / 255.0, in_dtype)
               for c in confs]
      rgbs = [normalize_rgb_on_device(r, in_dtype) for r in rgbs]

    def loss_fn(params):
      apply_params = (cast_conv_params(params, compute_dtype)
                      if compute_dtype else params)
      out, mut = model.apply(
          {"params": apply_params, "batch_stats": state.batch_stats},
          list(depths), list(confs), list(rgbs), train=True,
          mutable=["batch_stats"])
      loss = silog_loss(0.5, out[..., 0], gt, mask)
      return loss, mut["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(params=params, batch_stats=new_stats,
                         opt_state=opt_state, step=state.step + 1), loss

  return _jit_with_mesh(step, mesh)


def _jit_with_mesh(step_fn, mesh):
  """jit the step; with a mesh, run it inside the mesh context so in-model
  sharding constraints resolve, and donate the state."""
  jitted = jax.jit(step_fn, donate_argnums=(0,))
  if mesh is None:
    return jitted

  @functools.wraps(step_fn)
  def wrapped(state, *args):
    with mesh, pmesh.activate(mesh):
      return jitted(state, *args)

  # AOT access (scripts/aot_topology_compile.py): .lower() must trace inside
  # the same mesh contexts, so expose the underlying jitted step
  wrapped.jitted = jitted
  wrapped.mesh = mesh
  return wrapped


def shard_batch(mesh, tree):
  """Device-put a host batch with the leading axis sharded over 'data'."""
  if mesh is None:
    return jax.device_put(tree)
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, pmesh.batch_sharding(mesh, x.ndim)), tree)
