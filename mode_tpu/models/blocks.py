"""Building-block layers (flax.linen, channel-minor NHWC/NDHWC).

Re-designs of the reference's torch submodules
(``/root/reference/models/submodule.py``) with bit-matched semantics:

  * :class:`TorchBatchNorm` reproduces ``nn.BatchNorm2d/3d`` exactly —
    biased variance for normalization, *unbiased* variance in the running
    estimate, torch's momentum convention (0.1 = weight of the new batch);
  * :func:`conv_transpose` reproduces ``nn.ConvTranspose2d/3d`` via
    ``lax.conv_general_dilated`` with input dilation;
  * **naming**: every flax child is named with its torch state_dict path
    segment(s) (flax allows dots/digits in names), so the joined flax path
    equals the torch key — the torch→JAX checkpoint converter in
    ``mode_tpu.utils.torch_convert`` is a pure path join plus one universal
    axis permutation.

Weight init matches the reference: conv weights ~ N(0, sqrt(2/(k·k·C_out)))
(``mode_disparity.py:82-96``), BN scale 1 / bias 0, sphere-conv weights
~ U(±1/sqrt(C_in·k·k)) (``sphere_conv.py:160-165``), transpose convs keep
torch's default kaiming-uniform.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from mode_tpu.ops.sphere_conv import sphere_conv

# Global matmul/conv precision: HIGHEST keeps float32 operands exact on the
# MXU (needed for checkpoint parity with the fp32 reference). It is chosen
# per call from the operand dtype: bf16 x bf16 -> f32 accumulation is already
# exact at DEFAULT, while requesting HIGHEST on bf16 operands makes XLA
# upcast and multi-pass — measured 1.24x slower on the cost-volume conv3d
# (scripts/bench_conv3d.py: ndhwc_c32 9.36ms HIGHEST vs 7.55ms DEFAULT).
PRECISION = jax.lax.Precision.HIGHEST


def mxu_precision(dtype):
  """HIGHEST for f32 operands (exactness), DEFAULT for bf16 (native MXU)."""
  return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
          else jax.lax.Precision.DEFAULT)


def msra_normal_init():
  """N(0, sqrt(2/n)), n = prod(kernel)*C_out (mode_disparity.py:82-88);
  flax kernels are (*K, I, O)."""
  def init(key, shape, dtype=jnp.float32):
    n = np.prod(shape[:-2]) * shape[-1]
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / n)
  return init


def sphere_uniform_init():
  """U(±1/sqrt(n)), n = C_in*prod(kernel) (sphere_conv.py:160-165)."""
  def init(key, shape, dtype=jnp.float32):
    n = np.prod(shape[:-2]) * shape[-2]
    stdv = 1.0 / math.sqrt(n)
    return jax.random.uniform(key, shape, dtype, -stdv, stdv)
  return init


def _transpose_init():
  """Torch _ConvNd default on transpose convs: kaiming_uniform(a=√5) with
  fan_in computed from weight.shape[1]*prod(k) — which for torch's (I, O, *K)
  transpose layout is C_out*prod(k). Stored here as (*K, O, I)."""
  def init(key, shape, dtype=jnp.float32):
    fan_in = shape[-2] * np.prod(shape[:-2])
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)
  return init


class TorchBatchNorm(nn.Module):
  """BatchNorm with exact torch semantics over the last (channel) axis.

  ``affine_only=True`` (eval only) returns the folded per-channel
  ``(scale', bias')`` with ``BN(x) == x*scale' + bias'`` instead of
  normalizing — used to fuse BN into the Pallas conv3d epilogue. ``x`` is
  ignored then; pass ``features`` for the channel count.
  """
  momentum: float = 0.1
  eps: float = 1e-5

  @nn.compact
  def __call__(self, x, train: bool, *, affine_only: bool = False,
               features: int | None = None):
    if affine_only:
      assert not train
      c = features
      scale = self.param("scale", nn.initializers.ones, (c,))
      bias = self.param("bias", nn.initializers.zeros, (c,))
      ra_mean = self.variable("batch_stats", "mean",
                              lambda: jnp.zeros((c,), jnp.float32))
      ra_var = self.variable("batch_stats", "var",
                             lambda: jnp.ones((c,), jnp.float32))
      inv = jax.lax.rsqrt(ra_var.value + self.eps) * scale
      return inv, bias - ra_mean.value * inv
    c = x.shape[-1]
    scale = self.param("scale", nn.initializers.ones, (c,))
    bias = self.param("bias", nn.initializers.zeros, (c,))
    ra_mean = self.variable("batch_stats", "mean",
                            lambda: jnp.zeros((c,), jnp.float32))
    ra_var = self.variable("batch_stats", "var",
                           lambda: jnp.ones((c,), jnp.float32))

    if train:
      reduce_axes = tuple(range(x.ndim - 1))
      n = int(np.prod([x.shape[a] for a in reduce_axes]))
      xf = x.astype(jnp.float32)
      mean = jnp.mean(xf, axis=reduce_axes)
      var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
      if not self.is_initializing():
        unbiased = var * (n / max(n - 1, 1))
        ra_mean.value = ((1 - self.momentum) * ra_mean.value +
                         self.momentum * mean)
        ra_var.value = ((1 - self.momentum) * ra_var.value +
                        self.momentum * unbiased)
    else:
      mean, var = ra_mean.value, ra_var.value

    inv = jax.lax.rsqrt(var + self.eps) * scale
    return ((x - mean) * inv + bias).astype(x.dtype)


# lane-major layouts: which NDHWC spatial axis rides the TPU lanes
_LANE_SPEC = {"W": "NDHCW", "H": "NDWCH"}
# 2-D analog: (B, M, C, L) with W or H on the lanes
_LANE_SPEC_2D = {"W": "NHCW", "H": "NWCH"}


class Conv3dDFold(nn.Module):
  """``nn.Conv3d`` on NDHWC with TPU-friendly compute paths.

  Parameter layout is identical to flax ``nn.Conv`` (``kernel`` of shape
  ``(KD, KH, KW, I, O)``), so checkpoints are interchangeable. For the
  stride-1 3x3x3 SAME convs that dominate the cost-volume stack
  (``/root/reference/models/mode_disparity.py:115-129``) the D axis is
  folded into the batch and the conv runs as 3 accumulated 2-D convs —
  measured 1.43x faster than XLA's NDHWC conv3d at the production
  (48,256,128,32) volume, where the 32-channel lane dim wastes 3/4 of the
  MXU (scripts/bench_conv3d.py). Other configs use the plain 3-D conv.

  Lane-major call modes (eval fast path; ``x`` is (B, D, M, C, L) with one
  panorama axis on the lanes):
    * ``lane_fused=dict(lane_axis, scale, bias, residual, relu)`` — the
      fused Pallas kernel (``ops/pallas/conv3d_kernel.py``);
    * ``lane_xla=(in_lane, out_lane)`` with lanes in {'W','H'} — XLA conv
      with custom dimension numbers (used for stride-2 / small-lane convs);
      the output lane axis may differ so downstream convs see full lanes.
  """
  features: int
  kernel: Sequence[int]
  stride: Sequence[int]
  pad: Sequence[int]
  use_bias: bool = False
  kernel_init: Any = None

  @nn.compact
  def __call__(self, x: jnp.ndarray, lane_fused=None,
               lane_xla=None, lane_s2=None, lane_fold=None) -> jnp.ndarray:
    cin = (x.shape[-2] if (lane_fused or lane_xla or lane_s2 or lane_fold)
           else x.shape[-1])
    w = self.param("kernel", self.kernel_init or msra_normal_init(),
                   (*self.kernel, cin, self.features))
    dt = jnp.promote_types(x.dtype, w.dtype)
    x = x.astype(dt)
    w = w.astype(dt)

    if lane_s2 is not None:
      from mode_tpu.ops.pallas.conv3d_kernel import (
          conv3d_band_s2_pallas, weight_lane_major)
      from mode_tpu.parallel.mesh import active_mesh
      assert tuple(self.kernel) == (3, 3, 3)
      assert tuple(self.stride) == (2, 2, 2) and tuple(self.pad) == (1, 1, 1)
      assert not self.use_bias
      wl = weight_lane_major(w, lane_s2["lane_axis"])
      mesh = active_mesh()
      if mesh is not None and mesh.size > 1:
        from mode_tpu.parallel.shard_ops import conv3d_band_s2_sharded
        return conv3d_band_s2_sharded(
            x, wl, lane_s2.get("scale"), lane_s2.get("bias"),
            lane_s2.get("relu", False), mesh)
      return conv3d_band_s2_pallas(x, wl, lane_s2.get("scale"),
                                   lane_s2.get("bias"),
                                   relu=lane_s2.get("relu", False))

    if lane_fold is not None:
      # both spatial axes sub-128: fold M·L onto the lanes (the 1/16
      # hourglass level). fold_pallas_ok gates mesh/shape eligibility.
      from mode_tpu.ops.pallas.conv3d_kernel import (
          conv3d_fold_pallas, weight_lane_major)
      assert tuple(self.kernel) == (3, 3, 3)
      assert tuple(self.stride) == (1, 1, 1) and tuple(self.pad) == (1, 1, 1)
      assert not self.use_bias
      wl = weight_lane_major(w, lane_fold["lane_axis"])
      return conv3d_fold_pallas(x, wl, lane_fold.get("scale"),
                                lane_fold.get("bias"),
                                relu=lane_fold.get("relu", False))

    if lane_fused is not None:
      from mode_tpu.ops.pallas.conv3d_kernel import (
          conv3d_band_pallas, weight_lane_major)
      from mode_tpu.parallel.mesh import active_mesh
      assert tuple(self.kernel) == (3, 3, 3)
      assert tuple(self.stride) == (1, 1, 1) and tuple(self.pad) == (1, 1, 1)
      assert not self.use_bias
      wl = weight_lane_major(w, lane_fused["lane_axis"])
      mesh = active_mesh()
      if mesh is not None and mesh.size > 1:
        # SPMD: the Pallas custom call has no partitioning rule — run it
        # shard-local (B over 'data', band axis over 'spatial' with an ICI
        # halo exchange) via the shard_map wrapper
        from mode_tpu.parallel.shard_ops import conv3d_band_sharded
        return conv3d_band_sharded(
            x, wl, lane_fused.get("scale"), lane_fused.get("bias"),
            lane_fused.get("residual"), lane_fused.get("relu", False), mesh)
      return conv3d_band_pallas(
          x, wl, lane_fused.get("scale"), lane_fused.get("bias"),
          lane_fused.get("residual"), relu=lane_fused.get("relu", False))

    if lane_xla is not None:
      in_lane, out_lane = lane_xla
      dn = jax.lax.conv_dimension_numbers(
          x.shape, w.shape,
          (_LANE_SPEC[in_lane], "DHWIO", _LANE_SPEC[out_lane]))
      y = jax.lax.conv_general_dilated(
          x, w, tuple(self.stride), [(p, p) for p in self.pad],
          dimension_numbers=dn, precision=mxu_precision(dt))
      if self.use_bias:
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = y + b.astype(y.dtype)[:, None]
      return y

    if (tuple(self.kernel) == (3, 3, 3) and tuple(self.stride) == (1, 1, 1)
        and tuple(self.pad) == (1, 1, 1)):
      from mode_tpu.ops.pallas.conv3d_kernel import (
          conv3d_fold_fast, conv3d_ndhwc_fast, train_conv3d_eligible,
          train_fold_eligible)
      if train_conv3d_eligible(x.shape, self.features):
        # single-chip training fast path: Pallas fwd + Pallas grad-input,
        # XLA conv-backward-filter for grad-weight (custom_vjp)
        y = conv3d_ndhwc_fast(x, w)
        if self.use_bias:
          b = self.param("bias", nn.initializers.zeros, (self.features,))
          y = y + b.astype(y.dtype)
        return y
      if train_fold_eligible(x.shape, self.features,
                             jnp.dtype(dt).itemsize):
        # 1/16-level training fast path: folded-lane Pallas fwd/bwd
        y = conv3d_fold_fast(x, w)
        if self.use_bias:
          b = self.param("bias", nn.initializers.zeros, (self.features,))
          y = y + b.astype(y.dtype)
        return y
      n, d, h, ww, c = x.shape
      xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
      dn = jax.lax.conv_dimension_numbers(
          (n * d, h, ww, c), w.shape[1:], ("NHWC", "HWIO", "NHWC"))
      y = None
      for kd in range(3):
        xs = xp[:, kd:kd + d].reshape(n * d, h, ww, c)
        yk = jax.lax.conv_general_dilated(
            xs, w[kd], (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            precision=mxu_precision(dt))
        y = yk if y is None else y + yk
      y = y.reshape(n, d, h, ww, self.features)
    elif (tuple(self.kernel) == (3, 3, 3)
          and tuple(self.stride) == (2, 2, 2)
          and tuple(self.pad) == (1, 1, 1)):
      from mode_tpu.ops.pallas.conv3d_kernel import (conv3d_s2_fast,
                                                     train_s2_eligible)
      if train_s2_eligible(x.shape, self.features, jnp.dtype(dt).itemsize):
        # training fast path: band-s2 Pallas fwd + deconv-kernel grad-input
        y = conv3d_s2_fast(x, w)
      else:
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
        y = jax.lax.conv_general_dilated(
            x, w, tuple(self.stride), [(p, p) for p in self.pad],
            dimension_numbers=dn, precision=mxu_precision(dt))
    else:
      dn = jax.lax.conv_dimension_numbers(
          x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
      y = jax.lax.conv_general_dilated(
          x, w, tuple(self.stride), [(p, p) for p in self.pad],
          dimension_numbers=dn, precision=mxu_precision(dt))
    if self.use_bias:
      b = self.param("bias", nn.initializers.zeros, (self.features,))
      y = y + b.astype(y.dtype)
    return y


class Conv2dLane(nn.Module):
  """2-D conv on a lane-major ``(B, M, C, L)`` input (M = H, L = W on the
  TPU lanes) with the same param tree as ``nn.Conv`` (``kernel`` HWIO,
  optional ``bias``), so checkpoints interchange with the NHWC path.

  Stride-1 3x3 SAME shapes that pass ``lane_conv2d_ok`` run the fused
  Pallas band kernel with the (BN-affine, residual, ReLU) epilogue applied
  while the tile is in VMEM; everything else runs an XLA conv with
  lane-major dimension numbers and the epilogue in XLA. Keeping whole
  blocks in this layout is what makes the band kernel pay off in-program
  (see the note in :func:`conv_nd`).
  """
  features: int
  kernel: Sequence[int] = (3, 3)
  stride: Sequence[int] = (1, 1)
  pad: Sequence[int] = (1, 1)
  dilation: Sequence[int] = (1, 1)
  use_bias: bool = False
  kernel_init: Any = None

  @nn.compact
  def __call__(self, x, scale=None, bias=None, residual=None,
               relu: bool = False, g: int = 1):
    from mode_tpu.ops.pallas.conv2d_kernel import (
        bpack_conv2d_ok, conv2d_band_bpack, conv2d_band_pallas,
        lane_conv2d_ok)
    cin = x.shape[2]
    w = self.param("kernel", self.kernel_init or msra_normal_init(),
                   (*self.kernel, cin, self.features))
    w = w.astype(x.dtype)
    b = (self.param("bias", nn.initializers.zeros, (self.features,))
         if self.use_bias else None)
    dil = tuple(self.dilation)

    if (tuple(self.kernel) == (3, 3) and tuple(self.stride) == (1, 1)
        and dil[0] == dil[1] and tuple(self.pad) == (dil[0], dil[0])
        and b is None and g > 1
        and bpack_conv2d_ok(x.shape, self.features,
                            jnp.dtype(x.dtype).itemsize,
                            residual is not None, g, dil[0])):
      # batch-packed band kernel: g images share the GEMM's lane axis
      # (2-7x over NHWC XLA at the FE-stage shapes, docs/PROFILES.md)
      if cin % 8:
        pc = -cin % 8
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pc), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pc), (0, 0)))
      return conv2d_band_bpack(x, w, scale, bias, residual, relu=relu,
                               g=g, dilation=dil[0])

    if (tuple(self.kernel) == (3, 3) and tuple(self.stride) == (1, 1)
        and dil == (1, 1) and tuple(self.pad) == (1, 1) and b is None):
      from mode_tpu.parallel.mesh import active_mesh
      mesh = active_mesh()
      if mesh is not None and mesh.size > 1:
        # SPMD: the Pallas custom call has no partitioning rule — run it
        # shard-local (B over 'data', band axis M over 'spatial' with an
        # ICI halo exchange) via the shard_map wrapper, same as Conv3dDFold
        dp = mesh.shape.get("data", 1)
        sp = mesh.shape.get("spatial", 1)
        bsz, m = x.shape[0], x.shape[1]
        if (bsz % dp == 0 and m % sp == 0
            and lane_conv2d_ok((bsz // dp, m // sp, cin, x.shape[3]),
                               self.features, jnp.dtype(x.dtype).itemsize,
                               residual is not None, allow_mesh=True)):
          from mode_tpu.parallel.shard_ops import conv2d_band_sharded
          if cin % 8:
            pc = -cin % 8
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pc), (0, 0)))
            w = jnp.pad(w, ((0, 0), (0, 0), (0, pc), (0, 0)))
          return conv2d_band_sharded(x, w, scale, bias, residual, relu,
                                     mesh)
      elif lane_conv2d_ok(x.shape, self.features,
                          jnp.dtype(x.dtype).itemsize,
                          residual is not None):
        if cin % 8:
          pc = -cin % 8
          x = jnp.pad(x, ((0, 0), (0, 0), (0, pc), (0, 0)))
          w = jnp.pad(w, ((0, 0), (0, 0), (0, pc), (0, 0)))
        return conv2d_band_pallas(x, w, scale, bias, residual, relu=relu)

    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, (_LANE_SPEC_2D["W"], "HWIO", _LANE_SPEC_2D["W"]))
    y = jax.lax.conv_general_dilated(
        x, w, tuple(self.stride), [(p, p) for p in self.pad],
        rhs_dilation=dil, dimension_numbers=dn,
        precision=mxu_precision(x.dtype))
    yf = y.astype(jnp.float32)
    if scale is not None:
      yf = yf * scale[:, None] + bias[:, None]
    if b is not None:
      yf = yf + b.astype(jnp.float32)[:, None]
    if residual is not None:
      yf = yf + residual.astype(jnp.float32)
    if relu:
      yf = jnp.maximum(yf, 0.0)
    return yf.astype(x.dtype)


def convbn2d_lane(x, features, prefix, *, relu: bool = False,
                  residual=None, stride: int = 1, dilation: int = 1,
                  g: int = 1):
  """Eval-only lane-major ``convbn`` (+ optional residual / ReLU): the same
  param tree as :func:`convbn` (``prefix.0`` conv, ``prefix.1`` BN), with
  the eval BN folded to a per-channel affine and fused into the conv's
  epilogue instead of running as a separate elementwise pass. ``g`` > 1
  requests the batch-packed band kernel (Conv2dLane dispatches when
  eligible). The padding mirrors convbn's torch quirk
  (padding = dilation if dilation > 1 else 1)."""
  scale, bias = TorchBatchNorm(name=f"{prefix}.1")(
      None, False, affine_only=True, features=features)
  eff_pad = dilation if dilation > 1 else 1
  return Conv2dLane(features, stride=(stride, stride),
                    pad=(eff_pad, eff_pad), dilation=(dilation, dilation),
                    name=f"{prefix}.0")(
      x, scale=scale, bias=bias, residual=residual, relu=relu, g=g)


def downsample_lane(x, features, stride, prefix):
  """Lane-major :func:`downsample_shortcut` (1x1 conv + folded eval BN) on
  a (B, M, C, L) tensor — the residual-block shortcut for the eval FE lane
  path. Same param tree as the NHWC version."""
  scale, bias = TorchBatchNorm(name=f"{prefix}.1")(
      None, False, affine_only=True, features=features)
  return Conv2dLane(features, kernel=(1, 1), stride=(stride, stride),
                    pad=(0, 0), name=f"{prefix}.0")(
      x, scale=scale, bias=bias)


def bn_relu_lane(x, prefix, features):
  """Eval BN (folded affine) + ReLU on a lane-major (B, M, C, L) tensor."""
  scale, bias = TorchBatchNorm(name=prefix)(
      None, False, affine_only=True, features=features)
  y = x.astype(jnp.float32) * scale[:, None] + bias[:, None]
  return jnp.maximum(y, 0.0).astype(x.dtype)


class Conv2dFast3x3(nn.Module):
  """3x3 SAME stride-1 NHWC conv (optionally dilated) with the
  batch-packed Pallas fast path: forward and grad-input run
  ``conv2d_band_bpack`` via ``conv2d_3x3_fast_train`` (custom_vjp),
  grad-weight stays XLA. Eligibility (``train_bpack2d_g``): per-shard
  batch >= 2, a 128-multiple spatial axis, 8-multiple channels, no mesh,
  Pallas policy on. Ineligible shapes run the identical XLA conv nn.Conv
  would. Param tree identical to ``nn.Conv`` (``kernel`` HWIO, optional
  ``bias``)."""
  features: int
  dilation: int = 1
  use_bias: bool = False
  kernel_init: Any = None

  @nn.compact
  def __call__(self, x):
    from mode_tpu.ops.pallas.conv2d_kernel import (conv2d_3x3_fast_train,
                                                   train_bpack2d_g)
    cin = x.shape[-1]
    w = self.param("kernel", self.kernel_init or msra_normal_init(),
                   (3, 3, cin, self.features))
    dt = jnp.promote_types(x.dtype, w.dtype)
    x = x.astype(dt)
    w = w.astype(dt)
    g = train_bpack2d_g(x.shape, self.features, self.dilation,
                        jnp.dtype(dt).itemsize)
    if g is not None:
      y = conv2d_3x3_fast_train(x, w, g, self.dilation)
    else:
      dn = jax.lax.conv_dimension_numbers(
          x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
      y = jax.lax.conv_general_dilated(
          x, w, (1, 1), [(self.dilation,) * 2] * 2,
          rhs_dilation=(self.dilation,) * 2, dimension_numbers=dn,
          precision=mxu_precision(dt))
    if self.use_bias:
      b = self.param("bias", nn.initializers.zeros, (self.features,))
      y = y + b.astype(y.dtype)
    return y


def conv_nd(x: jnp.ndarray, features: int, kernel: Sequence[int], *,
            stride=1, pad=0, dilation=1, use_bias=False, name: str,
            kernel_init=None, train: bool = True) -> jnp.ndarray:
  """torch ``nn.Conv2d/3d`` on NHWC/NDHWC. ``name`` is the torch path
  segment (e.g. ``"0"`` inside a Sequential). ``train=False`` callers
  (the eval/serving path) may dispatch eligible 2-D convs to the Pallas
  lane-major kernel; training keeps XLA convs, whose differentiated graph
  fuses the BN/ReLU tails."""
  nd = len(kernel)
  stride = (stride,) * nd if isinstance(stride, int) else tuple(stride)
  pad = (pad,) * nd if isinstance(pad, int) else tuple(pad)
  dilation = (dilation,) * nd if isinstance(dilation, int) else tuple(dilation)
  if nd == 3 and dilation == (1, 1, 1):
    y = Conv3dDFold(features, tuple(kernel), stride, pad,
                    use_bias=use_bias, kernel_init=kernel_init,
                    name=name)(x)
  elif (nd == 2 and tuple(kernel) == (3, 3) and stride == (1, 1)
        and dilation[0] == dilation[1] and pad == dilation):
    # 3x3 SAME (possibly dilated): Conv2dFast3x3 takes the batch-packed
    # custom-VJP fast path when eligible (b >= 2, no mesh — the round-3
    # lesson that per-call transposes lose applied to the PER-IMAGE band
    # kernel; the batch-packed GEMMs amortize them, docs/PROFILES.md
    # round-5), XLA otherwise. Param tree identical to nn.Conv.
    y = Conv2dFast3x3(features, dilation=dilation[0], use_bias=use_bias,
                      kernel_init=kernel_init, name=name)(x)
  else:
    # NOTE: no per-call per-image Pallas dispatch here. Standalone the band
    # kernel wins every eligible shape (scripts/bench_conv2d_pallas.py), but
    # in-program the per-call NHWC<->lane transposes plus the lost conv+BN+
    # ReLU XLA fusion cost ~29 ms/frame net on the two-stage pipeline
    # (2.81 -> 2.60 fps, round-3 A/B). The per-image kernel pays off only
    # when a whole block stays lane-major with the epilogue fused — see
    # Conv2dLane / convbn2d_lane and the fusion net's eval path
    # (models/fusion.py).
    y = nn.Conv(features, tuple(kernel), strides=stride,
                padding=[(p, p) for p in pad], kernel_dilation=dilation,
                use_bias=use_bias,
                kernel_init=kernel_init or msra_normal_init(),
                bias_init=nn.initializers.zeros,
                precision=mxu_precision(x.dtype), name=name)(x)
  # no-op unless a remat policy saves by this name (models/disparity.py's
  # remat_policy="save_convs": keep conv outputs, recompute only the cheap
  # BN/ReLU elementwise tail in the backward pass)
  return checkpoint_name(y, "conv_out")


class ConvTranspose(nn.Module):
  """``nn.ConvTranspose{2,3}d(kernel, stride, padding, output_padding)``:
  input-dilated conv with a spatially flipped kernel and per-side padding
  ``(k-1-p, k-1-p+op)``. Param ``kernel_t`` is stored as (*K, O, I)."""
  features: int
  kernel: Sequence[int]
  stride: int = 2
  padding: int = 0
  output_padding: int = 0
  use_bias: bool = False

  @nn.compact
  def __call__(self, x: jnp.ndarray, lane_xla=None,
               lane_dec=None, lane_fold_dec=None) -> jnp.ndarray:
    nd = len(self.kernel)
    cin = (x.shape[-2] if (lane_xla or lane_dec or lane_fold_dec)
           else x.shape[-1])
    w = self.param("kernel_t", _transpose_init(),
                   (*self.kernel, self.features, cin))
    if lane_fold_dec is not None:
      # both spatial axes sub-128 (the 1/16 -> 1/8 decoder step): fold M·L
      # onto the lanes; fold_deconv_ok gates mesh/shape eligibility
      from mode_tpu.ops.pallas.conv3d_kernel import conv3d_fold_deconv_pallas
      assert nd == 3 and tuple(self.kernel) == (3, 3, 3)
      assert self.stride == 2 and self.padding == 1
      assert self.output_padding == 1 and not self.use_bias
      return conv3d_fold_deconv_pallas(
          x, w.astype(x.dtype), lane_fold_dec.get("scale"),
          lane_fold_dec.get("bias"), relu=lane_fold_dec.get("relu", False),
          lane_axis=lane_fold_dec["lane_axis"])
    if lane_dec is not None:
      # fused Pallas deconv (k=3, s=2, p=1, op=1) on a lane-major volume;
      # the kernel flips/reorders the raw torch-layout param itself
      from mode_tpu.ops.pallas.conv3d_kernel import conv3d_band_deconv_pallas
      from mode_tpu.parallel.mesh import active_mesh
      assert nd == 3 and tuple(self.kernel) == (3, 3, 3)
      assert self.stride == 2 and self.padding == 1
      assert self.output_padding == 1 and not self.use_bias
      mesh = active_mesh()
      if mesh is not None and mesh.size > 1:
        from mode_tpu.parallel.shard_ops import conv3d_band_deconv_sharded
        return conv3d_band_deconv_sharded(
            x, w.astype(x.dtype), lane_dec.get("scale"),
            lane_dec.get("bias"), lane_dec.get("relu", False),
            lane_dec["lane_axis"], mesh)
      return conv3d_band_deconv_pallas(
          x, w.astype(x.dtype), lane_dec.get("scale"), lane_dec.get("bias"),
          relu=lane_dec.get("relu", False),
          lane_axis=lane_dec["lane_axis"])
    if (nd == 3 and lane_xla is None and tuple(self.kernel) == (3, 3, 3)
        and self.stride == 2 and self.padding == 1
        and self.output_padding == 1 and not self.use_bias):
      from mode_tpu.ops.pallas.conv3d_kernel import (convtranspose3d_fast,
                                                     train_deconv_eligible)
      if train_deconv_eligible(x.shape, self.features,
                               jnp.dtype(x.dtype).itemsize):
        # training fast path: deconv-kernel fwd + band-s2 grad-input
        return checkpoint_name(
            convtranspose3d_fast(x, w.astype(x.dtype)), "conv_out")
    w_flipped = jnp.flip(w, axis=tuple(range(nd)))
    w_io = jnp.swapaxes(w_flipped, -1, -2)                # (*K, I, O)
    pad = [(k - 1 - self.padding, k - 1 - self.padding + self.output_padding)
           for k in self.kernel]
    spatial = "DHW"[3 - nd:]
    if lane_xla is not None:
      in_lane, out_lane = lane_xla
      table = _LANE_SPEC if nd == 3 else _LANE_SPEC_2D
      specs = (table[in_lane], f"{spatial}IO", table[out_lane])
    else:
      specs = (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")
    dn = jax.lax.conv_dimension_numbers(x.shape, w_io.shape, specs)
    y = jax.lax.conv_general_dilated(
        x, w_io.astype(x.dtype), window_strides=(1,) * nd, padding=pad,
        lhs_dilation=(self.stride,) * nd, rhs_dilation=(1,) * nd,
        dimension_numbers=dn, precision=mxu_precision(x.dtype))
    if self.use_bias:
      fan_in = self.features * int(np.prod(self.kernel))
      bound = 1.0 / math.sqrt(fan_in)
      b = self.param(
          "bias",
          lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
          (self.features,))
      y = y + (b.astype(y.dtype)[:, None] if lane_xla else b.astype(y.dtype))
    return checkpoint_name(y, "conv_out")


class SphereConvLayer(nn.Module):
  """The reference ``SphereConv`` module (sphere_conv.py:120-246): holds the
  weight; the sampling-position tables are static functions of the input
  shape. Param named ``kernel`` so the ckpt converter treats it like a conv."""
  features: int
  kernel: int = 3
  stride: int = 1
  pad: int = 0
  dilation: int = 1
  sphere_type: str = "Cassini"
  use_bias: bool = False

  @nn.compact
  def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
    cin = x.shape[-1]
    w = self.param("kernel", sphere_uniform_init(),
                   (self.kernel, self.kernel, cin, self.features))
    b = (self.param("bias", nn.initializers.zeros, (self.features,))
         if self.use_bias else None)
    return checkpoint_name(
        sphere_conv(x, w.astype(x.dtype), b,
                    sphere_type=self.sphere_type, stride=self.stride,
                    pad=self.pad, dilation=self.dilation,
                    precision=mxu_precision(x.dtype)), "conv_out")


# --------------------------------------------------------------------------
# torch-path-named composites. Each helper takes ``prefix`` = its torch
# attribute path inside the parent module, and emits children named
# ``prefix.<i>`` exactly as torch's Sequential would.
# --------------------------------------------------------------------------

def convbn(x, train, features, kernel, stride, pad, dilation, prefix):
  """``convbn`` (submodule.py:15-17) including the torch padding quirk
  ``padding = dilation if dilation > 1 else pad``."""
  eff_pad = dilation if dilation > 1 else pad
  x = conv_nd(x, features, (kernel, kernel), stride=stride, pad=eff_pad,
              dilation=dilation, name=f"{prefix}.0", train=train)
  return TorchBatchNorm(name=f"{prefix}.1")(x, train)


def convbn_3d(x, train, features, kernel, stride, pad, prefix):
  """``convbn_3d`` (submodule.py:20-22) on NDHWC."""
  x = conv_nd(x, features, (kernel,) * 3, stride=stride, pad=pad,
              name=f"{prefix}.0")
  return TorchBatchNorm(name=f"{prefix}.1")(x, train)


def convbn_3d_lane(x, features, kernel, stride, pad, prefix, *, in_lane,
                   out_lane=None, relu=False, residual=None):
  """Eval-only lane-major ``convbn_3d`` — same param tree as
  :func:`convbn_3d`, but ``x`` is (B, D, M, C, L) with the ``in_lane``
  panorama axis ('W' or 'H') on the TPU lanes. Stride-1 3x3x3 convs run the
  fused Pallas kernel (BN affine + residual + ReLU in the epilogue); other
  configs run an XLA conv in the lane-major layout (``out_lane`` may differ
  so downstream convs keep full lanes) with the epilogue applied by XLA.
  """
  from mode_tpu.ops.pallas.conv3d_kernel import (band_pallas_ok, band_s2_ok,
                                                 fold_pallas_ok)
  out_lane = out_lane or in_lane
  scale, bias = TorchBatchNorm(name=f"{prefix}.1")(
      None, False, affine_only=True, features=features)
  conv = Conv3dDFold(features, (kernel,) * 3, (stride,) * 3, (pad,) * 3,
                     name=f"{prefix}.0")
  if (kernel == 3 and stride == 1 and pad == 1 and out_lane == in_lane
      and band_pallas_ok(x.shape, features, jnp.dtype(x.dtype).itemsize,
                         residual is not None)):
    return conv(x, lane_fused=dict(lane_axis=3 if in_lane == "W" else 2,
                                   scale=scale, bias=bias,
                                   residual=residual, relu=relu))
  if (kernel == 3 and stride == 1 and pad == 1 and out_lane == in_lane
      and residual is None
      and fold_pallas_ok(x.shape, features, jnp.dtype(x.dtype).itemsize)):
    return conv(x, lane_fold=dict(lane_axis=3 if in_lane == "W" else 2,
                                  scale=scale, bias=bias, relu=relu))
  if (kernel == 3 and stride == 2 and pad == 1 and residual is None
      and band_s2_ok(x.shape, features, jnp.dtype(x.dtype).itemsize)):
    y = conv(x, lane_s2=dict(lane_axis=3 if in_lane == "W" else 2,
                             scale=scale, bias=bias, relu=relu))
    if out_lane != in_lane:
      # the s2 kernel halves the lane axis in place; switch the band/lane
      # axes here so downstream convs see the full-width axis on the lanes
      y = jnp.swapaxes(y, 2, 4)
    return y
  y = conv(x, lane_xla=(in_lane, out_lane)).astype(jnp.float32)
  y = y * scale[:, None] + bias[:, None]
  if residual is not None:
    y = y + residual.astype(jnp.float32)
  if relu:
    y = jnp.maximum(y, 0.0)
  return y.astype(x.dtype)


def sphere_convbn(x, train, features, kernel, stride, pad, dilation,
                  sphere_type, prefix):
  """``sphereConvbn`` (submodule.py:61-74)."""
  eff_pad = dilation if dilation > 1 else pad
  x = SphereConvLayer(features, kernel, stride, eff_pad, dilation,
                      sphere_type, name=f"{prefix}.0")(x)
  return TorchBatchNorm(name=f"{prefix}.1")(x, train)


def downsample_shortcut(x, train, features, stride, prefix):
  """1x1 conv + BN shortcut used by residual blocks (submodule.py:165-174)."""
  x = conv_nd(x, features, (1, 1), stride=stride, pad=0, name=f"{prefix}.0")
  return TorchBatchNorm(name=f"{prefix}.1")(x, train)


class BasicBlockNoRelu(nn.Module):
  """PSMNet ``BasicBlock`` (submodule.py:25-47): no ReLU after the add."""
  features: int
  stride: int = 1
  pad: int = 1
  dilation: int = 1
  has_downsample: bool = False

  @nn.compact
  def __call__(self, x, train: bool):
    out = convbn(x, train, self.features, 3, self.stride, self.pad,
                 self.dilation, "conv1.0")
    out = nn.relu(out)
    out = convbn(out, train, self.features, 3, 1, self.pad, self.dilation,
                 "conv2")
    if self.has_downsample:
      x = downsample_shortcut(x, train, self.features, self.stride,
                              "downsample")
    return out + x


class RegularBasicBlock(nn.Module):
  """``RegularBasicBlock`` (submodule.py:94-119): ReLU after the add.

  ``lane_g`` (eval only): run lane-major on a (B, M, C, L) input — both
  convbn stages through :func:`convbn2d_lane` with the BN folded into the
  conv epilogue and the shortcut add + final ReLU fused into conv2's
  epilogue; ``lane_g`` > 1 additionally requests the batch-packed band
  kernel. Identical param tree to the NHWC path."""
  features: int
  stride: int = 1
  pad: int = 1
  dilation: int = 1
  has_downsample: bool = False

  @nn.compact
  def __call__(self, x, train: bool, lane_g: int | None = None):
    if lane_g is not None:
      assert not train
      out = convbn2d_lane(x, self.features, "conv1.0", relu=True,
                          stride=self.stride, dilation=self.dilation,
                          g=lane_g)
      sc = (downsample_lane(x, self.features, self.stride, "downsample")
            if self.has_downsample else x)
      return convbn2d_lane(out, self.features, "conv2", residual=sc,
                           relu=True, dilation=self.dilation, g=lane_g)
    out = convbn(x, train, self.features, 3, self.stride, self.pad,
                 self.dilation, "conv1.0")
    out = nn.relu(out)
    out = convbn(out, train, self.features, 3, 1, self.pad, self.dilation,
                 "conv2")
    if self.has_downsample:
      x = downsample_shortcut(x, train, self.features, self.stride,
                              "downsample")
    return nn.relu(out + x)


class SphereBasicBlock(nn.Module):
  """``SphereBasicBlock`` (submodule.py:122-147)."""
  features: int
  stride: int = 1
  pad: int = 1
  dilation: int = 1
  sphere_type: str = "Cassini"
  has_downsample: bool = False

  @nn.compact
  def __call__(self, x, train: bool):
    out = sphere_convbn(x, train, self.features, 3, self.stride, self.pad,
                        self.dilation, self.sphere_type, "conv1.0")
    out = nn.relu(out)
    out = sphere_convbn(out, train, self.features, 3, 1, self.pad,
                        self.dilation, self.sphere_type, "conv2")
    if self.has_downsample:
      x = downsample_shortcut(x, train, self.features, self.stride,
                              "downsample")
    return nn.relu(out + x)


class FusionBasicBlock(nn.Module):
  """The fusion model's ``BasicBlock`` (mode_fusion.py:17-32): two
  convbn+ReLU stages, NO residual add (its ``downsample`` is constructed but
  unused in forward — we don't create those dead params)."""
  features: int
  stride: int = 1
  pad: int = 1
  dilation: int = 1

  @nn.compact
  def __call__(self, x, train: bool):
    out = convbn(x, train, self.features, 3, self.stride, self.pad,
                 self.dilation, "conv1.0")
    out = nn.relu(out)
    out = convbn(out, train, self.features, 3, 1, self.pad, self.dilation,
                 "conv2.0")
    return nn.relu(out)


class FusionBasicBlockLane(nn.Module):
  """Lane-major eval twin of :class:`FusionBasicBlock` (same param tree):
  both convbn+ReLU stages run through :func:`convbn2d_lane` with the BN and
  ReLU fused into the conv epilogue."""
  features: int

  @nn.compact
  def __call__(self, x):
    out = convbn2d_lane(x, self.features, "conv1.0", relu=True)
    return convbn2d_lane(out, self.features, "conv2.0", relu=True)
