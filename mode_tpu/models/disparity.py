"""MODE stage-1: omnidirectional stereo matching (disparity estimation).

TPU-native re-design of ``ModeDisparity``
(``/root/reference/models/mode_disparity.py``) and its feature extractors
(``submodule.py:151-267``): PSMNet-style shared feature extraction, 4-D cost
volume by concat-shift, three stacked 3-D hourglasses with additive deep
supervision, trilinear upsample (align_corners), softmax → soft-argmin, and
an optional confidence map.

Layout: NHWC images, NDHWC cost volumes (channel-minor = TPU lanes). Flax
children are named with torch state_dict path segments so checkpoints convert
mechanically (see ``models/blocks.py``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mode_tpu.models.blocks import (
    BasicBlockNoRelu,
    Conv3dDFold,
    ConvTranspose,
    RegularBasicBlock,
    SphereBasicBlock,
    TorchBatchNorm,
    conv_nd,
    convbn,
    convbn_3d,
    convbn_3d_lane,
    sphere_convbn,
)
from mode_tpu.ops.cost_volume import build_cost_volume
from mode_tpu.parallel.mesh import constrain_spatial
from mode_tpu.ops.resize import upsample_bilinear, upsample_trilinear


class SphereFeatureExtraction(nn.Module):
  """``sphere_feature_extraction`` (submodule.py:151-201): stride-2 7x7 stem,
  three regular residual stages (dilation 2 in stage 3), a stage of 8
  spherical residual blocks, concat(64+64+128) → 32-channel output at 1/4
  resolution."""
  sphere_type: str = "Cassini"

  @nn.compact
  def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
    from mode_tpu.models.blocks import convbn2d_lane
    from mode_tpu.ops.pallas.conv2d_kernel import (pallas_policy_ok,
                                                   pick_bpack_g)

    lane_stem = (not train and x.shape[2] % 256 == 0
                 and pallas_policy_ok(allow_mesh=True))
    # lane-resident residual stages need the batch-packed kernel at BOTH
    # lane widths (W/2 for layer1, W/4 for layer2/3) — per-image band
    # kernels lose at these small-N GEMMs and packing has no shard_map
    # wrapper, so under a mesh (or at b=1) the stages stay NHWC XLA
    lane_fe = (lane_stem and pallas_policy_ok(allow_mesh=False)
               and pick_bpack_g(x.shape[0], x.shape[2] // 2) is not None
               and pick_bpack_g(x.shape[0], x.shape[2] // 4) is not None)
    if lane_stem:
      # eval: the two stride-1 stem convs run the fused 2-D band kernel
      # (BN+ReLU in the epilogue) in lane-major; the 7x7/2 stem conv stays
      # NHWC XLA (C=3 input, stride 2). Under a mesh each Conv2dLane
      # routes through the shard_map wrapper per-call (models/blocks.py)
      x = nn.relu(convbn(x, train, 32, 7, 2, 3, 1, "firstconv.0"))
      xl = jnp.transpose(x, (0, 1, 3, 2))
      g_stem = ((pick_bpack_g(xl.shape[0], xl.shape[3]) or 1)
                if lane_fe else 1)
      xl = convbn2d_lane(xl, 32, "firstconv.2", relu=True, g=g_stem)
      xl = convbn2d_lane(xl, 32, "firstconv.4", relu=True, g=g_stem)
      x = xl if lane_fe else jnp.transpose(xl, (0, 1, 3, 2))
    else:
      for i, (feat, k, s, p) in enumerate([(32, 7, 2, 3), (32, 3, 1, 1),
                                           (32, 3, 1, 1)]):
        x = nn.relu(convbn(x, train, feat, k, s, p, 1,
                           f"firstconv.{2 * i}"))

    def stage(x, block_cls, prefix, feats, blocks, stride, dilation,
              lane_g=None, **kw):
      lane_kw = {} if lane_g is None else {"lane_g": lane_g}
      cin = x.shape[2] if lane_g is not None else x.shape[-1]
      x = block_cls(feats, stride=stride, pad=1, dilation=dilation,
                    has_downsample=(stride != 1 or cin != feats),
                    name=f"{prefix}.0", **kw)(x, train, **lane_kw)
      for i in range(1, blocks):
        x = block_cls(feats, stride=1, pad=1, dilation=dilation,
                      name=f"{prefix}.{i}", **kw)(x, train, **lane_kw)
      return x

    if lane_fe:
      # layers 1-3 stay lane-major (B, H, C, W): every stride-1 conv runs
      # the batch-packed band kernel (BN/shortcut/ReLU in the epilogue),
      # 2-7x over the NHWC XLA convs (docs/PROFILES.md round-5); only the
      # two stride-2 convs of layer2.0 run lane-major XLA
      b = x.shape[0]
      x = stage(x, RegularBasicBlock, "layer1", 64, 3, 1, 1,
                lane_g=pick_bpack_g(b, x.shape[3]))
      out_raw = stage(x, RegularBasicBlock, "layer2", 64, 8, 2, 1,
                      lane_g=pick_bpack_g(b, x.shape[3] // 2))
      out_reg = stage(out_raw, RegularBasicBlock, "layer3", 64, 4, 1, 2,
                      lane_g=pick_bpack_g(b, out_raw.shape[3]))
      out_raw = jnp.transpose(out_raw, (0, 1, 3, 2))
      out_reg = jnp.transpose(out_reg, (0, 1, 3, 2))
    else:
      x = stage(x, RegularBasicBlock, "layer1", 64, 3, 1, 1)
      out_raw = stage(x, RegularBasicBlock, "layer2", 64, 8, 2, 1)
      out_reg = stage(out_raw, RegularBasicBlock, "layer3", 64, 4, 1, 2)
    out_sph = stage(out_reg, SphereBasicBlock, "layer4", 128, 8, 1, 1,
                    sphere_type=self.sphere_type)
    feat = jnp.concatenate([out_raw, out_reg, out_sph], axis=-1)
    for i, (f, k, p) in enumerate([(128, 1, 0), (128, 3, 1), (32, 1, 0)]):
      feat = nn.relu(convbn(feat, train, f, k, 1, p, 1,
                            f"lastconv.{2 * i}"))
    return feat


class PSMNetFeatureExtraction(nn.Module):
  """The 'Regular' option: PSMNet SPP feature extraction
  (submodule.py:205-267)."""

  @nn.compact
  def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
    for i, (feat, k, s, p) in enumerate([(32, 3, 2, 1), (32, 3, 1, 1),
                                         (32, 3, 1, 1)]):
      x = nn.relu(convbn(x, train, feat, k, s, p, 1, f"firstconv.{2 * i}"))

    def stage(x, prefix, feats, blocks, stride, dilation):
      cin = x.shape[-1]
      x = BasicBlockNoRelu(feats, stride=stride, pad=1, dilation=dilation,
                           has_downsample=(stride != 1 or cin != feats),
                           name=f"{prefix}.0")(x, train)
      for i in range(1, blocks):
        x = BasicBlockNoRelu(feats, stride=1, pad=1, dilation=dilation,
                             name=f"{prefix}.{i}")(x, train)
      return x

    x = stage(x, "layer1", 32, 3, 1, 1)
    out_raw = stage(x, "layer2", 64, 16, 2, 1)
    x = stage(out_raw, "layer3", 128, 3, 1, 1)
    out_skip = stage(x, "layer4", 128, 3, 1, 2)

    h, w = out_skip.shape[1:3]
    branches = []
    for i, pool in enumerate([64, 32, 16, 8]):
      b = nn.avg_pool(out_skip, (pool, pool), (pool, pool))
      b = nn.relu(convbn(b, train, 32, 1, 1, 0, 1, f"branch{i + 1}.1"))
      branches.append(upsample_bilinear(b, h, w))
    feat = jnp.concatenate([out_raw, out_skip, branches[3], branches[2],
                            branches[1], branches[0]], axis=-1)
    feat = nn.relu(convbn(feat, train, 128, 3, 1, 1, 1, "lastconv.0"))
    feat = conv_nd(feat, 32, (1, 1), stride=1, pad=0, name="lastconv.2")
    return feat


class Hourglass(nn.Module):
  """3-D hourglass (mode_disparity.py:11-46) on NDHWC.

  ``lane='W'`` (eval only) runs the lane-major fast path: ``x`` is
  (B, D, H, C, W) with W on the TPU lanes; the stride-2 encoder emits the
  half-resolution level with H on the lanes (so the inner stride-1 convs
  keep full 128-lane tiles), and conv6 emits back W-lane-major. Same param
  tree as the NDHWC path.
  """
  inplanes: int

  @nn.compact
  def __call__(self, x, presqu, postsqu, train: bool, lane=None):
    p2 = self.inplanes * 2
    if lane is not None:
      assert not train and lane == "W"
      out = convbn_3d_lane(x, p2, 3, 2, 1, "conv1.0", in_lane="W",
                           out_lane="H", relu=True)                  # 1/8
      pre = convbn_3d_lane(out, p2, 3, 1, 1, "conv2", in_lane="H",
                           relu=True, residual=postsqu)              # 1/8
      out = convbn_3d_lane(pre, p2, 3, 2, 1, "conv3.0", in_lane="H",
                           relu=True)                                # 1/16
      out = convbn_3d_lane(out, p2, 3, 1, 1, "conv4.0", in_lane="H",
                           relu=True)                                # 1/16

      from mode_tpu.ops.pallas.conv3d_kernel import fold_deconv_ok
      s5, b5 = TorchBatchNorm(name="conv5.1")(None, False,
                                              affine_only=True, features=p2)
      ct5 = ConvTranspose(p2, (3, 3, 3), stride=2, padding=1,
                          output_padding=1, name="conv5.0")
      res = presqu if presqu is not None else pre
      if fold_deconv_ok(out.shape, p2, jnp.dtype(out.dtype).itemsize):
        # folded-lane deconv (1/16 level: no single axis fills the lanes);
        # the BN affine runs in the kernel epilogue
        up = ct5(out, lane_fold_dec=dict(lane_axis=2, scale=s5, bias=b5))
        post = jnp.maximum(up.astype(jnp.float32) + res.astype(jnp.float32),
                           0.0).astype(x.dtype)
      else:
        up = ct5(out, lane_xla=("H", "H"))
        post = jnp.maximum(up.astype(jnp.float32) * s5[:, None] + b5[:, None]
                           + res.astype(jnp.float32), 0.0).astype(x.dtype)

      from mode_tpu.ops.pallas.conv3d_kernel import band_deconv_ok
      s6, b6 = TorchBatchNorm(name="conv6.1")(None, False, affine_only=True,
                                              features=self.inplanes)
      ct6 = ConvTranspose(self.inplanes, (3, 3, 3), stride=2, padding=1,
                          output_padding=1, name="conv6.0")
      if band_deconv_ok(post.shape, self.inplanes,
                        jnp.dtype(post.dtype).itemsize):
        # fused Pallas deconv doubles the lane (H) axis in place; swap the
        # band/lane axes after so the 1/4-res stack sees W on the lanes
        out = ct6(post, lane_dec=dict(lane_axis=2, scale=s6, bias=b6))
        out = jnp.swapaxes(out, 2, 4)
      else:
        out = ct6(post, lane_xla=("H", "W"))
        out = (out.astype(jnp.float32) * s6[:, None]
               + b6[:, None]).astype(x.dtype)
      return out, pre, post

    out = nn.relu(convbn_3d(x, train, p2, 3, 2, 1, "conv1.0"))      # 1/8
    pre = convbn_3d(out, train, p2, 3, 1, 1, "conv2")               # 1/8
    pre = nn.relu(pre + postsqu) if postsqu is not None else nn.relu(pre)

    out = nn.relu(convbn_3d(pre, train, p2, 3, 2, 1, "conv3.0"))    # 1/16
    out = nn.relu(convbn_3d(out, train, p2, 3, 1, 1, "conv4.0"))    # 1/16

    up = ConvTranspose(p2, (3, 3, 3), stride=2, padding=1,
                       output_padding=1, name="conv5.0")(out)
    up = TorchBatchNorm(name="conv5.1")(up, train)
    post = nn.relu(up + presqu) if presqu is not None else nn.relu(up + pre)

    out = ConvTranspose(self.inplanes, (3, 3, 3), stride=2, padding=1,
                        output_padding=1, name="conv6.0")(post)
    out = TorchBatchNorm(name="conv6.1")(out, train)
    return out, pre, post


_FUSED_REGRESSION = "auto"   # "auto" | "on" | "off"


def set_fused_regression(mode: str):
  """Force/forbid/auto-select the fused Pallas regression head (eval)."""
  global _FUSED_REGRESSION
  assert mode in ("auto", "on", "off")
  _FUSED_REGRESSION = mode


def _fused_regression_eligible(cost, maxdisp, h, w) -> bool:
  if _FUSED_REGRESSION == "off":
    return False
  if h % 8 != 0 or w % 128 != 0 or cost.shape[1] > 128:
    return False
  if cost.shape[1] % 8 != 0 or cost.shape[3] % 128 != 0:
    return False
  from mode_tpu.parallel.mesh import active_mesh
  mesh = active_mesh()
  if mesh is not None and mesh.size > 1:
    # SPMD routes through fused_regression_sharded: B over 'data', output
    # rows over 'spatial' (TY=8 rows per grid step per shard)
    dp = mesh.shape.get("data", 1)
    sp = mesh.shape.get("spatial", 1)
    if cost.shape[0] % dp != 0 or h % (8 * sp) != 0:
      return False
  if _FUSED_REGRESSION == "on":
    return True
  try:
    return jax.devices()[0].platform in ("tpu", "axon")
  except RuntimeError:
    return False


def _fused_regression(cost_q, maxdisp, h, w):
  """Dispatch the fused regression head (shard_map wrapper under a mesh)."""
  from mode_tpu.ops.pallas.regression_kernel import fused_disparity_regression
  from mode_tpu.parallel.mesh import active_mesh
  mesh = active_mesh()
  if mesh is not None and mesh.size > 1:
    from mode_tpu.parallel.shard_ops import fused_regression_sharded
    return fused_regression_sharded(cost_q, maxdisp, h, w, mesh)
  return fused_disparity_regression(cost_q, maxdisp, h, w)


def _lane_mid_eligible(cost_shape, dtype) -> bool:
  """Can the eval cost-volume stack run lane-major (W on TPU lanes)?"""
  from mode_tpu.ops.pallas.conv3d_kernel import band_pallas_ok
  b, d, hh, ww, c = cost_shape
  return (d % 4 == 0 and hh % 4 == 0 and
          band_pallas_ok((b, d, hh, 32, ww), 32,
                         jnp.dtype(dtype).itemsize))


def disparity_regression(prob: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
  """Soft-argmin (submodule.py:50-57): sum_d d * p(d). prob is (B, D, H, W)."""
  disp = jnp.arange(maxdisp, dtype=prob.dtype)[None, :, None, None]
  return jnp.sum(prob * disp, axis=1)


def confidence_from_prob(prob: jnp.ndarray, pred: jnp.ndarray,
                         maxdisp: int) -> jnp.ndarray:
  """Confidence map = sum of prob at rounded-prediction ±1 depth slices.

  The reference expresses this as three nearest-neighbour 3-D grid_samples
  with border padding (mode_disparity.py:157-183); on integer-centred grids
  that is exactly a clipped take_along_axis, which is what we do. ``prob`` is
  (B, D, H, W), ``pred`` (B, H, W).
  """
  d0 = jnp.round(pred)
  total = jnp.zeros_like(pred)
  for delta in (-1.0, 0.0, 1.0):
    # border padding clamps the (normalized) coordinate into range, and
    # nearest-rounding happens on the *pixel* coordinate: round after clip.
    coord = jnp.clip(d0 + delta, 0, maxdisp - 1)
    idx = jnp.round(coord).astype(jnp.int32)[:, None]
    total = total + jnp.take_along_axis(prob, idx, axis=1)[:, 0]
  return total


class ModeDisparity(nn.Module):
  """Stage-1 network (mode_disparity.py:51-185).

  ``__call__(left, right, train)`` with NHWC inputs. In training mode returns
  ``(pred1, pred2, pred3)``; in eval mode returns ``pred3`` or
  ``(pred3, conf)`` when ``out_conf``.
  """
  maxdisp: int = 192
  conv: str = "Sphere"
  sphere_type: str = "Cassini"
  out_conf: bool = False
  remat: bool = True   # rematerialize FE/hourglasses/heads for training
                       # (full-res training does not fit HBM otherwise)
  remat_policy: str = "save_convs"   # "full" | "save_convs": keep conv/MXU
                       # outputs across the remat boundary and recompute
                       # only the BN/ReLU elementwise tails in backward

  def _remat_policy(self):
    if self.remat_policy == "save_convs":
      return jax.checkpoint_policies.save_only_these_names("conv_out")
    assert self.remat_policy == "full", self.remat_policy
    return None

  @nn.compact
  def __call__(self, left: jnp.ndarray, right: jnp.ndarray, train: bool):
    use_remat = self.remat and train
    if self.conv == "Sphere":
      fe_cls = SphereFeatureExtraction
      fe_args = (self.sphere_type,)
    elif self.conv == "Regular":
      fe_cls = PSMNetFeatureExtraction
      fe_args = ()
    else:
      raise NotImplementedError(
          "Convolution Type must be Regular or Sphere!")
    if use_remat:
      fe_cls = nn.remat(fe_cls, static_argnums=(2,),
                        policy=self._remat_policy())
    fe = fe_cls(*fe_args, name="feature_extraction")
    ref_fea = fe(left, train)
    tgt_fea = fe(right, train)          # same submodule → shared params

    cost = build_cost_volume(ref_fea, tgt_fea, self.maxdisp // 4)
    # SPMD: shard the volume's H axis over the 'spatial' mesh axis (no-op on
    # one chip). XLA inserts the 1-pixel halo exchanges for the 3-D convs.
    cost = constrain_spatial(cost, h_axis=2)

    h, w = left.shape[1], left.shape[2]

    if not train and _lane_mid_eligible(cost.shape, cost.dtype):
      # eval fast path: the whole cost-volume stack runs lane-major
      # (B, D, H, C, W) with W on the TPU lanes — stride-1 3x3x3 convs hit
      # the fused Pallas kernel, stride-2/deconvs run XLA convs with custom
      # dimension numbers; one transpose in, none out (the classif heads
      # emit (B, D, H, W) directly, which is what the regression wants).
      costl = jnp.transpose(cost, (0, 1, 2, 4, 3))
      c0 = convbn_3d_lane(costl, 32, 3, 1, 1, "dres0.0", in_lane="W",
                          relu=True)
      c0 = convbn_3d_lane(c0, 32, 3, 1, 1, "dres0.2", in_lane="W",
                          relu=True)
      d1 = convbn_3d_lane(c0, 32, 3, 1, 1, "dres1.0", in_lane="W",
                          relu=True)
      cost0 = convbn_3d_lane(d1, 32, 3, 1, 1, "dres1.2", in_lane="W",
                             residual=c0)

      out1, pre1, post1 = Hourglass(32, name="dres2")(
          cost0, None, None, train, lane="W")
      out1 = out1 + cost0
      out2, pre2, post2 = Hourglass(32, name="dres3")(
          out1, pre1, post1, train, lane="W")
      out2 = out2 + cost0
      out3, pre3, post3 = Hourglass(32, name="dres4")(
          out2, pre1, post2, train, lane="W")
      out3 = out3 + cost0

      def classif_lane(x, prefix):
        from mode_tpu.ops.pallas.conv3d_kernel import band_pallas_ok
        y = convbn_3d_lane(x, 32, 3, 1, 1, f"{prefix}.0", in_lane="W",
                           relu=True)
        head = Conv3dDFold(1, (3, 3, 3), (1, 1, 1), (1, 1, 1),
                           name=f"{prefix}.2")
        if band_pallas_ok(y.shape, 8,             # cout padded 1 -> 8
                          jnp.dtype(y.dtype).itemsize):
          y = head(y, lane_fused=dict(lane_axis=3))
        else:
          y = head(y, lane_xla=("W", "W"))
        return y[..., 0, :]                       # (B, D, H, W)

      cost1 = classif_lane(out1, "classif1")
      cost2 = classif_lane(out2, "classif2") + cost1
      cost3 = classif_lane(out3, "classif3") + cost2

      if _fused_regression_eligible(cost3[..., None], self.maxdisp, h, w):
        pred3, conf = _fused_regression(cost3, self.maxdisp, h, w)
        if self.out_conf:
          return pred3, conf
        return pred3

      up = upsample_trilinear(cost3[..., None], self.maxdisp, h, w)[..., 0]
      prob3 = jax.nn.softmax(up.astype(jnp.float32), axis=1)
      pred3 = disparity_regression(prob3, self.maxdisp)
      if self.out_conf:
        conf = confidence_from_prob(prob3, pred3, self.maxdisp)
        return pred3, conf
      return pred3

    cost0 = nn.relu(convbn_3d(cost, train, 32, 3, 1, 1, "dres0.0"))
    cost0 = nn.relu(convbn_3d(cost0, train, 32, 3, 1, 1, "dres0.2"))
    d1 = nn.relu(convbn_3d(cost0, train, 32, 3, 1, 1, "dres1.0"))
    d1 = convbn_3d(d1, train, 32, 3, 1, 1, "dres1.2")
    cost0 = d1 + cost0

    hg_cls = (nn.remat(Hourglass, static_argnums=(4,),
                       policy=self._remat_policy())
              if use_remat else Hourglass)
    out1, pre1, post1 = hg_cls(32, name="dres2")(cost0, None, None, train)
    out1 = out1 + cost0
    out2, pre2, post2 = hg_cls(32, name="dres3")(out1, pre1, post1, train)
    out2 = out2 + cost0
    out3, pre3, post3 = hg_cls(32, name="dres4")(out2, pre1, post2, train)
    out3 = out3 + cost0

    def classif(x, prefix):
      x = nn.relu(convbn_3d(x, train, 32, 3, 1, 1, f"{prefix}.0"))
      return conv_nd(x, 1, (3, 3, 3), stride=1, pad=1, name=f"{prefix}.2")

    cost1 = classif(out1, "classif1")
    cost2 = classif(out2, "classif2") + cost1
    cost3 = classif(out3, "classif3") + cost2

    def regress(cost):
      up = upsample_trilinear(cost, self.maxdisp, h, w)[..., 0]  # (B,D,H,W)
      # softmax + soft-argmin in f32 regardless of activation dtype: bf16
      # probabilities would quantize the 192-level regression by ~0.5 px
      prob = jax.nn.softmax(up.astype(jnp.float32), axis=1)
      return prob, disparity_regression(prob, self.maxdisp)

    if train:
      # rematerialize the full-res softmax volumes (≈1.6 GB each in f32)
      reg = (jax.checkpoint(lambda c: regress(c)[1]) if use_remat
             else (lambda c: regress(c)[1]))
      return reg(cost1), reg(cost2), reg(cost3)

    if _fused_regression_eligible(cost3, self.maxdisp, h, w):
      pred3, conf = _fused_regression(cost3[..., 0], self.maxdisp, h, w)
      if self.out_conf:
        return pred3, conf
      return pred3

    prob3, pred3 = regress(cost3)
    if self.out_conf:
      conf = confidence_from_prob(prob3, pred3, self.maxdisp)
      return pred3, conf
    return pred3
